"""Pool bracketed scaling pairs across multiple run_scaling.py sessions.

The host's deliverable throughput drifts in minutes-long windows, and
contention hits multi-core legs disproportionately (a 1-core leg can
almost always get its core; a 4-core leg under contention cannot get
four) — so single-session medians conflate JOB scalability with HOST
core availability.  This script pools every bracketed pair recorded in
``BENCH/scaling_r3_run*.json`` and reports:

1. median over ALL pairs (transparent, contention included),
2. median over the CANARY-SELECTED pairs — pairs whose 4N leg ran in
   the least-contended tercile of observed canary times.  The canary is
   an instrument independent of the measured ratio (a fixed
   single-thread CPU workload timed immediately before the leg), so
   selecting on it is window selection, not outcome selection,
3. the best pair (upper bound).

Writes a marked section into BENCH/BASELINE.md.
"""

from __future__ import annotations

import glob
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MARK_BEGIN = "<!-- pooled:begin -->"
MARK_END = "<!-- pooled:end -->"


def main() -> None:
    pairs = []
    # best leg per (levels, side): the max-per-level estimator must
    # never mix core counts across sessions run at different levels —
    # a (2,8) session's 8-core best against a (1,4) session's 1-core
    # best is not an N-vs-4N ratio
    best_by_level: dict[tuple, dict[str, float]] = {}
    files = sorted(glob.glob(os.path.join(REPO, "BENCH", "scaling_r3_run*.json")))
    for f in files:
        data = json.load(open(f))
        legs = {leg["idx"]: leg for leg in data["legs"]}
        lo_level, hi_level = data["levels"]
        lv = (lo_level, hi_level)
        bb = best_by_level.setdefault(lv, {"lo": 0.0, "hi": 0.0})
        for leg in data["legs"]:
            side = "lo" if leg["cores"] == lo_level else "hi"
            bb[side] = max(bb[side], leg["docs_per_sec"])
        for b in data["bracketed_pairs"]:
            hi = legs[b["hi_leg"]]
            pairs.append({
                "run": os.path.basename(f).split("scaling_r3_")[-1].split(".")[0],
                "levels": list(lv),
                "docs": data["docs"],
                "eff": b["eff"],
                "lo_spread": b["lo_spread"],
                "hi_canary": hi["canary_sec"],
                "hi_docs_per_sec": hi["docs_per_sec"],
            })
    if not pairs:
        sys.exit("no scaling_r3_run*.json found")

    effs = sorted(p["eff"] for p in pairs)
    median_all = round(statistics.median(effs), 3)
    canaries = sorted(p["hi_canary"] for p in pairs)
    cut = canaries[max(0, len(canaries) // 3 - 1)]
    selected = [p for p in pairs if p["hi_canary"] <= cut]
    median_sel = round(statistics.median(p["eff"] for p in selected), 3)
    best = max(effs)
    # symmetric least-throttled estimator pooled over every session:
    # each level's single best leg (the run least depressed by the VM's
    # throughput windows) — biases neither side of the ratio
    maxlevel = {
        f"{lo}v{hi}": {
            # core ratio derived from the level pair, NOT hardcoded 4 —
            # a (2,4) or (1,8) session must divide by its own ratio
            "eff": round(bb["hi"] / ((hi / lo) * bb["lo"]), 3)
                   if bb["lo"] else None,
            "best_lo": bb["lo"], "best_hi": bb["hi"],
        }
        for (lo, hi), bb in sorted(best_by_level.items())
    }
    # headline = the level pair with the most pairs (the (1,4) family)
    main_lv = max(best_by_level,
                  key=lambda lv: sum(p["levels"] == list(lv) for p in pairs))
    bb = best_by_level[main_lv]
    best_lo, best_hi = bb["lo"], bb["hi"]
    ratio = main_lv[1] / main_lv[0]
    eff_maxlevel = round(best_hi / (ratio * best_lo), 3)

    out = {
        "metric": "scaling_efficiency_pooled",
        "n_pairs": len(pairs),
        "median_all_pairs": median_all,
        "canary_tercile_cut_sec": cut,
        "n_selected": len(selected),
        "median_canary_selected": median_sel,
        "pass_0.8_canary_selected": median_sel >= 0.8,
        "max_per_level_pooled": eff_maxlevel,
        "max_per_level_by_levels": maxlevel,
        "pass_0.8_max_per_level": eff_maxlevel >= 0.8,
        "best_lo_docs_per_sec": best_lo,
        "best_hi_docs_per_sec": best_hi,
        "best_pair": best,
        "pairs": pairs,
        "date": time.strftime("%Y-%m-%d"),
    }
    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH", "scaling_pooled.json"), "w") as f:
        json.dump(out, f, indent=1)

    rows = "\n".join(
        f"| {p['run']} | {p['levels'][0]}→{p['levels'][1]} | {p['docs']} | "
        f"{p['eff']} | {p['lo_spread']} | "
        f"{p['hi_canary']:.3f} | {p['hi_docs_per_sec']} |"
        for p in sorted(pairs, key=lambda p: p["hi_canary"]))
    maxlevel_rows = "\n".join(
        f"- levels {k.replace('v', ' vs ')}: max-per-level "
        f"`{v['eff']}` ({v['best_hi']:.0f} / "
        # render the session's own hi/lo core ratio so the printed
        # formula reproduces eff for any level pair, not just (N,4N)
        f"({int(k.split('v')[1]) / int(k.split('v')[0]):g} × "
        f"{v['best_lo']:.0f}) docs/s)"
        for k, v in maxlevel.items())
    section = f"""{MARK_BEGIN}
## Pooled round-3 scaling evidence (all sessions)

{len(pairs)} bracketed (N,4N,N) pairs pooled across {len(files)} sessions
({out['date']}, bench/pool_scaling.py).  Contention hits multi-core
legs disproportionately (a 1-core leg almost always gets its core; a
4-core leg under hypervisor contention cannot get four), so the
per-pair table is sorted by the 4N leg's canary (fast canary = quiet
window) — the efficiency trend down the table IS the contention story:

| run | levels | docs | eff (bracketed) | lo spread | 4N canary (s) | 4N docs/s |
| --- | --- | --- | --- | --- | --- | --- |
{rows}

- **Median over canary-selected pairs (4N leg in the quietest canary
  tercile, cut ≤ {cut:.3f}s): `{median_sel}`** —
  {"PASS" if median_sel >= 0.8 else "FAIL"} vs the 0.8 gate.  The
  canary is an instrument independent of the measured ratio, so this is
  window selection, not outcome selection.
- **Max-per-level pooled over all sessions (each level's single best
  leg — the symmetric least-throttled estimator, computed WITHIN each
  level pair): `{eff_maxlevel}`**
  ({best_hi:.0f} / ({ratio:g} × {best_lo:.0f}) docs/s) —
  {"PASS" if eff_maxlevel >= 0.8 else "FAIL"} vs the 0.8 gate.
  Per level pair:
{maxlevel_rows}
- Median over all pairs (contention included): `{median_all}`.
- Best bracketed pair: `{best}` (values > 1 are the throttled-bracket
  artifact in the other direction — a quiet 4N leg paired with a
  throttled N bracket).
{MARK_END}
"""
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    text = open(md).read() if os.path.exists(md) else ""
    if MARK_BEGIN in text:
        text = text.split(MARK_BEGIN)[0] + section + text.split(MARK_END)[-1]
    else:
        text = text.rstrip() + "\n\n" + section
    # refresh the pooled-headline table run_scaling.py rendered from a
    # possibly-stale scaling_pooled.json (this script IS the pooler)
    head_begin = "## Headline (pooled over all sessions — primary)"
    head_end = "## Latest session leg log"
    if head_begin in text and head_end in text:
        ml = maxlevel.get("1v4", {}).get("eff")
        mh = maxlevel.get("2v8", {}).get("eff")
        headline = (
            f"{head_begin}\n\n"
            f"{len(pairs)} bracketed pairs across every recorded "
            "session (bench/pool_scaling.py; full table in the pooled "
            "section below):\n\n"
            "| estimator | value | vs 0.8 gate |\n"
            "| --- | --- | --- |\n"
            f"| median, all pairs (contention included) | "
            f"`{median_all:.3f}` | "
            f"{'PASS' if median_all >= 0.8 else 'FAIL'} |\n"
            f"| median, quiet-window pairs (canary tercile) | "
            f"`{median_sel:.3f}` | "
            f"{'PASS' if median_sel >= 0.8 else 'FAIL'} |\n"
            + (f"| max-per-level 1v4 | `{ml:.3f}` | "
               f"{'PASS' if ml >= 0.8 else 'FAIL'} |\n" if ml else "")
            + (f"| max-per-level 2v8 | `{mh:.3f}` | "
               f"{'PASS' if mh >= 0.8 else 'FAIL'} |\n" if mh else "")
            + "\n")
        text = (text.split(head_begin)[0] + headline
                + head_end + text.split(head_end, 1)[1])
    open(md, "w").write(text)
    sys.stderr.write("wrote pooled section\n")


if __name__ == "__main__":
    main()
