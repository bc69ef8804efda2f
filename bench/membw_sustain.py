"""Sustained memory-bandwidth decay probe (diagnostic).

Why this exists: scaling session "AE" (2026-08-20) ran in a window
where BOTH pre-leg instruments read healthy — CPU canary 0.59-0.84 s,
`bench.membw_canary()` 8-10.6 GB/s — yet every multi-minute Spark leg
delivered ~60% of quiet-window throughput.  Short probes passing while
sustained work throttles is a duty-cycle/credit signature: the
hypervisor grants full bandwidth in bursts, so an instant reading
cannot certify a multi-minute window.

This probe streams ``procs`` concurrent readers over private ``mb``-MB
buffers for ``dur`` seconds and reports per-10s-bucket bandwidth.  A
quiet window is FLAT; a credit-throttled window decays after the burst
allowance drains.

Measured quiet-window profile (2026-08-20, 120 s × 8 procs × 512 MB,
recorded in BENCH/membw_sustain.json): mean per-pass bandwidth flat at
9.3-10.2 GB/s across all twelve 10 s buckets — no decay.  The probe is
therefore a window DIAGNOSTIC (run it when a session's legs disagree
with its admission instruments), not an admission gate: 2 minutes of
saturating reads is too disruptive to run before every leg, and the
one suppressed window we caught (AE) ended before a sustained profile
could be taken.

Usage: python bench/membw_sustain.py [dur_sec] [procs] [mb]
Prints one JSON line with per-bucket {n, min_gbps, mean_gbps}.
"""
import json
import multiprocessing as mp
import os
import sys
import tempfile
import time

import numpy as np


def _worker(i: int, dur: float, outdir: str, start: float, mb: int) -> None:
    buf = np.ones(mb * 1024 * 1024 // 8, dtype=np.float64)
    rows = []
    t_end = start + dur
    while time.time() < t_end:
        t0 = time.time()
        buf.sum()
        dt = time.time() - t0
        rows.append((round(t0 - start, 3), round(mb / 1024 / dt, 3)))
    with open(os.path.join(outdir, f"w{i}.json"), "w") as f:
        json.dump(rows, f)


def sustain_profile(dur: float = 120.0, procs: int = 8,
                    mb: int = 512) -> dict:
    """Per-10s-bucket {n, min_gbps, mean_gbps} across all passes of
    ``procs`` concurrent sequential readers sustained for ``dur`` s."""
    with tempfile.TemporaryDirectory(prefix="membw_sustain_") as outdir:
        start = time.time()
        ps = [mp.Process(target=_worker, args=(i, dur, outdir, start, mb))
              for i in range(procs)]
        for p in ps:
            p.start()
        for p in ps:
            p.join()
        buckets: dict[int, list] = {}
        for fn in os.listdir(outdir):
            for rel, gbps in json.load(open(os.path.join(outdir, fn))):
                buckets.setdefault(int(rel // 10) * 10, []).append(gbps)
    return {f"{b}s": {"n": len(v),
                      "min_gbps": round(min(v), 2),
                      "mean_gbps": round(sum(v) / len(v), 2)}
            for b, v in sorted(buckets.items())}


if __name__ == "__main__":
    dur = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    procs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    mb = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    print(json.dumps({"procs": procs, "dur": dur, "mb": mb,
                      "buckets": sustain_profile(dur, procs, mb)}))
