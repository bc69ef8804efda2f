"""Calibrate the memory-bandwidth canary against hi-leg throughput.

2026-08-20 finding: the sandbox VM has contention windows where every
CPU canary stays fast (a 16-process integer burn gets all its cores)
yet multi-core Spark legs deliver ~60% of quiet-window throughput —
the round-4 "session AC" signature that dragged the pooled median.
The hypothesis is co-tenant MEMORY traffic; `bench.membw_canary()`
(worst per-process concurrent sequential-read bandwidth) is the
candidate instrument.

This sweep alternates [canaries → one standalone local[8] extraction
leg] and records (canary_sec, canary4_sec, membw_gbps, docs_per_sec)
tuples across drift windows.  The output is CALIBRATION data for
choosing an admission threshold — these legs are single-level and are
NEVER pooled into the N-vs-4N scaling evidence.

Usage: python bench/calibrate_membw.py [--legs 8] [--docs 600000]
Appends one JSON line per leg to BENCH/membw_calibration.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import calibration_sec, membw_canary  # noqa: E402
from run_scaling import _gen_corpus, _run_level  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--legs", type=int, default=8)
    ap.add_argument("--docs", type=int, default=600000)
    ap.add_argument("--heft", type=int, default=5)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--workdir", default="/dev/shm/ocr_spark_scaling")
    ap.add_argument("--sleep", type=float, default=30.0,
                    help="pause between legs so windows decorrelate")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    corpus = os.path.join(args.workdir,
                          f"corpus_{args.docs}_h{args.heft}.parquet")
    if not os.path.isdir(corpus):
        _gen_corpus(args.docs, corpus, args.heft)
    subprocess.run([sys.executable, os.path.join(REPO, "make_pyfiles.py")],
                   check=True, capture_output=True)
    zip_path = os.path.join(REPO, "ocr_spark.zip")

    out_path = os.path.join(REPO, "BENCH", "membw_calibration.jsonl")
    for i in range(args.legs):
        canary = calibration_sec()
        membw = membw_canary()
        out = os.path.join(args.workdir, f"cal_out_{i}")
        shutil.rmtree(out, ignore_errors=True)
        m = _run_level(args.cores, corpus, out, zip_path, 2)
        membw_after = membw_canary()
        row = {"i": i, "cores": args.cores, "docs": args.docs,
               "canary_sec": canary, "membw_gbps": membw,
               "membw_gbps_after": membw_after,
               "docs_per_sec": m["docs_per_sec"],
               "elapsed_sec": m["elapsed_sec"]}
        with open(out_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        sys.stderr.write(f"cal leg {i}: {m['docs_per_sec']} docs/s "
                         f"membw {membw:.2f}->{membw_after:.2f} GB/s "
                         f"canary {canary:.3f}s\n")
        shutil.rmtree(out, ignore_errors=True)
        time.sleep(args.sleep)


if __name__ == "__main__":
    main()
