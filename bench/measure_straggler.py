"""Mega-doc straggler evidence for the E2 chunk path (round-2 verdict #9).

Fixture: a fixed-seed corpus plus ONE document whose span count is ~500x
the corpus median.  Without size-aware chunking that document's whole
spans array is processed by a single task, so the stage's
max-task-time / median-task-time ratio explodes and the stage runs at
the straggler's speed no matter how many cores exist.  With
``chunk_max_spans`` the document is sub-split into bounded chunk rows
spread across tasks by the (bucket, chunk_id) shuffle, so the ratio
stays bounded.

Per-task seconds are measured INSIDE the real extraction loop: the stage
below mirrors operators/extract.extract_stage (same extract_doc call per
document, same shuffle placement) but emits one (task_id, sec, docs)
row per Arrow-batch iterator instead of the extracted spans — wall time
per task of the actual extraction work, not a proxy.

Usage:  python bench/measure_straggler.py [--docs 1500] [--cores 8]
Writes: BENCH/straggler.json + a marked section in BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MARK_BEGIN = "<!-- straggler:begin -->"
MARK_END = "<!-- straggler:end -->"


def timed_stage(docs, cfg):
    """extract_stage twin that emits per-task timing rows."""
    import pandas as pd
    from pyspark import TaskContext

    from ocr_spark.functions.extract_core import extract_doc

    def fn(batches):
        t0 = time.time()
        n = 0
        for pdf in batches:
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                extract_doc(doc_id, list(spans), cfg)
                n += 1
        yield pd.DataFrame({
            "task_id": [TaskContext.get().partitionId()],
            "sec": [time.time() - t0],
            "docs": [n],
        })

    return docs.select("doc_id", "spans").mapInPandas(
        fn, schema="task_id int, sec double, docs long")


def build_corpus(spark, n_docs: int, mega_factor: int, heft: int):
    """Fixed-seed corpus with one planted mega-doc at ~mega_factor x the
    median span count (offsets kept strictly increasing)."""
    from ocr_spark.sources.corpus import SPAN_SCHEMA_DDL, make_docs

    docs = make_docs(n_docs, seed=7, mega_every=0, heft=heft)
    median_spans = int(statistics.median(len(d["spans"]) for d in docs))
    mega_spans = []
    off = 0
    donor = [s for d in docs[: mega_factor * 2] for s in d["spans"]]
    for s in donor[: mega_factor * median_spans]:
        off += 7
        mega_spans.append({**s, "offset": off})
    docs.append({"doc_id": "mega00000001", "spans": mega_spans})
    df = spark.createDataFrame(
        [(d["doc_id"], [tuple(s.values()) for s in d["spans"]]) for d in docs],
        SPAN_SCHEMA_DDL,
    )
    return df, median_spans, len(mega_spans)


def run_variant(spark, df, cores: int, chunk_max_spans: int | None):
    from ocr_spark.config import ExtractConfig
    from ocr_spark.operators.skew import (
        bucket_clustered_repartition,
        chunk_spans,
        with_bucket,
    )

    cfg = ExtractConfig(salt_buckets=cores * 4,
                        chunk_max_spans=chunk_max_spans or 0)
    src = with_bucket(df.select("doc_id", "spans"), cfg)
    if chunk_max_spans:
        chunked = chunk_spans(src.select("doc_id", "spans", "bucket"),
                              chunk_max_spans)
        balanced = chunked.repartition(cores, "bucket", "chunk_id")
    else:
        balanced = bucket_clustered_repartition(
            src.select("doc_id", "spans", "bucket"), cores)
    rows = timed_stage(balanced, cfg).collect()
    secs = sorted(r["sec"] for r in rows)
    med = secs[len(secs) // 2]
    return {
        "tasks": len(secs),
        "max_task_sec": round(max(secs), 3),
        "median_task_sec": round(med, 3),
        "max_over_median": round(max(secs) / med, 2) if med else None,
        "total_docs": int(sum(r["docs"] for r in rows)),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=600)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--heft", type=int, default=4)
    ap.add_argument("--mega-factor", type=int, default=500)
    ap.add_argument("--chunk-max-spans", type=int, default=4)
    args = ap.parse_args()

    from ocr_spark.session import get_spark

    spark = get_spark("straggler", master=f"local[{args.cores}]",
                      shuffle_partitions=args.cores)
    df, median_spans, mega_spans = build_corpus(
        spark, args.docs, args.mega_factor, args.heft)
    df = df.localCheckpoint()

    unchunked = run_variant(spark, df, args.cores, None)
    chunked = run_variant(spark, df, args.cores, args.chunk_max_spans)
    spark.stop()

    out = {
        "metric": "mega_doc_straggler_ratio",
        "docs": args.docs,
        "cores": args.cores,
        "median_doc_spans": median_spans,
        "mega_doc_spans": mega_spans,
        "chunk_max_spans": args.chunk_max_spans,
        "unchunked": unchunked,
        "chunked": chunked,
        "date": time.strftime("%Y-%m-%d"),
    }
    print(json.dumps(out))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "straggler.json"), "w") as f:
        json.dump(out, f, indent=1)
    section = straggler_md(out)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    if os.path.exists(md):
        text = open(md).read()
        if MARK_BEGIN in text:
            pre = text.split(MARK_BEGIN)[0]
            post = text.split(MARK_END)[-1]
            text = pre + section + post
        else:
            text = text.rstrip() + "\n\n" + section
        open(md, "w").write(text)


def straggler_md(o: dict) -> str:
    u, c = o["unchunked"], o["chunked"]
    return f"""{MARK_BEGIN}
## Mega-doc straggler evidence (E2 chunk path)

One planted document at {o['mega_doc_spans']} spans
(~{o['mega_doc_spans'] // max(o['median_doc_spans'], 1)}x the
{o['median_doc_spans']}-span corpus median), {o['docs']} docs total,
`local[{o['cores']}]`; per-task seconds measured inside the extraction
loop itself ({o['date']}, bench/measure_straggler.py):

| variant | tasks | max task (s) | median task (s) | max/median |
| --- | --- | --- | --- | --- |
| unchunked (bucket shuffle only) | {u['tasks']} | {u['max_task_sec']} | {u['median_task_sec']} | **{u['max_over_median']}** |
| chunk_max_spans={o['chunk_max_spans']} | {c['tasks']} | {c['max_task_sec']} | {c['median_task_sec']} | **{c['max_over_median']}** |

Without chunking the mega-doc's task IS the stage runtime; with the
size-aware sub-split its work spreads across tasks and the ratio stays
bounded.  Output equality of the two paths is oracle-proven
(`extract_split_restitch`) and property-tested.
{MARK_END}
"""


if __name__ == "__main__":
    main()
