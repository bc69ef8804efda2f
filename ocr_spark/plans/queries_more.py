"""Additional operator coverage: statistical aggregates, exact
percentiles, sink round-trips (parquet/csv/json), and the Structured
Streaming drain checked against the batch oracle.

Same cross-engine parity conventions as queries_rel.py.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Window as W, functions as F

from ocr_spark.plans.registry import q, t

def _work_dir(name: str) -> str:
    """Per-process scratch path under /tmp: reused across invocations in
    one session (no per-call leak) but keyed by PID so concurrent
    sessions cannot delete each other's live source/checkpoint dirs; the
    whole tree is removed at interpreter exit."""
    root = os.path.join(tempfile.gettempdir(), f"ocr_spark_work_{os.getpid()}")
    if not os.path.isdir(root):
        import atexit
        import shutil as _shutil

        os.makedirs(root, exist_ok=True)
        atexit.register(_shutil.rmtree, root, ignore_errors=True)
    return os.path.join(root, name)


# ---------------------------------------------------------------------------
# statistical aggregates
# ---------------------------------------------------------------------------


@q(
    "agg_stats",
    oracle="""
    SELECT c_nationkey,
           ROUND(STDDEV_SAMP(c_acctbal), 4) AS sd_bal,
           ROUND(VAR_SAMP(c_acctbal), 2) AS var_bal,
           ROUND(AVG(c_acctbal), 4) AS avg_bal,
           ROUND(MIN(c_acctbal), 2) AS min_bal,
           ROUND(MAX(c_acctbal), 2) AS max_bal
    FROM customer GROUP BY c_nationkey
    """,
)
def agg_stats(spark, sf):
    c = t(spark, sf, "customer")
    return c.groupBy("c_nationkey").agg(
        F.round(F.stddev_samp("c_acctbal"), 4).alias("sd_bal"),
        F.round(F.var_samp("c_acctbal"), 2).alias("var_bal"),
        F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
    )


@q(
    "agg_corr",
    oracle="""
    SELECT o_orderpriority,
           ROUND(CORR(o_totalprice, o_custkey), 4) AS c1,
           ROUND(COVAR_SAMP(o_totalprice, o_custkey), 0) AS cv
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_corr(spark, sf):
    o = t(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.corr("o_totalprice", F.col("o_custkey").cast("double")), 4).alias("c1"),
        F.round(F.covar_samp("o_totalprice", F.col("o_custkey").cast("double")), 0).alias("cv"),
    )


@q(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_quantity, 0.95), 4) AS p95,
           ROUND(quantile_disc(l_quantity, 0.5), 2) AS p50_disc
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile(spark, sf):
    """Exact percentiles computed scale-safely via distinct-value
    counting, NOT Spark's ``percentile()`` (which buffers every value of
    a group on one reducer — an OOM, not a slowdown, at 100 TB).

    Shape: groupBy(key, value) count  →  per-key cumulative counts over
    the distinct values  →  pick the bracketing values per the ANSI
    definitions (interpolated percentile_cont at rank p·(n-1); discrete
    type-1 at the first value whose cumulative count reaches ⌈p·n⌉).
    State per key is O(#distinct values) — bounded for measure-like
    columns (quantities, scores, sizes) regardless of row count, and the
    first groupBy gets map-side partial aggregation.  For genuinely
    continuous columns use agg_percentile_approx below."""
    from pyspark.sql import Window

    li = t(spark, sf, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(F.count("*").alias("cnt"))
    w_cum = (Window.partitionBy("l_returnflag").orderBy("l_quantity")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = Window.partitionBy("l_returnflag")
    e = (counts.withColumn("cum", F.sum("cnt").over(w_cum))
         .withColumn("n", F.sum("cnt").over(w_all)))

    def at_index(idx):  # value at 0-based sorted index = first v with cum > idx
        return F.min(F.when(F.col("cum") > idx, F.col("l_quantity")))

    def cont_parts(p):
        pos = F.lit(p) * (F.col("n") - 1)
        return at_index(F.floor(pos)), at_index(F.ceil(pos))

    lo50, hi50 = cont_parts(0.5)
    lo95, hi95 = cont_parts(0.95)
    agg = e.groupBy("l_returnflag").agg(
        lo50.alias("lo50"), hi50.alias("hi50"),
        lo95.alias("lo95"), hi95.alias("hi95"),
        # discrete (type-1): first value with cum >= ceil(p*n)
        F.min(F.when(F.col("cum") >= F.ceil(F.lit(0.5) * F.col("n")),
                     F.col("l_quantity"))).alias("disc50"),
        F.max("n").alias("n"),
    )

    def interp(lo, hi, p):
        pos = F.lit(p) * (F.col("n") - 1)
        return F.col(lo) + (pos - F.floor(pos)) * (F.col(hi) - F.col(lo))

    return agg.select(
        "l_returnflag",
        F.round(interp("lo50", "hi50", 0.5), 4).alias("p50"),
        F.round(interp("lo95", "hi95", 0.95), 4).alias("p95"),
        F.round(F.col("disc50"), 2).alias("p50_disc"),
    )


@q(
    "agg_percentile_approx",
    oracle="""
    SELECT l_returnflag, true AS p50_ok, true AS p95_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile_approx(spark, sf):
    """The scale path for percentiles over CONTINUOUS columns: Spark's
    percentile_approx (Greenwald-Khanna) with bounded accuracy — fixed
    sketch memory per group and mergeable partials, vs the unbounded
    per-group buffering of exact percentile().

    Hash-verified via BRACKETING (was rows-only until round 2): GK with
    ``accuracy`` guarantees rank error ≤ n/accuracy, so the sketch value
    must lie between the exact order statistics at ranks
    (p ∓ 2/accuracy)·n — the query emits that containment as booleans
    and the oracle emits the literal ``true`` rows the guarantee
    mandates.  The exact bracket is computed with the same
    distinct-value cumulative-count machinery as agg_percentile; on
    this continuous column its per-group state is O(rows) — acceptable
    for the sf0.01 check, and explicitly a HARNESS device: the
    registered operator (the thing a user runs at 100 TB) is the GK
    aggregation alone.  A tighter rank-error tolerance property lives
    in tests/test_percentile.py."""
    from pyspark.sql import Window

    acc = 10000
    eps = 2.0 / acc  # 2x the guaranteed rank-error margin
    li = t(spark, sf, "lineitem")
    gk = li.groupBy("l_returnflag").agg(
        F.expr(f"percentile_approx(l_extendedprice, 0.5, {acc})").alias("gk50"),
        F.expr(f"percentile_approx(l_extendedprice, 0.95, {acc})").alias("gk95"),
    )
    counts = li.groupBy("l_returnflag", "l_extendedprice").agg(
        F.count("*").alias("cnt"))
    w_cum = (Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = Window.partitionBy("l_returnflag")
    e = (counts.withColumn("cum", F.sum("cnt").over(w_cum))
         .withColumn("n", F.sum("cnt").over(w_all)))

    def at_rank(rank):  # 1-based: first value whose cumulative count reaches rank
        return F.min(F.when(F.col("cum") >= rank, F.col("l_extendedprice")))

    def bracket(p):
        lo_r = F.greatest(F.lit(1), F.floor((p - eps) * F.col("n")))
        hi_r = F.least(F.col("n"), F.ceil((p + eps) * F.col("n")))
        return at_rank(lo_r), at_rank(hi_r)

    lo50, hi50 = bracket(0.5)
    lo95, hi95 = bracket(0.95)
    br = e.groupBy("l_returnflag").agg(
        lo50.alias("lo50"), hi50.alias("hi50"),
        lo95.alias("lo95"), hi95.alias("hi95"),
    )
    return gk.join(br, "l_returnflag").select(
        "l_returnflag",
        (F.col("gk50").between(F.col("lo50"), F.col("hi50"))).alias("p50_ok"),
        (F.col("gk95").between(F.col("lo95"), F.col("hi95"))).alias("p95_ok"),
    )


# ---------------------------------------------------------------------------
# sink round-trips: the engine's own write path is part of the surface
# ---------------------------------------------------------------------------


def _roundtrip(df, fmt: str, read_opts=None, write_opts=None):
    """Write with the engine, read back with the engine — the oracle sees
    the original table, so the check proves lossless round-trip.
    Deterministic output path + overwrite, so repeated harness runs reuse
    one directory instead of leaking a fresh tmp dir per invocation."""
    out = _work_dir(f"rt_{fmt}")
    w = df.write.mode("overwrite")
    for k, v in (write_opts or {}).items():
        w = w.option(k, v)
    getattr(w, "format")(fmt).save(out)
    r = df.sparkSession.read
    for k, v in (read_opts or {}).items():
        r = r.option(k, v)
    return r.format(fmt).schema(df.schema).load(out)


_RT_SQL = """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey % 10 = 0
"""


@q("sink_roundtrip_parquet", oracle=_RT_SQL)
def sink_roundtrip_parquet(spark, sf):
    o = t(spark, sf, "orders").filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    return _roundtrip(o, "parquet")


@q("sink_roundtrip_csv", oracle=_RT_SQL)
def sink_roundtrip_csv(spark, sf):
    o = t(spark, sf, "orders").filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    return _roundtrip(o, "csv", write_opts={"header": "true"},
                      read_opts={"header": "true"})


@q("sink_roundtrip_json", oracle=_RT_SQL)
def sink_roundtrip_json(spark, sf):
    o = t(spark, sf, "orders").filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    return _roundtrip(o, "json")


@q("sink_roundtrip_orc", oracle=_RT_SQL)
def sink_roundtrip_orc(spark, sf):
    o = t(spark, sf, "orders").filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    return _roundtrip(o, "orc")


# ---------------------------------------------------------------------------
# streaming drain ≡ batch (the §2.3 surface, oracle-checked)
# ---------------------------------------------------------------------------


@q(
    "streaming_tumbling_window",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S')
             AS win_start,
           event_type, COUNT(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def streaming_tumbling_window(spark, sf):
    """The events table consumed through an actual Structured Streaming
    plan (file stream → watermark → windowed agg → availableNow drain
    into a memory sink), returned as a batch DataFrame.  Proving the
    streaming operator against the same DuckDB oracle as the batch twin
    is the strongest stream-semantics check SQL can express."""
    import glob
    import shutil

    from ocr_spark.streaming import events_stream, run_available_now

    # file streams need a directory source; deterministic path, rebuilt
    # per run (no per-invocation tmp-dir leak)
    tmp = _work_dir("stream_events")
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    src = f"{sf}/events.parquet"
    files = glob.glob(f"{src}/*.parquet") or [src]
    for f in files:
        shutil.copy(f, tmp)
    stream = events_stream(spark, tmp)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type", "n",
        )
    )
    # a fresh checkpoint per run is REQUIRED (replaying an old checkpoint
    # against a rebuilt source dir would skip files); delete the previous
    # run's dir so only one lives in /tmp at a time
    ck = _work_dir("stream_ck")
    shutil.rmtree(ck, ignore_errors=True)
    return run_available_now(agg, ck, output_mode="complete")


@q(
    "streaming_static_join",
    oracle="""
    SELECT c.c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT) AS total_v100
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def streaming_static_join(spark, sf):
    """Stream-static enrichment join: the events STREAM joined against
    the static customer dimension (broadcast — the static side is read
    per micro-batch, so at scale it must not shuffle the stream), then
    aggregated and drained availableNow.  Checked against the plain
    batch join in DuckDB — the strongest SQL-expressible check of the
    streaming join operator.  Fixed-point sum (value*100 as bigint)
    keeps float addition order out of the comparison."""
    import glob
    import shutil

    from ocr_spark.streaming import events_stream, run_available_now

    tmp = _work_dir("stream_sj")
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    src = f"{sf}/events.parquet"
    for f in glob.glob(f"{src}/*.parquet") or [src]:
        shutil.copy(f, tmp)
    stream = events_stream(spark, tmp)
    cust = F.broadcast(
        t(spark, sf, "customer").select("c_custkey", "c_mktsegment"))
    joined = stream.join(cust, stream.user_id == cust.c_custkey)
    agg = joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_v100"),
    )
    ck = _work_dir("stream_sj_ck")
    shutil.rmtree(ck, ignore_errors=True)
    return run_available_now(agg, ck, output_mode="complete")


@q(
    "streaming_session_window",
    oracle="""
    WITH g AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL '30 minutes',
                    '%Y-%m-%d %H:%M:%S') AS session_end,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def streaming_session_window(spark, sf):
    """Spark's built-in ``session_window`` state-merging aggregation run
    as an ACTUAL stream and drained availableNow, checked against a
    DuckDB gap-sessionizer replaying the same semantics (new session
    when the gap is ≥ the 30-minute timeout — session windows are
    half-open [start, last+gap), so an exactly-gap-sized step starts a
    new session).

    Append-mode session windows only emit once the WATERMARK passes the
    session's end, and availableNow's final watermark stops at
    max(ts)−30min — which would hold back every trailing session in
    state forever.  The drain therefore appends a far-future SENTINEL
    event as a second micro-batch (maxFilesPerTrigger splits the
    batches; the watermark only advances between micro-batches), which
    pushes the watermark past every real session; the sentinel user is
    filtered from the result.  This is the standard way to flush
    event-time state in a bounded replay."""
    import glob
    import shutil

    from ocr_spark.streaming import run_available_now, session_agg

    tmp = _work_dir("stream_sess")
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    src = f"{sf}/events.parquet"
    files = glob.glob(f"{src}/*.parquet") or [src]
    for f in files:
        shutil.copy(f, tmp)
    # sentinel: one far-future event in its OWN file → second micro-batch
    ev = spark.read.parquet(src)
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    sentinel = spark.createDataFrame(
        [(-1, max_ts, -1, "sentinel", 0.0, "{}")],
        schema=ev.schema,
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 10 DAYS"))
    sent_dir = _work_dir("stream_sess_sentinel")
    shutil.rmtree(sent_dir, ignore_errors=True)
    sentinel.coalesce(1).write.parquet(sent_dir)
    for f in glob.glob(f"{sent_dir}/part-*.parquet"):
        shutil.copy(f, os.path.join(tmp, "zz_sentinel.parquet"))

    from ocr_spark.streaming import events_stream

    stream = events_stream(spark, tmp, max_files_per_trigger=len(files))
    agg = session_agg(stream).select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
    )
    ck = _work_dir("stream_sess_ck")
    shutil.rmtree(ck, ignore_errors=True)
    out = run_available_now(agg, ck, output_mode="append")
    # the float session_value stays out of the comparison (stream-side
    # addition order differs from the oracle's); boundaries + counts are
    # the session-merge semantics under test
    return out.filter(F.col("user_id") >= 0).select(
        "user_id", "session_start", "session_end", "n_events")


@q(
    "streaming_stream_stream_join",
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS delay_s
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def streaming_stream_stream_join(spark, sf):
    """Stream-stream interval join (click→purchase attribution within 30
    minutes): two watermarked event streams joined on user_id + a time
    range.  The watermark + time constraint is what BOUNDS the join
    state at 10^12-event scale — each side can evict buffered rows once
    the other side's watermark passes the interval.  Inner-join matches
    emit eagerly, so the availableNow drain equals the batch interval
    join, which DuckDB replays as the oracle."""
    import glob
    import shutil

    from ocr_spark.streaming import events_stream, run_available_now

    tmp = _work_dir("stream_ssj")
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    src = f"{sf}/events.parquet"
    for f in glob.glob(f"{src}/*.parquet") or [src]:
        shutil.copy(f, tmp)
    clicks = (
        events_stream(spark, tmp)
        .filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"),
                F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        events_stream(spark, tmp)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"),
                F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select(
        "click_id", "purchase_id", F.col("c_user").alias("user_id"),
        (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts")).alias("delay_s"),
    )
    ck = _work_dir("stream_ssj_ck")
    shutil.rmtree(ck, ignore_errors=True)
    return run_available_now(joined, ck, output_mode="append")


# ---------------------------------------------------------------------------
# cohort analytics / clustering keys / deterministic mode
# ---------------------------------------------------------------------------


@q(
    "events_retention_cohort",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    firstseen AS (
      SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY user_id
    )
    SELECT cohort_day,
           CAST(date_diff('day', cohort_day, day) AS INT) AS day_offset,
           COUNT(DISTINCT act.user_id) AS n_users
    FROM act JOIN firstseen USING (user_id)
    GROUP BY cohort_day, day_offset
    """,
)
def events_retention_cohort(spark, sf):
    """Retention cohort matrix — the standard product-analytics rollup:
    bucket users by first-seen day, then count how many of each cohort
    are active N days later.  Plan: per-user distinct activity days
    (map-side-combined distinct), a tiny first-seen agg joined back on
    user_id, then a hash agg over (cohort_day, offset).  Every stage
    keys on user_id or the small cohort grid — no window functions, no
    global sort, so the shape is unchanged at 10^12 events."""
    e = t(spark, sf, "events").select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    first = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        e.join(first, "user_id")
        .select(
            "cohort_day",
            F.datediff("day", "cohort_day").cast("int").alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def _zterms(x: str, y: str, bits: int, spark_dialect: bool) -> str:
    """Interleave the low ``bits`` bits of integer expressions x and y
    into a Z-order (Morton) value: bit i of x lands at position 2i, bit
    i of y at 2i+1.  Same arithmetic emitted for both engines — only the
    shift syntax differs (Spark: shiftleft/shiftright functions; DuckDB:
    << / >> operators)."""
    terms = []
    for i in range(bits):
        if spark_dialect:
            terms.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})")
            terms.append(f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})")
        else:
            terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@q(
    "zorder_cluster_key",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST(l_partkey % 16 AS INT) AS px,
           CAST(l_suppkey % 16 AS INT) AS sy,
           CAST({_zterms('(l_partkey % 16)', '(l_suppkey % 16)', 4, False)}
                AS INT) AS zkey
    FROM lineitem WHERE l_orderkey < 2000
    """,
)
def zorder_cluster_key(spark, sf):
    """Z-order (Morton) clustering key over two join/filter dimensions —
    the data-layout optimization behind multi-dimensional file pruning
    (Delta/Iceberg OPTIMIZE ZORDER BY): rows close in (part, supplier)
    space get close Z-values, so writing with
    ``repartitionByRange("zkey").sortWithinPartitions("zkey")`` yields
    files whose min/max stats are tight in BOTH dimensions and a scan
    filtered on either column prunes most files.  The key itself is pure
    JVM bit arithmetic (shift/mask/or) inside whole-stage codegen; this
    query materializes the key on a bounded slice so the oracle can
    verify the interleave bit-for-bit."""
    li = t(spark, sf, "lineitem").filter(F.col("l_orderkey") < 2000)
    z = _zterms("(l_partkey % 16)", "(l_suppkey % 16)", 4, True)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_partkey") % 16).cast("int").alias("px"),
        (F.col("l_suppkey") % 16).cast("int").alias("sy"),
        F.expr(z).cast("int").alias("zkey"),
    )


@q(
    "agg_mode",
    oracle="""
    SELECT flag, v AS mode_qty, cnt AS n_occurrences FROM (
      SELECT flag, v, cnt,
             ROW_NUMBER() OVER (PARTITION BY flag
                                ORDER BY cnt DESC, v ASC) AS rn
      FROM (
        SELECT l_returnflag AS flag, l_quantity AS v, COUNT(*) AS cnt
        FROM lineitem GROUP BY 1, 2)
    ) WHERE rn = 1
    """,
)
def agg_mode(spark, sf):
    """Deterministic per-group mode: the most frequent l_quantity per
    return flag, ties broken toward the smallest value (bare ``mode()``
    is tie-nondeterministic in BOTH engines — unusable for a verified
    pipeline).  Two-level shape: a map-side-combined (group, value)
    count agg first, so the window ranks only one row per distinct value
    per group — its input is bounded by value cardinality, not row
    count, the same state-bounding trick as the exact-percentile
    operator."""
    li = t(spark, sf, "lineitem")
    counts = (
        li.groupBy(F.col("l_returnflag").alias("flag"),
                   F.col("l_quantity").alias("v"))
        .agg(F.count("*").alias("cnt"))
    )
    w = W.partitionBy("flag").orderBy(F.desc("cnt"), F.asc("v"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("flag", F.col("v").alias("mode_qty"),
                F.col("cnt").alias("n_occurrences"))
    )


@q(
    "merge_upsert",
    oracle="""
    WITH updates AS (
      SELECT doc_id, 'batch2' AS source, upper(text) AS text
      FROM documents WHERE doc_id % 7 = 3
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, 'batch2' AS source, text
      FROM documents WHERE doc_id % 97 = 5
    )
    SELECT doc_id, source, md5(text) AS content_hash FROM updates
    UNION ALL
    SELECT d.doc_id, d.source, md5(d.text) AS content_hash
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM updates)
    """,
)
def merge_upsert(spark, sf):
    """CDC merge (MERGE INTO semantics, SCD type 1): an update batch
    overwrites matching target rows and inserts new keys, expressed as
    the classic upsert-without-MERGE plan — updates UNION ALL
    (target LEFT ANTI updates).  The update batch here is derived
    deterministically from the target (every 7th doc modified, every
    97th re-keyed as an insert) so the oracle reproduces it; in
    production it is the change feed.

    100 TB shape: the anti join keys on doc_id — broadcast when the
    change batch is small (the common case, and Catalyst picks it here),
    shuffle-join otherwise; no windows, no global sorts, and the
    untouched partitions of a partitioned target would be rewritten only
    where keys collide (manifest-level file pruning in a real MERGE)."""
    d = t(spark, sf, "documents")
    updates = (
        d.filter(F.col("doc_id") % 7 == 3)
        .select("doc_id", F.lit("batch2").alias("source"),
                F.upper("text").alias("text"))
        .unionByName(
            d.filter(F.col("doc_id") % 97 == 5)
            .select((F.col("doc_id") + 1000000).alias("doc_id"),
                    F.lit("batch2").alias("source"), "text"))
    )
    merged = updates.select(
        "doc_id", "source", F.md5("text").alias("content_hash")
    ).unionByName(
        d.join(F.broadcast(updates.select("doc_id")), "doc_id", "left_anti")
        .select("doc_id", "source", F.md5("text").alias("content_hash"))
    )
    return merged


@q(
    "agg_histogram",
    oracle="""
    SELECT bucket,
           COUNT(*) AS n,
           MIN(cents) AS lo_cents,
           MAX(cents) AS hi_cents
    FROM (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) // 5000000 AS bucket
      FROM orders
    )
    GROUP BY bucket
    """,
)
def agg_histogram(spark, sf):
    """Fixed-width histogram of order totals — the profiling primitive
    behind data-quality dashboards and range-partition planning.  Values
    are fixed-pointed to integer cents BEFORE bucketing so the bucket
    boundary arithmetic is exact INTEGER division in both engines
    (Spark ``div`` / DuckDB ``//`` — a plain ``/`` is double division,
    and DuckDB's cast-to-int ROUNDS where Spark's truncates, which
    silently shifts every odd bucket's boundary); one hash agg with
    map-side partial combine, state bounded by bucket count."""
    o = t(spark, sf, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        o.select(cents.alias("cents"),
                 F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT) "
                        "div 5000000").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"),
             F.min("cents").alias("lo_cents"),
             F.max("cents").alias("hi_cents"))
    )


@q(
    "window_ntile",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           NTILE(4) OVER (PARTITION BY o_orderpriority
                          ORDER BY o_totalprice, o_orderkey) AS quartile
    FROM orders WHERE o_orderkey < 4000
    """,
)
def window_ntile(spark, sf):
    """Quartile assignment per group (NTILE) — equal-frequency binning
    for score calibration / stratified splits.  The order key is made
    TOTAL (price, then key) so tile boundaries are deterministic in both
    engines.  Partitioned window — state per task is one group's rows;
    the bounded key slice keeps the demo exact while the per-group shape
    is the scale path (no global window)."""
    o = t(spark, sf, "orders").filter(F.col("o_orderkey") < 4000)
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey", "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
    )


@q(
    "streaming_cdc_upsert",
    oracle="""
    WITH b1 AS (
      SELECT doc_id, 'batch1' AS source, md5(upper(text)) AS content_hash
      FROM documents WHERE doc_id % 7 = 3
    ), b2 AS (
      SELECT doc_id, 'batch2' AS source, md5(text || ' v2') AS content_hash
      FROM documents WHERE doc_id % 5 = 2
    )
    SELECT doc_id, source, content_hash FROM b2
    UNION ALL
    SELECT doc_id, source, content_hash FROM b1
    WHERE doc_id NOT IN (SELECT doc_id FROM b2)
    UNION ALL
    SELECT doc_id, source, md5(text) AS content_hash FROM documents
    WHERE doc_id NOT IN (SELECT doc_id FROM b1)
      AND doc_id NOT IN (SELECT doc_id FROM b2)
    """,
)
def streaming_cdc_upsert(spark, sf):
    """CDC apply as a STREAM: a change feed (two deterministic update
    batches over the documents table, later batch wins on overlapping
    keys — doc_id % 35 hits both) drained through
    ``writeStream.foreachBatch`` with ``maxFilesPerTrigger=1``; each
    micro-batch is compacted to its newest version per key (max_by over
    the version column — the within-batch CDC compaction every real
    apply needs, and what keeps the result correct even if the source
    coalesces both files into one trigger), then merged into the running
    target as updates ∪ (target LEFT ANTI updates).  The final
    materialized state must equal the SQL-computed end state — the
    strongest batch-expressible check of exactly-once CDC application
    and batch ordering.

    100 TB shape: per micro-batch cost is |batch| + one broadcast
    anti-join against the target (file-pruned to colliding partitions in
    a real MERGE sink); the stream never shuffles the full target."""
    import glob
    import os as _os
    import shutil

    from ocr_spark.streaming import run_available_now  # noqa: F401 (doc link)

    d = t(spark, sf, "documents")
    base = d.select("doc_id", "source", F.md5("text").alias("content_hash"))
    b1 = d.filter(F.col("doc_id") % 7 == 3).select(
        "doc_id", F.lit("batch1").alias("source"),
        F.md5(F.upper("text")).alias("content_hash"),
        F.lit(1).alias("version"))
    b2 = d.filter(F.col("doc_id") % 5 == 2).select(
        "doc_id", F.lit("batch2").alias("source"),
        F.md5(F.concat(F.col("text"), F.lit(" v2"))).alias("content_hash"),
        F.lit(2).alias("version"))

    feed = _work_dir("cdc_feed")
    shutil.rmtree(feed, ignore_errors=True)
    _os.makedirs(feed)
    for i, b in enumerate((b1, b2), start=1):
        stage = _work_dir(f"cdc_stage{i}")
        shutil.rmtree(stage, ignore_errors=True)
        b.coalesce(1).write.parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = f"{feed}/batch{i}.parquet"
        shutil.copy(part, dst)
        _os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))  # order
        shutil.rmtree(stage)

    changes = (
        spark.readStream.schema(
            "doc_id bigint, source string, content_hash string, version int")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    state = {"df": base.localCheckpoint()}

    def apply_batch(batch, _epoch):
        newest = (
            batch.groupBy("doc_id")
            .agg(F.max_by(F.struct("source", "content_hash"),
                          "version").alias("b"))
            .select("doc_id", "b.source", "b.content_hash")
        )
        cur = state["df"]
        state["df"] = newest.unionByName(
            cur.join(F.broadcast(newest.select("doc_id")),
                     "doc_id", "left_anti")
        ).localCheckpoint()

    ck = _work_dir("cdc_ck")
    shutil.rmtree(ck, ignore_errors=True)
    (changes.writeStream.foreachBatch(apply_batch)
     .option("checkpointLocation", ck)
     .trigger(availableNow=True).start().awaitTermination())
    return state["df"]


@q(
    "agg_hll_rollup",
    oracle="""
    SELECT event_type, true AS within_tol
    FROM events GROUP BY event_type
    """,
)
def agg_hll_rollup(spark, sf):
    """Mergeable-sketch rollup (Apache DataSketches HLL, JVM-side):
    distinct users are sketched once at (day, event_type) grain, then
    rolled up to event_type by UNIONING the sketches — the raw events
    are never rescanned at the coarser grain, which is the entire point
    at 100 TB (daily sketches persist; weekly/monthly/all-time rollups
    are sketch unions over tiny state).  Checked by booleanization: the
    rolled-up estimate must sit within 1.5% of the exact distinct count
    per group (HLL lgK=12 ≈ 0.8% RSE), so both engines emit
    (event_type, true) and the hash comparison proves the tolerance.

    100 TB shape: two map-side-combinable hash aggs over bounded sketch
    state (4 KB per group) + one broadcast-sized join against the exact
    twin (which exists only for the check — production keeps sketches
    only)."""
    e = t(spark, sf, "events")
    daily = e.groupBy(
        F.date_trunc("day", "ts").alias("d"), "event_type"
    ).agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
    rolled = daily.groupBy("event_type").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"))
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("ex"))
    return (
        rolled.join(exact, "event_type")
        .select(
            "event_type",
            (F.abs(F.col("est") - F.col("ex")) / F.col("ex") <= 0.015)
            .alias("within_tol"),
        )
    )


@q(
    "events_gapfill_ffill",
    oracle="""
    WITH b AS (
      SELECT user_id,
             date_trunc('hour', min(ts)) AS h0,
             date_trunc('hour', max(ts)) AS h1
      FROM events WHERE user_id < 40 GROUP BY user_id
    ),
    spine AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS h
      FROM b
    ),
    hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v100
      FROM events WHERE user_id < 40 GROUP BY 1, 2
    )
    SELECT s.user_id,
           strftime(s.h, '%Y-%m-%d %H:%M:%S') AS hour,
           (hourly.v100 IS NULL) AS filled,
           COALESCE(LAST_VALUE(hourly.v100 IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.h
             ROWS UNBOUNDED PRECEDING), 0) AS v100_ff
    FROM spine s LEFT JOIN hourly
      ON s.user_id = hourly.user_id AND s.h = hourly.h
    """,
)
def events_gapfill_ffill(spark, sf):
    """Time-series regularization: per-user hourly date spine
    (sequence + explode between each user's first and last hour), LEFT
    join of the sparse hourly aggregate, forward-fill of missing hours
    via last(ignoreNulls) — the gap-fill / LOCF staple of every
    time-series store, here as pure DataFrame ops.  Fixed-point sums
    keep float addition order out of the comparison; the user_id < 40
    slice bounds the demo spine (~28k rows, 91% of them filled — the
    data is far sparser than its hourly grid).

    100 TB shape: spine generation is a narrow per-group explode (no
    driver loop, no cross join against a global calendar); the fill
    window partitions by user — bounded state, no global sort.  Spine
    size is (active span × users), governable by the truncation grain."""
    e = t(spark, sf, "events").filter(F.col("user_id") < 40)
    hourly = (
        e.groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("v100"))
    )
    bounds = e.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h"),
    )
    joined = spine.join(hourly, ["user_id", "h"], "left")
    w = (W.partitionBy("user_id").orderBy("h")
         .rowsBetween(W.unboundedPreceding, 0))
    return joined.select(
        "user_id",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.col("v100").isNull().alias("filled"),
        F.coalesce(F.last("v100", ignorenulls=True).over(w),
                   F.lit(0)).alias("v100_ff"),
    )


@q(
    "merge_scd2",
    oracle="""
    WITH updates AS (
      SELECT c_custkey, round(c_acctbal + 100.0, 2) AS new_bal
      FROM customer WHERE c_custkey % 10 = 0
    )
    SELECT c_custkey, round(c_acctbal, 2) AS bal,
           CAST(1 AS INT) AS version, true AS is_current
    FROM customer WHERE c_custkey % 10 <> 0
    UNION ALL
    SELECT c_custkey, round(c_acctbal, 2) AS bal,
           CAST(1 AS INT) AS version, false AS is_current
    FROM customer WHERE c_custkey % 10 = 0
    UNION ALL
    SELECT c_custkey, new_bal AS bal,
           CAST(2 AS INT) AS version, true AS is_current
    FROM updates
    """,
)
def merge_scd2(spark, sf):
    """Slowly-changing-dimension TYPE 2 merge: unlike merge_upsert
    (last-writer-wins overwrite), the superseded row is RETAINED with
    is_current=false and the update lands as a new version — the
    lakehouse pattern for dimensions whose history must stay queryable
    (as-of joins against old versions).

    100 TB shape: changed keys found by one equi semi/anti split of the
    target against the (usually small, broadcast) change batch; no
    window over the dimension, history grows append-only.  Output =
    untouched ∪ expired(v1) ∪ new(v2)."""
    c = t(spark, sf, "customer").select(
        "c_custkey", F.round("c_acctbal", 2).alias("bal"))
    updates = c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey", F.round(F.col("bal") + 100.0, 2).alias("new_bal"))
    untouched = c.join(
        F.broadcast(updates.select("c_custkey")), "c_custkey", "left_anti"
    ).select("c_custkey", "bal", F.lit(1).alias("version"),
             F.lit(True).alias("is_current"))
    expired = c.join(
        F.broadcast(updates.select("c_custkey")), "c_custkey", "left_semi"
    ).select("c_custkey", "bal", F.lit(1).alias("version"),
             F.lit(False).alias("is_current"))
    fresh = updates.select(
        "c_custkey", F.col("new_bal").alias("bal"),
        F.lit(2).alias("version"), F.lit(True).alias("is_current"))
    return untouched.unionByName(expired).unionByName(fresh)


@q(
    "events_attribution",
    oracle="""
    WITH conv AS (
      SELECT user_id, ts AS conv_ts, value AS conv_value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events WHERE event_type = 'purchase'
    ),
    c1 AS (SELECT user_id, conv_ts, conv_value FROM conv WHERE rn = 1),
    pre AS (
      SELECT e.user_id, e.event_type, e.ts, e.event_id, c1.conv_value
      FROM events e JOIN c1 USING (user_id)
      WHERE e.ts < c1.conv_ts
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rf,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rl
      FROM pre
    )
    SELECT user_id,
           MAX(CASE WHEN rf = 1 THEN event_type END) AS first_touch,
           MAX(CASE WHEN rl = 1 THEN event_type END) AS last_touch,
           CAST(COUNT(*) AS INT) AS n_pre_events,
           ROUND(MAX(conv_value), 4) AS conv_value
    FROM ranked GROUP BY user_id
    """,
)
def events_attribution(spark, sf):
    """First-touch / last-touch conversion attribution — the standard
    marketing-analytics rollup: for each user's FIRST purchase, which
    event type opened their journey and which one closed it.

    Shape (100 TB posture): no windows over the raw event stream — the
    first conversion per user is a ``min_by(struct(ts, event_id))`` hash
    agg (map-side partial), the attribution window is one equi-join on
    user_id + a timestamp filter, and first/last touch are min_by/max_by
    over the SAME composite key in a second hash agg.  Every stage keys
    on user_id, so the plan is two shuffles total regardless of event
    volume, and skewed power-users stay inside the agg (no per-user row
    explosion back to the driver)."""
    e = t(spark, sf, "events")
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.expr("min_by(struct(ts, value), struct(ts, event_id))").alias("c")
        )
        .select("user_id", F.col("c.ts").alias("conv_ts"),
                F.col("c.value").alias("conv_value"))
    )
    pre = e.join(conv, "user_id").filter(F.col("ts") < F.col("conv_ts"))
    return pre.groupBy("user_id").agg(
        F.expr("min_by(event_type, struct(ts, event_id))").alias("first_touch"),
        F.expr("max_by(event_type, struct(ts, event_id))").alias("last_touch"),
        F.count("*").cast("int").alias("n_pre_events"),
        F.round(F.max("conv_value"), 4).alias("conv_value"),
    )


@q(
    "events_downsample_ohlc",
    oracle="""
    WITH ranked AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             value, ts, event_id,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rf,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rl
      FROM events
    )
    SELECT event_type, bucket,
           ROUND(MAX(CASE WHEN rf = 1 THEN value END), 4) AS open_v,
           ROUND(MAX(value), 4) AS high_v,
           ROUND(MIN(value), 4) AS low_v,
           ROUND(MAX(CASE WHEN rl = 1 THEN value END), 4) AS close_v,
           CAST(COUNT(*) AS INT) AS n
    FROM ranked GROUP BY event_type, bucket
    """,
)
def events_downsample_ohlc(spark, sf):
    """Time-series downsampling to hourly OHLC bars (the hypertable /
    continuous-aggregate rollup shape): per (event_type, hour) emit
    open/high/low/close/count, with open/close tie-broken by
    (ts, event_id) so concurrent events downsample deterministically.

    Shape (100 TB posture): ONE hash aggregation — open/close are
    ``min_by``/``max_by`` over the composite time key, so partial
    aggregation folds each bar map-side and no raw event ever crosses
    the shuffle unaggregated (vs the window-rank formulation, which
    shuffles and sorts the full stream; the oracle uses that form
    precisely because it is the independent reference).  Bars are
    mergeable: re-aggregating hourly bars with the same min_by/max_by
    over bucket boundaries yields exact daily bars — the rollup chain
    agg_hll_rollup documents for sketches holds here too."""
    e = t(spark, sf, "events")
    return (
        e.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket"))
        .agg(
            F.round(
                F.expr("min_by(value, struct(ts, event_id))"), 4
            ).alias("open_v"),
            F.round(F.max("value"), 4).alias("high_v"),
            F.round(F.min("value"), 4).alias("low_v"),
            F.round(
                F.expr("max_by(value, struct(ts, event_id))"), 4
            ).alias("close_v"),
            F.count("*").cast("int").alias("n"),
        )
    )


@q(
    "sink_compact_small_files",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           bit_xor(CAST(('0x' || substring(md5(
             CAST(doc_id AS VARCHAR) || '|' || source || '|'
             || CAST(n_chars AS VARCHAR)), 1, 15)) AS BIGINT)) AS checksum,
           true AS files_reduced
    FROM documents
    """,
)
def sink_compact_small_files(spark, sf):
    """Small-files compaction — the table-maintenance job every lake at
    100 TB runs nightly: a directory fragmented into many tiny parquet
    files (here: the documents table deliberately written as 64 shards)
    is rewritten into few right-sized files, preserving content
    exactly.  Returns (n_rows, portable checksum, files_reduced): the
    oracle computes the same count + order-independent XOR-of-md5
    checksum over the ORIGINAL table, so a green row proves the
    compaction was lossless — and files_reduced booleanizes the actual
    on-disk file-count drop.

    Shape (100 TB posture): compaction reads only file listings + data
    once and writes once; the coalesce() avoids a shuffle entirely
    (narrow merge of input splits into fewer tasks — correct when
    output files just need to be BIGGER; use repartition() instead when
    they must also be balanced or cluster-keyed, cf.
    zorder_cluster_key).  Real table formats do this transactionally
    (Iceberg rewrite_data_files); the parquet-directory form here is
    the same plan minus the snapshot commit (SURVEY §4.4 shim)."""
    d = t(spark, sf, "documents").select("doc_id", "source", "n_chars")
    frag = _work_dir("compact_in")
    d.repartition(64).write.mode("overwrite").parquet(frag)
    spark_files = len([
        f for f in __import__("os").listdir(frag) if f.endswith(".parquet")])
    out = _work_dir("compact_out")
    back = spark.read.schema(d.schema).parquet(frag)
    back.coalesce(2).write.mode("overwrite").parquet(out)
    n_out = len([
        f for f in __import__("os").listdir(out) if f.endswith(".parquet")])
    comp = spark.read.schema(d.schema).parquet(out)
    ck = F.expr(
        "bit_xor(CAST(conv(substring(md5(concat_ws('|', doc_id, source,"
        " n_chars)), 1, 15), 16, 10) AS BIGINT))")
    return comp.agg(
        F.count("*").alias("n_rows"),
        ck.alias("checksum"),
        F.lit(n_out < spark_files).alias("files_reduced"),
    )


@q(
    "events_anomaly_mad",
    oracle="""
    WITH v AS (
      SELECT event_type,
             CAST(round(value * 1000000) AS BIGINT) AS vfp
      FROM events
    ),
    m AS (
      SELECT event_type, quantile_cont(vfp, 0.5) AS med
      FROM v GROUP BY event_type
    ),
    d AS (
      SELECT v.event_type, abs(vfp - med) AS dev, med
      FROM v JOIN m USING (event_type)
    ),
    md AS (
      SELECT event_type, quantile_cont(dev, 0.5) AS mad
      FROM d GROUP BY event_type
    )
    SELECT event_type,
           CAST(any_value(d.med) * 2 AS BIGINT) AS med_fp2,
           CAST(any_value(md.mad) * 2 AS BIGINT) AS mad_fp2,
           CAST(SUM(CASE WHEN d.dev > 3 * md.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           COUNT(*) AS n
    FROM d JOIN md USING (event_type)
    GROUP BY event_type
    """,
)
def events_anomaly_mad(spark, sf):
    """Robust outlier detection per event type: median + MAD (median
    absolute deviation), the standard telemetry-cleaning primitive —
    unlike mean/stddev, one wild sensor value cannot drag the threshold
    toward itself.  Values go through a ×1e6 fixed-point BIGINT first,
    so both engines interpolate medians over integers (exact halves in
    doubles) and the outputs (med/mad ×2 → integers) compare
    bit-identically; flags use dev > 3·MAD.

    100 TB shape: two hash aggregations over (event_type) with the tiny
    per-type median/MAD frames BROADCAST back — the corpus shuffles
    once per aggregate, never for the joins.  Exact percentile sorts
    within groups; at true 100 TB the drop-in scale path is
    percentile_approx (covered by agg_percentile_approx) with the same
    two-broadcast shape."""
    e = t(spark, sf, "events").select(
        "event_type",
        F.round(F.col("value") * 1e6).cast("long").alias("vfp"))
    med = e.groupBy("event_type").agg(
        F.percentile("vfp", 0.5).alias("med"))
    dev = (e.join(F.broadcast(med), "event_type")
             .withColumn("dev", F.abs(F.col("vfp") - F.col("med"))))
    mad = dev.groupBy("event_type").agg(
        F.percentile("dev", 0.5).alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            (F.first("med") * 2).cast("long").alias("med_fp2"),
            (F.first("mad") * 2).cast("long").alias("mad_fp2"),
            F.sum((F.col("dev") > 3 * F.col("mad")).cast("long"))
             .alias("n_outliers"),
            F.count("*").alias("n"),
        )
    )


@q(
    "events_sliding_distinct",
    oracle="""
    SELECT h - k * INTERVAL 1 HOUR AS window_start,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM (
      SELECT date_trunc('hour', ts) AS h, user_id,
             unnest(generate_series(0, 2)) AS k
      FROM events
    )
    GROUP BY 1
    """,
)
def events_sliding_distinct(spark, sf):
    """Sliding-window distinct users: every event contributes to the
    three 3-hour windows (1-hour step) that contain it, then one exact
    COUNT(DISTINCT) per window — the hourly-active-users panel.  The
    explode-to-windows + hash-agg formulation is how Spark's own
    ``window(ts, '3 hours', '1 hour')`` desugars; writing it explicitly
    keeps the oracle SQL-expressible.

    Shape (100 TB posture): the ×3 fan-out happens in-task (Generate,
    no shuffle), and the distinct aggregates two-phase: partial distinct
    sets per partition, merge on the window key.  At whale scale exact
    per-window distinct is memory-bound on hot windows — the documented
    swap is approx_count_distinct (mergeable HLL, see agg_hll_rollup)
    with the same explode shape."""
    e = t(spark, sf, "events")
    return (
        e.select(F.date_trunc("hour", "ts").alias("h"), "user_id")
        .select("h", "user_id", F.explode(F.sequence(F.lit(0), F.lit(2))).alias("k"))
        .select(
            F.expr("h - k * INTERVAL 1 HOUR").alias("window_start"), "user_id")
        .groupBy("window_start")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
    )


@q(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    trans AS (
      SELECT prev, event_type AS next, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev IS NOT NULL GROUP BY prev, event_type
    ),
    tot AS (SELECT prev, SUM(n) AS tn FROM trans GROUP BY prev)
    SELECT t.prev, t.next, t.n,
           ROUND(CAST(t.n AS DOUBLE) / tot.tn, 8) AS prob
    FROM trans t JOIN tot USING (prev)
    """,
)
def events_markov_transitions(spark, sf):
    """First-order Markov transition matrix over per-user event
    streams: lag(event_type) within each user's (ts, event_id)-ordered
    history, then transition counts and row-normalized probabilities —
    the session-model / funnel-prior builder.  The (ts, event_id)
    composite order makes the lag deterministic under timestamp ties.

    Shape (100 TB posture): events are scanned ONCE — one shuffle on
    user_id feeds the lag window (per-user state is a single previous
    row — bounded, streaming-friendly), transition counts are a
    map-side-combined hash agg on a |types|² key space, and the row
    normalization is a window over that ALREADY-AGGREGATED |types|²
    frame (constant-size, engine cost nil) — deriving the totals as a
    second aggregate branch would recompute the raw-event window per
    branch (plan-gated: exactly one FileScan, one lag)."""
    e = t(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "event_type",
        F.lag("event_type").over(w).alias("prev"),
    )
    trans = (
        seq.filter(F.col("prev").isNotNull())
        .groupBy("prev", F.col("event_type").alias("next"))
        .agg(F.count("*").alias("n"))
    )
    tn = F.sum("n").over(W.partitionBy("prev"))
    return trans.select(
        "prev", "next", "n",
        F.round(F.col("n").cast("double") / tn, 8).alias("prob"),
    )


@q(
    "events_rate_limit",
    oracle="""
    SELECT event_id, user_id,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(rn AS INT) AS rn
    FROM (
      SELECT event_id, user_id, ts,
             row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn <= 3
    """,
)
def events_rate_limit(spark, sf):
    """Per-user daily rate limiting / quota enforcement: keep the first
    3 events per (user, day) in (ts, event_id) order and drop the rest
    — the abuse-throttle / cost-cap shape, also how a crawler caps
    per-host fetches per period.  Composite order key makes the cut
    deterministic under timestamp ties.

    Shape (100 TB posture): one shuffle on the (user, day) composite —
    the day component keeps any single hot user's history from
    concentrating on one task (bounded group size by construction);
    row_number needs no full sort of the partition beyond each group,
    and production swaps the exact window for
    dropDuplicatesWithinWatermark-style streaming state when the limit
    must apply online."""
    e = t(spark, sf, "events")
    day = F.date_trunc("day", "ts")
    w = W.partitionBy("user_id", day).orderBy("ts", "event_id")
    return (
        e.select(
            "event_id", "user_id", day.alias("day"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .select("event_id", "user_id", "day", F.col("rn").cast("int").alias("rn"))
    )


def _cms_frame(spark, sf):
    """Full Count-Min frame (exact_n, est, both guarantee booleans) —
    consumed by the registered query below (deterministic columns
    only) and by the direct unit test that asserts the probabilistic
    (e/w)·N bound (tests/test_data_ops.py)."""
    e = t(spark, sf, "events").select("event_type")
    D, WID = 4, 64
    cells = F.array(*[
        F.struct(
            F.lit(r).alias("r"),
            F.pmod(F.xxhash64(F.col("event_type"), F.lit(r)), F.lit(WID))
            .alias("c"),
        ) for r in range(D)
    ])
    cms = (
        e.select(F.explode(cells).alias("rc"))
        .groupBy(F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
        .agg(F.count("*").alias("cell_n"))
    )
    exact = e.groupBy("event_type").agg(F.count("*").alias("exact_n"))
    total = exact.agg(F.sum("exact_n").alias("tot"))
    probe = exact.select(
        "event_type", "exact_n", F.explode(cells).alias("rc")
    ).select("event_type", "exact_n",
             F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
    est = (
        probe.join(F.broadcast(cms), ["r", "c"])
        .groupBy("event_type")
        .agg(F.min("exact_n").alias("exact_n"), F.min("cell_n").alias("est"))
    )
    import math
    bound = F.ceil(F.lit(math.e / WID) * F.col("tot"))
    return (
        est.join(F.broadcast(total), F.lit(True))
        .select(
            "event_type", "exact_n", "est",
            (F.col("est") >= F.col("exact_n")).alias("est_ge_exact"),
            (F.col("est") - F.col("exact_n") <= bound)
            .alias("err_within_bound"),
        )
    )


@q(
    "agg_cms_heavy_hitters",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS exact_n,
           true AS est_ge_exact
    FROM events GROUP BY event_type
    """,
)
def agg_cms_heavy_hitters(spark, sf):
    """Count-Min-sketch heavy hitters (Cormode & Muthukrishnan 2005):
    a d=4 x w=64 counter grid where every event increments one cell
    per hash row; a key's estimate is the MIN of its d cells —
    never an underestimate, over by at most (e/w)·N with probability
    1-e^-d.  The DRIVER-CHECKED surface carries only deterministic
    facts: exact counts and the never-underestimates boolean (true by
    construction, not probabilistically).  The (e/w)·N error bound is
    probabilistic — hardcoding `true` for it in the oracle would turn
    a legitimate rare exceedance (data regen, WID/D change) into an
    opaque cross-engine hash mismatch (round-4 ADVICE) — so it is
    asserted by the DIRECT unit test over the full frame
    (tests/test_data_ops.py::test_cms_guarantees_hold_at_sf001), where
    a violation names the key and the margin.

    Shape (100 TB posture): the sketch build is an in-task x4 explode
    (Generate, no shuffle) + ONE map-side-combined hash agg over a key
    space of at most d·w = 256 cells — constant-size state no matter
    the corpus, and cells are trivially MERGEABLE across shards/days
    (sum them), which is the entire point vs exact counting: rollups
    and stream unions without rescanning raw events.  The probe side
    re-derives each candidate's cells in codegen and joins the
    256-row sketch by broadcast."""
    return _cms_frame(spark, sf).select(
        "event_type", "exact_n", "est_ge_exact")


@q(
    "diag_expectations",
    oracle="""
    SELECT 'orders_custkey_fk' AS expectation,
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT) AS violations
    UNION ALL
    SELECT 'lineitem_orderkey_fk',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT)
    UNION ALL
    SELECT 'customer_custkey_unique',
           CAST((SELECT COUNT(*) - COUNT(DISTINCT c_custkey) FROM customer)
                AS BIGINT)
    UNION ALL
    SELECT 'lineitem_quantity_range',
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT)
    UNION ALL
    SELECT 'documents_lang_domain',
           CAST((SELECT COUNT(*) FROM documents
                 WHERE lang NOT IN ('en','de','fr','es','zh')) AS BIGINT)
    UNION ALL
    SELECT 'events_ts_not_null',
           CAST((SELECT COUNT(*) FROM events WHERE ts IS NULL) AS BIGINT)
    """,
)
def diag_expectations(spark, sf):
    """Declarative data-quality expectation suite (the dbt-test /
    Great-Expectations surface): referential integrity, key
    uniqueness, value ranges, categorical domains, and null contracts
    evaluated in one job, each emitting its violation count — the gate
    a production pipeline runs before promoting a snapshot.

    Shape (100 TB posture): each FK check is a LEFT ANTI join that
    ships only the key column, with the dimension side broadcast when
    small; range/domain/null checks are map-side-combined aggregates
    over pruned single-column scans; uniqueness is count minus
    two-phase distinct.  All six checks are independent jobs unioned
    at 1 row each — a scheduler runs them concurrently, and adding an
    expectation never rescans another's table."""
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    li = t(spark, sf, "lineitem")
    d = t(spark, sf, "documents")
    e = t(spark, sf, "events")

    def one(name, cnt_df):
        return cnt_df.select(
            F.lit(name).alias("expectation"),
            F.col("violations").cast("long"))

    fk_orders = one(
        "orders_custkey_fk",
        o.select("o_custkey").join(
            F.broadcast(c.select("c_custkey")),
            F.col("o_custkey") == F.col("c_custkey"), "left_anti"
        ).agg(F.count("*").alias("violations")))
    fk_lineitem = one(
        "lineitem_orderkey_fk",
        li.select("l_orderkey").join(
            o.select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"), "left_anti"
        ).agg(F.count("*").alias("violations")))
    uniq = one(
        "customer_custkey_unique",
        c.agg((F.count("c_custkey") - F.countDistinct("c_custkey"))
              .alias("violations")))
    rng = one(
        "lineitem_quantity_range",
        li.filter((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50))
        .agg(F.count("*").alias("violations")))
    dom = one(
        "documents_lang_domain",
        d.filter(~F.col("lang").isin("en", "de", "fr", "es", "zh"))
        .agg(F.count("*").alias("violations")))
    nn = one(
        "events_ts_not_null",
        e.filter(F.col("ts").isNull())
        .agg(F.count("*").alias("violations")))
    return (fk_orders.unionByName(fk_lineitem).unionByName(uniq)
            .unionByName(rng).unionByName(dom).unionByName(nn))


@q(
    "streaming_rate_limit",
    oracle="""
    SELECT event_id, user_id,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(rn AS INT) AS rn
    FROM (
      SELECT event_id, user_id, ts,
             row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn <= 3
    """,
)
def streaming_rate_limit(spark, sf):
    """The batch ``events_rate_limit`` quota enforced ONLINE: a custom
    applyInPandasWithState operator holds one admission counter per
    (user, day) in the state store and admits the first 3 events per
    key — run as an actual stream over the events table and drained
    availableNow.  With a single micro-batch replay the admitted set
    equals the batch window's row_number ≤ 3 (the oracle); the
    cross-micro-batch + restart behavior (quota survives a new query
    instance via state-store recovery) is gated in
    tests/test_streaming.py.

    Shape (100 TB posture): state is ONE int per active (user, day) —
    the day key bounds state cardinality and a production deployment
    adds event-time timeout eviction for closed days; each micro-batch
    shuffles only its own events to their key's state partition."""
    import glob
    import shutil

    from ocr_spark.streaming import (
        events_stream, rate_limited_events, run_available_now)

    tmp = _work_dir("stream_ratelimit")
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    src = f"{sf}/events.parquet"
    files = glob.glob(f"{src}/*.parquet") or [src]
    for f in files:
        shutil.copy(f, tmp)
    stream = events_stream(spark, tmp, max_files_per_trigger=len(files))
    ck = _work_dir("stream_ratelimit_ck")
    shutil.rmtree(ck, ignore_errors=True)
    return run_available_now(rate_limited_events(stream, 3), ck,
                             output_mode="update")


@q(
    "agg_histogram_equidepth",
    oracle="""
    WITH b AS (
      SELECT quantile_cont(l_quantity, 0.25) AS b1,
             quantile_cont(l_quantity, 0.50) AS b2,
             quantile_cont(l_quantity, 0.75) AS b3
      FROM lineitem
    )
    SELECT CASE WHEN l_quantity <= b1 THEN 0
                WHEN l_quantity <= b2 THEN 1
                WHEN l_quantity <= b3 THEN 2 ELSE 3 END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(MIN(l_quantity), 2) AS lo,
           ROUND(MAX(l_quantity), 2) AS hi
    FROM lineitem, b
    GROUP BY 1
    """,
)
def agg_histogram_equidepth(spark, sf):
    """Equi-DEPTH (quantile-bucketed) histogram — the CBO statistics
    shape (Spark's own ANALYZE histograms, DB2/Oracle height-balanced
    buckets) and the complement of the fixed-width agg_histogram:
    bucket boundaries are the data's own quartiles, so every bucket
    holds ~N/4 rows no matter how skewed the distribution.  Boundaries
    interpolate identically in both engines because l_quantity is an
    integer-valued column (quartile arithmetic stays exact).

    Shape (100 TB posture): the quartile fit is a 1-row aggregate
    broadcast back as three literals (the tpch_q22 scalar pattern;
    at whale scale the exact percentile swaps for the distinct-value-
    counting shape of agg_percentile or approx_percentile's mergeable
    sketch); the bucketing pass is then pure codegen CASE over one
    scan with a 4-key map-side-combined agg."""
    li = t(spark, sf, "lineitem").select("l_quantity")
    b1, b2, b3 = li.agg(
        F.expr("percentile(l_quantity, 0.25)"),
        F.expr("percentile(l_quantity, 0.50)"),
        F.expr("percentile(l_quantity, 0.75)"),
    ).first()  # 1-row scalar fit
    q_ = F.col("l_quantity")
    bucket = (
        F.when(q_ <= b1, 0).when(q_ <= b2, 1).when(q_ <= b3, 2).otherwise(3)
    )
    return (
        li.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.min("l_quantity"), 2).alias("lo"),
            F.round(F.max("l_quantity"), 2).alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# round 5 additions: interval-overlap join, weighted median, cume_dist
# ---------------------------------------------------------------------------


@q(
    "join_interval_overlap",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_orderdate AS os,
             o_orderdate + INTERVAL 30 DAY AS oe
      FROM orders
      WHERE o_orderpriority = '1-URGENT'
        AND o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate <  TIMESTAMP '1995-04-01'
    ), l AS (
      SELECT l_shipdate AS ls, l_shipdate + INTERVAL 7 DAY AS le
      FROM lineitem WHERE l_returnflag = 'R'
    )
    SELECT o_orderkey, CAST(COUNT(*) AS BIGINT) AS n_overlap
    FROM o JOIN l ON ls <= oe AND os <= le
    GROUP BY o_orderkey
    """,
)
def join_interval_overlap(spark, sf):
    """Interval-overlap join (temporal/genomic classic): count, per
    Q1-1995 urgent order's 30-day fulfilment window, the returned-line
    7-day ship windows that overlap it (the quarter strip keeps the
    genuine overlap volume at a benchmarkable ~3.4M pairs at sf0.1 —
    unstripped, the dense TPC-H date range yields 91M true overlaps,
    cost that is pair volume, not plan shape).  A naive engine
    evaluates this as a
    theta join (cartesian + range predicate); the distributed shape
    here is the BUCKETED interval join: each interval explodes into
    the epoch-week buckets it covers (bounded fanout: at most
    floor(len/7) + 2 = 6 buckets for the 30-day order side — a 30-day
    window spans 6 epoch weeks whenever it starts late enough in one —
    and ≤ 2 for the 7-day line side), the join becomes an EQUI-join on
    the bucket
    key, and each genuinely overlapping pair is counted EXACTLY ONCE
    without a distinct by keeping only the bucket that contains the
    overlap's start (max of the two interval starts) — the standard
    dedup-free allocation trick, so no post-join shuffle.

    100 TB shape: narrow exploded sides (key + 2 epoch-day ints), one
    hash-partitioned equi-join on uniformly distributed week buckets,
    overlap + allocation predicates run in codegen post-probe, and the
    per-order count is a map-side-combinable agg on the join's own
    partitioning.  Week granularity trades fanout against per-bucket
    pair volume; at whale scale it is chosen from the interval-length
    histogram (TESTDATA intervals are 7/30 days, so weeks)."""
    W7 = 7 * 86400
    o = (
        t(spark, sf, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= "1995-01-01")
            & (F.col("o_orderdate") < "1995-04-01"))
        .select(
            "o_orderkey",
            F.unix_timestamp("o_orderdate").alias("os"),
            (F.unix_timestamp("o_orderdate") + 30 * 86400).alias("oe"),
        )
    )
    li = (
        t(spark, sf, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(
            F.unix_timestamp("l_shipdate").alias("ls"),
            (F.unix_timestamp("l_shipdate") + 7 * 86400).alias("le"),
        )
    )
    ob = o.withColumn(
        "b", F.explode(F.sequence(F.floor(F.col("os") / W7),
                                  F.floor(F.col("oe") / W7))))
    lb = li.withColumn(
        "b", F.explode(F.sequence(F.floor(F.col("ls") / W7),
                                  F.floor(F.col("le") / W7))))
    pairs = ob.join(
        lb,
        (ob.b == lb.b)
        & (F.col("ls") <= F.col("oe"))
        & (F.col("os") <= F.col("le"))
        # allocate each overlapping pair to exactly one bucket: the one
        # holding the later of the two starts (the overlap's start)
        & (ob.b == F.floor(F.greatest(F.col("os"), F.col("ls")) / W7)),
    )
    return pairs.groupBy("o_orderkey").agg(
        F.count("*").alias("n_overlap"))


@q(
    "agg_weighted_median",
    oracle="""
    WITH c AS (
      SELECT l_returnflag AS rf, l_extendedprice AS price,
             SUM(CAST(ROUND(l_quantity * 100) AS BIGINT))
               OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
                     ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(CAST(ROUND(l_quantity * 100) AS BIGINT))
               OVER (PARTITION BY l_returnflag) AS tot
      FROM lineitem
    )
    SELECT rf, MIN(price) AS wmedian
    FROM c WHERE 2 * cum >= tot GROUP BY rf
    """,
)
def agg_weighted_median(spark, sf):
    """Weighted median: smallest price p per return flag such that the
    lines priced ≤ p carry at least half the total shipped QUANTITY —
    the token-weighted quantile every curation pipeline needs (median
    quality weighted by document length, not by document count).

    Cross-engine determinism: weights sum in exact int64 centi-units
    (the _sum_fixed convention) so the half-total threshold has no
    float accumulation-order hazard, and although per-row cumulative
    sums among TIED prices depend on engine-internal order, the chosen
    value is MIN(price) over threshold-crossing rows — ties share one
    price and a tie group's cumulative END is order-independent, so
    the reported median is too.

    100 TB shape: one shuffle on the group key, an in-partition sort
    for the running sum, and a map-side-combinable MIN — no self-join,
    no collect.  A skewed/whale group swaps the exact sort for
    approx_percentile's mergeable sketch or the two-pass histogram
    shape of agg_histogram_equidepth."""
    li = t(spark, sf, "lineitem").select(
        F.col("l_returnflag").alias("rf"),
        F.col("l_extendedprice").alias("price"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("wq"),
    )
    part = W.partitionBy("rf")
    cum = F.sum("wq").over(
        part.orderBy("price").rowsBetween(W.unboundedPreceding, W.currentRow))
    tot = F.sum("wq").over(part)
    c = li.select("rf", "price", cum.alias("cum"), tot.alias("tot"))
    return (
        c.filter(F.lit(2) * F.col("cum") >= F.col("tot"))
        .groupBy("rf")
        .agg(F.min("price").alias("wmedian"))
    )


@q(
    "window_cume_dist",
    oracle="""
    SELECT c_custkey, c_nationkey,
           CUME_DIST() OVER (PARTITION BY c_nationkey
                             ORDER BY c_acctbal) AS cd,
           CAST(COUNT(*) OVER (PARTITION BY c_nationkey) AS BIGINT) AS n_nation
    FROM customer
    """,
)
def window_cume_dist(spark, sf):
    """CUME_DIST per nation over account balance (peer-group-based, so
    deterministic under ties, unlike row_number/nth_value) plus the
    partition size — completes the analytic-window family alongside
    rank / percent_rank / ntile / range frames.  cume_dist's division
    is two small exact int64s → one IEEE divide, bit-identical across
    engines.

    100 TB shape: one shuffle on the partition key + in-partition
    sort; no joins, no driver state."""
    c = t(spark, sf, "customer")
    part = W.partitionBy("c_nationkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.cume_dist().over(part.orderBy("c_acctbal")).alias("cd"),
        F.count("*").over(part).alias("n_nation"),
    )


@q(
    "events_gap_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), r AS (
      SELECT user_id, d,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS rn
      FROM days
    )
    SELECT user_id,
           STRFTIME(MIN(d), '%Y-%m-%d') AS run_start,
           STRFTIME(MAX(d), '%Y-%m-%d') AS run_end,
           CAST(COUNT(*) AS BIGINT) AS n_days
    FROM r GROUP BY user_id, d - CAST(rn AS INTEGER)
    """,
)
def events_gap_islands(spark, sf):
    """Gaps-and-islands: collapse each user's DISTINCT ACTIVE DAYS into
    maximal consecutive-day runs (streak detection / continuous-usage
    spans) with the classic row_number-difference trick — a day minus
    its per-user rank is constant exactly within a consecutive run, so
    one GROUP BY on that anchor yields every island with no self-join
    and no iterative pass.  Calendar-day granularity distinguishes this
    from events_sessionize (raw-timestamp 30-minute gap sessions).

    100 TB shape: the distinct, the rank window, and the island agg all
    hash on user_id — one key family end to end, no joins; the heaviest
    stage is the initial per-user-day distinct, which is map-side
    combinable."""
    e = t(spark, sf, "events")
    days = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    rn = F.row_number().over(W.partitionBy("user_id").orderBy("d"))
    r = days.select("user_id", "d", F.date_sub(F.col("d"), rn).alias("grp"))
    return (
        r.groupBy("user_id", "grp")
        .agg(
            F.date_format(F.min("d"), "yyyy-MM-dd").alias("run_start"),
            F.date_format(F.max("d"), "yyyy-MM-dd").alias("run_end"),
            F.count("*").alias("n_days"),
        )
        .select("user_id", "run_start", "run_end", "n_days")
    )
