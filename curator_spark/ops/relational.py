"""Relational operators from SURVEY.md §2 over the testdata tables.

Numeric determinism notes (the driver hash-compares values vs DuckDB):
- double sums are order-dependent across engines/parallelism; every SUM/AVG
  here goes through DECIMAL (exact, associative) and is cast back to double
  at the end, so Spark (any partitioning) and DuckDB agree bit-exactly.
- every computed column is aliased identically in the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load

DEC = "decimal(28,6)"


def _dsum(col):
    return F.sum(F.col(col).cast(DEC))


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style rollup — the token/cost aggregate analog (SURVEY §2.5 A1:
    online_status_tracker.py:175-198 sums tokens/cost across rows)."""
    li = load(spark, sf_dir, "lineitem")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    charge = (F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).cast(DEC)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").cast("double").alias("sum_qty"),
            _dsum("l_extendedprice").cast("double").alias("sum_base_price"),
            F.sum(disc).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build+probe rejoin-by-id analog (SURVEY §2.4 J1:
    base_batch_request_processor.py:461-477) — dims broadcast."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


def resume_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completed-work anti-join (SURVEY §2.3 F1: skip rows whose id is in the
    completed set, base_request_processor.py:496-539). The 'checkpoint' set
    here is the deterministic o_orderkey%7==0 slice; broadcast anti-join."""
    orders = load(spark, sf_dir, "orders")
    done = orders.filter(F.col("o_orderkey") % 7 == 0).select("o_orderkey")
    return (
        orders.join(F.broadcast(done), "o_orderkey", "left_anti")
        .select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey")
    )


def status_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Success/failure counters (SURVEY §2.5 A2: tracker counts by status)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .orderBy("event_type")
    )


def finish_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invalid-finish-reason filter (SURVEY §2.3 F3: drop rows whose
    finish_reason isin invalid set, base_online_request_processor.py:484-490)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.filter(~F.col("event_type").isin("error", "signup") & F.col("value").isNotNull())
        .select("event_id", "event_type", "value")
        .orderBy("event_id")
    )


def union_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union + dedup (SURVEY §2.6 O3 concatenate_datasets + O5 dropDuplicates)."""
    orders = load(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_totalprice") > 100000).select("o_orderkey", "o_orderstatus")
    b = orders.filter(F.col("o_orderstatus") == "O").select("o_orderkey", "o_orderstatus")
    return a.unionByName(b).dropDuplicates(["o_orderkey"]).orderBy("o_orderkey")


def topk_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Limit/take (SURVEY §2.6 O2)."""
    ev = load(spark, sf_dir, "events")
    return ev.select("event_id", "value").orderBy(F.desc("value"), "event_id").limit(20)


def running_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-restoring / running aggregate (SURVEY §2.6 O1 + §2.5 A3 moving
    average): per-user running sum, tie-broken on event_id for determinism."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn(
            "running_value",
            F.sum(F.col("value").cast(DEC)).over(w.rowsBetween(W.unboundedPreceding, 0)).cast("double"),
        )
        .select("user_id", "event_id", "running_value")
        .orderBy("user_id", "event_id")
    )


def error_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-N error sample (SURVEY §2.5 A5: first 10 error strings)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "error")
        .select("event_id", "user_id", "props")
        .orderBy("event_id")
        .limit(10)
    )


def count_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Request/response count reconciliation (SURVEY §2.5 A6:
    responses==requests per file): lineitem count per order vs order rows."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(F.count("*").alias("n_items"))
    return (
        orders.join(per_order, orders.o_orderkey == per_order.l_orderkey, "left")
        .select(
            "o_orderkey", F.coalesce(F.col("n_items"), F.lit(0)).alias("n_items")
        )
        .orderBy("o_orderkey")
    )


def chunk_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-balanced chunking audit (SURVEY §2.6 O4: split into bounded
    batches): hash-bucket rows md5-style and report per-bucket row counts —
    the balance check behind salted repartitioning. Portable bucket id =
    first 2 hex chars of md5(key)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.withColumn("bucket", F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window rollup (streaming T4's batch shape; watermarked
    streaming variant in curator_spark/streaming.py)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .orderBy("hour", "event_type")
    )


def events_spike_detection(
    spark: SparkSession, sf_dir: str, window_hours: int = 24, z_thresh: float = 3.0
) -> DataFrame:
    """Trailing-window anomaly flag over hourly event volume — the
    monitoring face of the rollup family: each hour's count is z-scored
    against the preceding ``window_hours`` observed hours, and hours
    with ``z >= 3`` flag as spikes.

    Engine-parity by construction, not by rounding luck: the window
    aggregates are INTEGER sums (``Σn``, ``Σn²`` — exact in float64 far
    beyond this scale), and mean/variance derive from them with the
    identical expression tree on both engines
    (``(s2 − s1·s1/w)/(w−1)``), so the doubles are bit-equal before the
    defensive round(6). Early hours (short window) and zero-variance
    windows have NULL z. ONE hash shuffle (the hourly groupBy); the
    window sort rides the orderBy output exchange.

    Scale note: the un-partitioned window runs over the HOURLY ROLLUP,
    not raw events — its input is one row per hour (a decade is <90k
    rows), already reduced by the map-side-combinable groupBy, so the
    single-task window is bounded by calendar time, not data volume
    (contrast ``duration_batches``, whose per-clip input forces the
    distributed prefix sum).

    Reference analog: throughput/error trend surfaces (SURVEY §2.5 A4)."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    _require_utc(
        spark, "events_spike_detection",
        "hour bucketing is only oracle-stable under UTC",
    )
    # a timeless event cannot be hour-bucketed: dropping it beats letting
    # a NULL-hour group ride the trailing window (Spark orders NULLS
    # FIRST, DuckDB LAST — every window near the boundary would shift)
    hourly = (
        ev.filter(F.col("ts").isNotNull())
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count("*").alias("n"))
    )
    w = W.orderBy("hour").rowsBetween(-window_hours, -1)
    s1 = F.sum("n").over(w).cast("double")
    s2 = F.sum(F.col("n") * F.col("n")).over(w).cast("double")
    cnt = F.count("n").over(w).cast("double")
    mean = s1 / cnt
    var = (s2 - s1 * s1 / cnt) / (cnt - F.lit(1.0))
    z = (F.col("n").cast("double") - mean) / F.sqrt(var)
    full = (cnt == F.lit(float(window_hours))) & (var > F.lit(0.0))
    # spike is TOTAL (false when the window is undefined) — a NULL boolean
    # round-trips differently through pandas on the two engines (None vs
    # NaN), and "not flagged" is the right monitoring semantic anyway
    out = (
        hourly.withColumn("zr", F.when(full, F.round(z, 6)))
        .select(
            "hour",
            "n",
            F.col("zr").alias("z"),
            (F.col("zr").isNotNull() & (F.col("zr") >= F.lit(z_thresh))).alias("spike"),
        )
        .orderBy("hour")
    )
    return out


def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar functions (SURVEY §2.7: from_json/get_json_object ≙ the
    reference's json.loads response parsing)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("k").cast("long")).alias("sum_k"),
        )
        .orderBy("event_type")
    )


def fanout_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse fan-out (SURVEY §2.2 M4: one row → N rows via the parse
    function, base_request_processor.py:346-359) — posexplode of the word
    list; pure Catalyst Generate node, no Python."""
    docs = load(spark, sf_dir, "documents")
    words = F.filter(F.split(F.col("text"), " ", -1), lambda w: w != F.lit(""))
    return (
        docs.select("doc_id", F.posexplode(words).alias("pos", "token"))
        .orderBy("doc_id", "pos")
    )


def json_validate_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-output validation (SURVEY §2.2 M5: JSON-parse + schema
    validate, drop rows that fail — prompt_formatter.py:124-169):
    ``from_json`` with an explicit schema, strict null filter."""
    ev = load(spark, sf_dir, "events")
    parsed = ev.withColumn("j", F.from_json("props", "k int"))
    return (
        parsed.filter(F.col("j").isNotNull() & F.col("j.k").isNotNull())
        .select("event_id", F.col("j.k").alias("k"))
        .orderBy("event_id")
    )


def dim_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build+probe rejoin with broadcast dims (SURVEY §2.4 J1: the batch
    response↔request hash join, base_batch_request_processor.py:461-477).
    Two chained broadcast joins — .explain shows BroadcastHashJoin, no
    shuffle of the fact side."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("sum_acctbal"),
        )
        .orderBy("region", "nation")
    )


def moving_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded moving average (SURVEY §2.5 A3: deque(50) moving average of
    completion tokens, base_online_request_processor.py:34,89): 50-row
    trailing window per user, decimal-exact then rounded for cross-engine
    hash equality."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-49, 0)
    mavg = (
        F.sum(F.col("value").cast(DEC)).over(w) / F.count("value").over(w)
    ).cast("double")
    return (
        ev.withColumn("moving_avg", F.round(mavg, 6))
        .select("user_id", "event_id", "moving_avg")
        .orderBy("user_id", "event_id")
    )


def events_sessionize(spark: SparkSession, sf_dir: str, gap_min: int = 30) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when a user's
    inter-event gap exceeds ``gap_min`` minutes (the standard public
    construction: lag → boundary flag → running sum). Per-session rollup.
    One shuffle on user_id; the window sort rides the same partitioning."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    by_user = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(by_user)
    # fractional-second gap (timestamp → double epoch): unix_timestamp()
    # TRUNCATES to whole seconds while the DuckDB oracle's epoch() keeps
    # microseconds — a 1800.5s gap would disagree at the boundary. The
    # parquet column is TIMESTAMP_NTZ, which cannot cast to double
    # directly; the NTZ→TIMESTAMP cast interprets the wall-clock in the
    # SESSION timezone, so the op requires it pinned to UTC (build_session
    # does; a foreign session with a DST-observing zone would shift two
    # timestamps straddling a transition by different offsets, changing
    # gaps by ±3600s and silently diverging from the oracle's epoch()).
    _require_utc(
        spark, "events_sessionize",
        "the TIMESTAMP_NTZ→epoch conversion is only DST-safe under a "
        "fixed-offset zone",
    )

    def _epoch(c):
        return c.cast("timestamp").cast("double")

    new_sess = (
        prev_ts.isNull() | (_epoch(F.col("ts")) - _epoch(prev_ts) > gap_min * 60)
    ).cast("int")
    sess = ev.select(
        "user_id", "ts", "event_id", "value",
        F.sum(new_sess).over(by_user).alias("session_no"),
    )
    return (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .orderBy("user_id", "session_no")
    )


def distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active-user rollup: COUNT(DISTINCT user_id) + event count per
    day — the audit-cardinality shape (how many distinct requesters hit
    the engine per window). Two-phase partial aggregation: the distinct
    expands to a (day, user_id) pre-aggregate before the final count, so
    a hot day cannot funnel raw rows into one reducer."""
    ev = load(spark, sf_dir, "events")
    # same TIMESTAMP_NTZ hazard as events_sessionize: date_format renders
    # the wall-clock in the SESSION timezone while the oracle's strftime
    # renders the stored instant — a foreign non-UTC session would bucket
    # near-midnight events into different days. Guard, don't guess.
    _require_utc(spark, "distinct_users_daily")
    # day as a STRING: Spark DateType and DuckDB DATE render to different
    # pandas dtypes in the driver's hash compare; a formatted string is
    # dtype-stable across both engines
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
        .orderBy("day")
    )


def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles of value per event_type —
    corpus-statistics shape (duration/length distributions drive the
    quality-rule thresholds). Spark `percentile` and DuckDB
    `quantile_cont` share the interpolation, so the oracle is exact."""
    ev = load(spark, sf_dir, "events")
    pct = F.percentile(F.col("value"), F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return (
        ev.groupBy("event_type")
        .agg(pct.alias("p"))
        .select(
            "event_type",
            F.round(F.col("p")[0], 6).alias("p50"),
            F.round(F.col("p")[1], 6).alias("p90"),
            F.round(F.col("p")[2], 6).alias("p99"),
        )
        .orderBy("event_type")
    )


def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP rollup (event_type → grand total) with grouping ids — the
    multi-granularity audit summary shape. Map-side partial aggregation
    handles all grouping sets in one shuffle."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.rollup("event_type")
        .agg(
            F.grouping("event_type").cast("int").alias("is_total"),  # must be IN the agg
            F.count("*").alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("<all>")).alias("event_type"),
            "is_total",
            "n",
            "sum_value",
        )
        .orderBy("is_total", "event_type")
    )


def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — the classic operator Spark's DataFrame API lacks
    natively: each ``click`` event picks up the MOST RECENT ``purchase``
    (``purchase.ts <= click.ts``) by the same user, NULL if none yet.

    Spark-first construction (no range join, no per-row Python): tag the
    two sides, union, and run ONE window pass partitioned by ``user_id``
    ordered by ``(ts, is_right DESC)`` — a right row at the exact left
    timestamp sorts first, giving inclusive (<=) semantics — with
    ``last(struct(ts, value), ignorenulls)`` carrying the latest purchase
    ROW forward (one struct, so a NULL-valued newest purchase yields NULL
    value + its own timestamp, never a mix of two purchases).
    ONE shuffle total; at 10^12 rows this is the textbook plan (both
    sides co-partition on the same key; a sort-merge range join or a
    per-left-row subquery would be quadratic in the hot keys). Hot-user
    skew rides the same AQE/salting story as events_sessionize.

    The right side is pre-aggregated to one row per (user_id, ts) with
    ``MAX(value)`` so equal-timestamp purchase ties are deterministic on
    both engines (DuckDB's ASOF JOIN leaves duplicate right keys
    unspecified). The lag is an exact integer microsecond difference —
    same TIMESTAMP_NTZ→UTC-epoch guard as events_sessionize.

    Oracle: DuckDB's NATIVE ``ASOF LEFT JOIN`` — an independent
    implementation of the same semantics, not a replay of this plan.

    Reference analog: rejoin-by-id / build+probe (SURVEY.md §2.4 J1) in
    its time-ordered form."""
    from pyspark.sql import Window as W

    _require_utc(
        spark, "events_asof_join",
        "the TIMESTAMP_NTZ→epoch-micros conversion is only DST-safe under "
        "a fixed-offset zone",
    )
    ev = load(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    right = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pval"))
    )
    tagged = left.select(
        "user_id",
        "ts",
        F.lit(0).alias("is_right"),
        "event_id",
        "value",
        F.lit(None).cast("double").alias("pval"),
    ).unionByName(
        right.select(
            "user_id",
            "ts",
            F.lit(1).alias("is_right"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("double").alias("value"),
            "pval",
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", F.desc("is_right"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # Carry (ts, pval) as ONE struct so both fields come from the SAME
    # matched purchase row: last(pval, ignorenulls) alone would skip a
    # newest purchase whose value is NULL and pair an older value with the
    # newer timestamp — DuckDB's ASOF JOIN returns the matched row's NULL.
    prow = F.when(F.col("is_right") == 1, F.struct("ts", "pval"))
    micros = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.col("last_purchase_ts").cast("timestamp")
    )
    return (
        tagged.withColumn("lp", F.last(prow, ignorenulls=True).over(w))
        .withColumn("last_purchase_value", F.col("lp")["pval"])
        .withColumn("last_purchase_ts", F.col("lp")["ts"])
        .filter(F.col("is_right") == 0)
        .select(
            "event_id",
            "user_id",
            "ts",
            "value",
            "last_purchase_value",
            micros.alias("asof_lag_us"),
        )
        .orderBy("event_id")
    )


def events_range_join(spark: SparkSession, sf_dir: str, window_s: int = 300) -> DataFrame:
    """Range join — the other time-join Spark has no native operator for:
    for each ``error`` event, count the same user's ``click`` events in
    the trailing ``window_s`` seconds (``err_ts - W < click_ts <=
    err_ts``, exact integer microseconds).

    Spark-first construction (never a cross product): the classic
    interval-bin expansion — the probe side explodes to its two
    candidate W-sized time buckets, the join is EQUI on ``(user_id,
    bucket)`` (hash-partitionable, AQE-skew-splittable), and the exact
    inequality is a post-join filter folded into a conditional count.
    A click's bucket matches exactly one of the two probe rows, so
    nothing double-counts. At 10^12 rows this stays two well-keyed
    shuffles (join + per-event rollup); the naive inequality join is a
    BroadcastNestedLoop/cartesian — the plan test forbids it.

    Oracle: DuckDB runs the naive inequality LEFT JOIN directly — an
    independent implementation, not a replay.

    Reference analog: rejoin-by-id (SURVEY.md §2.4 J1) in its
    time-window form; same UTC guard as events_sessionize."""
    _require_utc(
        spark, "events_range_join",
        "the TIMESTAMP_NTZ→epoch-micros conversion is only DST-safe under "
        "a fixed-offset zone",
    )
    ev = load(spark, sf_dir, "events")
    w_us = window_s * 1_000_000
    eus = F.unix_micros(F.col("ts").cast("timestamp"))
    err = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts", eus.alias("eus")
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        "user_id", eus.alias("cus")
    ).select("user_id", "cus", F.expr(f"cus div {w_us}").alias("bucket"))
    probes = err.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.expr(f"eus div {w_us}") - F.lit(1).cast("long"),
                F.expr(f"eus div {w_us}"),
            )
        ),
    )
    hit = (F.col("cus") > F.col("eus") - F.lit(w_us)) & (F.col("cus") <= F.col("eus"))
    return (
        probes.join(clk, ["user_id", "bucket"], "left")
        .groupBy("event_id", "user_id", "ts")
        .agg(F.count(F.when(hit, F.lit(1))).alias("n_recent_clicks"))
        .orderBy("event_id")
    )


def approx_distinct_kmv(spark: SparkSession, sf_dir: str, k: int = 16) -> DataFrame:
    """Distinct-count SKETCH with a built-in accuracy audit: the K-minimum-
    values estimator (Bar-Yossef et al., the mergeable sketch behind
    approx_count_distinct) computed DETERMINISTICALLY — hash = first 15
    hex chars of md5 (60 bits, the repo's portable-hash idiom), so unlike
    HLL the estimate is bit-reproducible on both engines and the oracle
    hash-compares it like any exact query. Emits per event_type the exact
    distinct user count, the KMV estimate ``(k-1)/u_(k)``, and the
    relative error — the audit row a pipeline publishes when it swaps an
    exact COUNT(DISTINCT) for a sketch at 10^12 rows.

    Scale shape: the distinct pre-shuffle is the same one exact
    COUNT(DISTINCT) pays; the min-k selection then runs in TWO window
    stages — per (event_type, h%64) salt first (64 bounded partitions per
    type, never one task per hot type), then over the ≤64·k survivors —
    so no single task ever sees a whole type's users. Groups with fewer
    than k distinct users fall back to the exact count.

    Reference analog: success/failure counters + count reconciliation
    (SURVEY.md §2.5 A2/A6) in their estimated, scale form."""
    from pyspark.sql import Window as W

    two60 = float(1 << 60)
    ev = load(spark, sf_dir, "events")
    d = ev.select("event_type", "user_id").distinct()
    h = F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10).cast("long")
    d2 = d.withColumn("h", h)
    w_salt = W.partitionBy("event_type", F.pmod(F.col("h"), F.lit(64))).orderBy("h")
    w_type = W.partitionBy("event_type").orderBy("h")
    sketch = (
        d2.withColumn("rn", F.row_number().over(w_salt))
        .filter(F.col("rn") <= k)
        .withColumn("rn2", F.row_number().over(w_type))
        .filter(F.col("rn2") <= k)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_in"), F.max("h").alias("kth"))
    )
    exact = d.groupBy("event_type").agg(F.count("*").alias("n_exact"))
    est_raw = F.when(
        F.col("n_in") < k, F.col("n_exact").cast("double")
    ).otherwise(F.lit(float(k - 1)) / (F.col("kth") / F.lit(two60)))
    return (
        exact.join(sketch, "event_type")
        .select(
            "event_type",
            "n_exact",
            F.round(est_raw, 6).alias("est_kmv"),
            F.round((est_raw - F.col("n_exact")) / F.col("n_exact"), 6).alias("rel_error"),
        )
        .orderBy("event_type")
    )


def events_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) window rollup — 1-hour windows every 15 minutes,
    the overlapping-window shape streaming dashboards consume (each event
    lands in size/hop = 4 windows). Spark-first: the NATIVE
    ``F.window(ts, '1 hour', '15 minutes')`` — Catalyst plans the 4-way
    replication itself and the aggregation stays map-side combinable; the
    oracle expands the bins manually (``floor(μs/hop)·hop − i·hop``) as
    an independent implementation. Epoch-aligned windows on the NTZ
    wall-clock, so both engines bucket identically with no timezone
    exposure; sums go through DECIMAL per the module convention.

    Reference analog: throughput stats over sliding operating windows
    (SURVEY.md §2.5 A4); the tumbling twin is events_hourly."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


def _require_utc(
    spark: SparkSession,
    op: str,
    detail: str = "day bucketing is only oracle-stable under UTC",
) -> None:
    # same TIMESTAMP_NTZ hazard everywhere: rendering/epoch-converting the
    # stored wall-clock only matches the oracle under a fixed-offset
    # session zone. ONE whitelist for every time-bucketing operator —
    # guard, don't guess.
    tz = spark.conf.get("spark.sql.session.timeZone")
    if tz not in ("UTC", "Etc/UTC", "GMT", "Z", "+00:00"):
        raise ValueError(
            f"{op} requires spark.sql.session.timeZone=UTC (got {tz!r}): {detail}"
        )


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel conversion per signup cohort: for every user, the
    first ``signup``, then the first ``click`` AT-OR-AFTER it, then the
    first ``purchase`` at-or-after that click — the sequential-conversion
    query event warehouses run constantly and plain SQL needs three
    self-join passes for. Spark-first single pass: ONE shuffle to
    ``collect_list`` per user, then the whole stage chain is array HOFs
    (array_sort → filter-with-outer-reference → element_at), all inside
    whole-stage codegen — no Python, no re-scan per stage. Per-user event
    counts are bounded (a user's history fits an executor row), so the
    collected array is safe at 10^12 total rows. The oracle is an
    INDEPENDENT implementation: three chained min()-join passes in DuckDB.

    Reference analog: SURVEY.md §2.5 A2's staged success counters, in
    their sequential (conversion) form."""
    ev = load(spark, sf_dir, "events")
    _require_utc(spark, "events_funnel")
    per_user = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("ts", "event_type"))).alias("evs")
    )

    def first_at_or_after(typ: str, lower):
        # try_element_at, not element_at: under Spark 4's default ANSI mode
        # element_at(empty, 1) THROWS, and "no later event of this type" is
        # the normal drop-off case a funnel exists to count — it must yield
        # NULL, not kill the job.
        hit = F.filter(
            F.col("evs"),
            lambda x: (x["event_type"] == F.lit(typ)) & (x["ts"] >= lower),
        )
        return F.try_element_at(hit, F.lit(1))["ts"]

    staged = (
        per_user.withColumn(
            "t1",
            F.try_element_at(
                F.filter(F.col("evs"), lambda x: x["event_type"] == F.lit("signup")),
                F.lit(1),
            )["ts"],
        )
        .withColumn("t2", first_at_or_after("click", F.col("t1")))
        .withColumn("t3", first_at_or_after("purchase", F.col("t2")))
        .filter(F.col("t1").isNotNull())
    )
    n_signup = F.count("*").alias("n_signup")
    return (
        staged.groupBy(F.date_format("t1", "yyyy-MM-dd").alias("cohort_day"))
        .agg(
            n_signup,
            F.count("t2").alias("n_click"),
            F.count("t3").alias("n_purchase"),
        )
        .select(
            "cohort_day",
            "n_signup",
            "n_click",
            "n_purchase",
            F.round(F.col("n_click") / F.col("n_signup"), 6).alias("click_rate"),
            F.round(F.col("n_purchase") / F.col("n_signup"), 6).alias("purchase_rate"),
        )
        .orderBy("cohort_day")
    )


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users are cohorted by their first active
    day; each later active day lands in (cohort_day, offset_days) with the
    retained-user count and the rate vs the cohort's day-0 size. Scale
    shape — ONE scan, one data-sized shuffle: per-user day sets via
    ``collect_set`` (map-side combinable, bounded by calendar days per
    user), cohort = array_min of the same set (no second aggregate, no
    activity⋈cohort join), explode to offsets, then the rollup; the
    day-0 size comes from a window OVER THE ROLLUP (O(days²) rows, not
    data-sized) instead of a self-join, so the rollup is computed once.
    The naive distinct→join→self-join form costs 4 scans / 10 exchanges;
    this is 1 scan / 4 (see PLANS.md).

    Reference analog: SURVEY.md §2.5 A4 throughput stats over lifetime
    windows (the per-cohort survival view of the same counters)."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    _require_utc(spark, "retention_cohorts")
    # an anonymous (NULL user_id) event cannot be cohorted: groupBy would
    # happily make NULL a cohort here while the oracle's equi-join drops
    # it — and a "NULL-user cohort" is semantically meaningless anyway.
    # collect_set already ignores NULL days (timeless events).
    per_user = (
        ev.filter(F.col("user_id").isNotNull())
        .select("user_id", F.to_date("ts").alias("d"))
        .groupBy("user_id")
        .agg(F.collect_set("d").alias("days"))
    )
    exploded = per_user.select(
        F.array_min("days").alias("cohort_d"), F.explode("days").alias("d")
    )
    ret = exploded.groupBy(
        "cohort_d", F.datediff("d", F.col("cohort_d")).alias("offset_days")
    ).agg(F.count("*").alias("n_active"))
    day0 = F.max(F.when(F.col("offset_days") == 0, F.col("n_active"))).over(
        W.partitionBy("cohort_d")
    )
    return (
        ret.withColumn("cohort_size", day0)
        .select(
            F.date_format("cohort_d", "yyyy-MM-dd").alias("cohort_day"),
            "offset_days",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
        )
        .orderBy("cohort_day", "offset_days")
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def daily_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide) rollup: daily event counts with one column per
    event type — the native ``groupBy().pivot()`` operator with the value
    list pinned EXPLICITLY, which (a) makes the output schema
    deterministic and (b) skips the extra distinct-values collect job
    Spark otherwise runs before planning a pivot. Catalyst compiles the
    pinned pivot to a single pass of conditional aggregates (exactly the
    FILTER-clause form the oracle writes), map-side combinable, one
    shuffle on day.

    Reference analog: SURVEY.md §2.5 A2 status counters, presented as the
    wide per-window matrix a tracker dashboard renders."""
    ev = load(spark, sf_dir, "events")
    _require_utc(spark, "daily_type_pivot")
    wide = (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "day",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in EVENT_TYPES],
    ).orderBy("day")


def heavy_hitters_sample(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Heavy-hitters frequency SKETCH with a built-in accuracy audit: a
    deterministic 1-in-4 row sample (first 15 md5 hex chars of event_id
    < 2^58 — the repo's portable-hash idiom, so the sample is identical
    on both engines and bit-reproducible) estimates each top user's event
    count as 4× its sampled count. Like approx_distinct_kmv, the exact
    side exists to AUDIT the estimator: at 10^12 rows a pipeline publishes
    only the sampled counts (the sample predicate pushes to the scan and
    the aggregate touches 1/4 of the rows); this query is the periodic
    audit row that proves the estimator's error envelope on the true top-k.
    The audit computes exact and sampled counts as ONE conditional
    aggregate pass (one shuffle, no join), then a global top-k over the
    O(users) aggregate — not O(events) — with a deterministic tie-break.

    Reference analog: SURVEY.md §2.5 A1/A6 token counters + count
    reconciliation, in their estimated form."""
    ev = load(spark, sf_dir, "events")
    h = F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    agg = ev.groupBy("user_id").agg(
        F.count("*").alias("n_exact"),
        (F.count(F.when(h < F.lit(1 << 58), 1)) * 4).alias("n_est"),
    )
    return (
        agg.orderBy(F.desc("n_exact"), "user_id")
        .limit(k)
        .select(
            "user_id",
            "n_exact",
            "n_est",
            F.round(
                (F.col("n_est") - F.col("n_exact")) / F.col("n_exact"), 6
            ).alias("rel_error"),
        )
    )


def events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE rollup: (day × event_type) counts with BOTH marginal totals and
    the grand total in one pass — Spark's native ``cube()`` compiles to a
    single Expand + aggregate (each input row fans to the 4 grouping sets
    map-side, partials combine before the one shuffle), not four scans.
    GROUPING() flags disambiguate real NULLs from subtotal rows, same as
    events_rollup's ROLLUP twin.

    Reference analog: SURVEY.md §2.5 A2 status counters, in the
    every-marginal dashboard form."""
    ev = load(spark, sf_dir, "events")
    _require_utc(spark, "events_cube")
    pre = ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type", "value"
    )
    return (
        pre.cube("day", "event_type")
        .agg(
            F.grouping("day").cast("int").alias("is_day_total"),  # must be IN the agg
            F.grouping("event_type").cast("int").alias("is_type_total"),
            F.count("*").alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(
            F.coalesce(F.col("day"), F.lit("<all>")).alias("day"),
            F.coalesce(F.col("event_type"), F.lit("<all>")).alias("event_type"),
            "is_day_total",
            "is_type_total",
            "n",
            "sum_value",
        )
        .orderBy("day", "event_type", "is_day_total", "is_type_total")
    )
