"""Relational breadth queries over the TPC-H-ish star schema + events stream.

The reference has no SQL engine (SURVEY.md §2.7) — Spark's own relational
primitives cover that role. These queries demonstrate the engine's plumbing
at the plan level: broadcast joins for small dims, map-side partial
aggregation, window functions, sessionization via lag/cumsum.

Float discipline (shared with the DuckDB oracles): money sums run on exact
DECIMAL(18,4) and are cast to double only after rounding; ratios are
truncated with ``floor(x * 1e6) / 1e6`` — both operations produce identical
IEEE doubles in Spark and DuckDB, unlike engine-native double rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column, functions as F
from pyspark.sql.window import Window


def _dec(col: str) -> Column:
    return F.col(col).cast("decimal(18,4)")


def _money(expr: Column) -> Column:
    """Exact decimal sum → 2-decimal double (order-independent)."""
    return F.round(F.sum(expr), 2).cast("double")


def trunc6(expr: Column) -> Column:
    """floor(x·1e6)/1e6 — engine-portable truncation."""
    return F.floor(expr * F.lit(1000000.0)) / F.lit(1000000.0)


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-style pricing summary (groupBy with partial aggregation)."""
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _money(_dec("l_quantity")).alias("sum_qty"),
            _money(_dec("l_extendedprice")).alias("sum_base_price"),
            _money(disc_price).alias("sum_disc_price"),
            trunc6(
                F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def top_unshipped_orders(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """TPC-H Q3-style: revenue of unshipped orders.

    orders/customer are fact-scale tables — no broadcast hints; AQE picks
    broadcast at small SF and shuffle joins at cluster scale. Only true
    dimension tables (nation/region/part/supplier) ever get explicit hints.
    """
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
    return (
        lineitem.where(F.col("l_shipdate") > F.lit("1997-01-01"))
        .join(
            orders.where(F.col("o_orderdate") < F.lit("1997-01-01")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_money(disc_price).alias("revenue"))
        .where(F.col("revenue") > 1000)
    )


def part_revenue_rank(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Window ranking: top-3 revenue parts per brand."""
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
    joined = (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_partkey")
        .agg(_money(disc_price).alias("revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(
        F.col("revenue").desc(), F.col("p_partkey").asc()
    )
    return (
        joined.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("p_brand", "p_partkey", "revenue", F.col("rnk").cast("long").alias("rnk"))
    )


def events_daily(events: DataFrame) -> DataFrame:
    """Tumbling daily aggregation per event type."""
    return (
        events.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _money(_dec("value")).alias("sum_value"),
        )
    )


def _session_assign(events: DataFrame, gap_minutes: int) -> DataFrame:
    """events + (``ts_us``, ``session_no``) — the shared gap-split walk.

    Gaps compare as exact epoch *microseconds* (integer arithmetic — no
    float tolerance, no truncation semantics to match across engines);
    DuckDB's ``epoch_us()`` is the oracle twin. Micros derive from a pure
    NTZ subtraction (``timestampdiff`` against the NTZ epoch), so the
    session timezone never enters — no session-state side effects."""
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.expr(
        "timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', ts)"
    )
    with_gap = events.withColumn("ts_us", ts_us).withColumn(
        "new_session",
        F.when(
            (F.col("ts_us") - F.lag("ts_us").over(w_user))
            > gap_minutes * 60 * 1_000_000,
            1,
        )
        .otherwise(0)
        .cast("long"),
    )
    return with_gap.withColumn(
        "session_no",
        F.sum("new_session").over(
            w_user.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Session assignment: a gap > ``gap_minutes`` starts a new session;
    per-session stats via lag + cumulative-sum windows (see
    :func:`_session_assign` for the integer-microsecond gap contract)."""
    return _session_assign(events, gap_minutes).groupBy(
        "user_id", "session_no"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        _money(_dec("value")).alias("sum_value"),
    )


def bot_sessions(
    events: DataFrame,
    gap_minutes: int = 30,
    min_events: int = 5,
    max_mean_gap_ms: int = 2000,
) -> DataFrame:
    """Bot/automation detection over sessionized activity — the
    crawl-ops twin of the politeness monitor (that one watches OUR
    fetcher; this one finds machine traffic in the event log).

    Signals, all integer: session duration and mean inter-event gap
    (machine regularity: sustained sub-``max_mean_gap_ms`` pacing across
    ``min_events``+ events), plus the error share (scripted traffic
    trips disproportionate errors). ``is_bot`` = long-enough session AND
    machine pacing. Same shuffle family as sessionize: one user_id
    window pass + one (user_id, session_no) groupBy — co-partitioned,
    no extra exchange."""
    sess = _session_assign(events, gap_minutes)
    agg = sess.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        F.count(F.when(F.col("event_type") == "error", 1))
        .cast("long")
        .alias("n_errors"),
    )
    # derive the verdict FROM the reported columns (one definition of
    # the pacing formula — the flag can never drift from the metric)
    timed = agg.select(
        "user_id",
        F.col("session_no").cast("long").alias("session_no"),
        "n_events",
        F.expr("(end_us - start_us) DIV 1000").cast("long").alias(
            "duration_ms"
        ),
        "n_errors",
    ).withColumn(
        "mean_gap_ms",
        F.expr("duration_ms DIV greatest(n_events - 1, 1)").cast("long"),
    )
    return timed.select(
        "user_id",
        "session_no",
        "n_events",
        "duration_ms",
        "mean_gap_ms",
        "n_errors",
        F.expr("(1000 * n_errors) DIV n_events").cast("long").alias(
            "error_permille"
        ),
        F.expr(
            f"n_events >= {int(min_events)}"
            f" AND mean_gap_ms < {int(max_mean_gap_ms)}"
        ).alias("is_bot"),
    )


def revenue_by_nation(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """TPC-H Q5-style: local-supplier revenue per nation. Fact tables
    (orders/customer) join via shuffle; only supplier/nation/region — true
    dims whose size is bounded by real-world cardinality — are broadcast."""
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
    return (
        lineitem
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name", "r_name")
        .agg(_money(disc_price).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


def segment_order_stats(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Order statistics per market segment (two-level aggregation).

    Money stays exact DECIMAL through BOTH aggregation levels and is
    rounded/cast to double exactly once, in the final projection — the
    double→decimal round-trip between levels diverged from DuckDB on
    .xx5-boundary values (round-1 hash mismatch). customer is fact-scale:
    no broadcast hint."""
    per_customer = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment", "c_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).alias("total_spend"),
        )
    )
    return per_customer.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("n_orders").alias("n_orders"),
        F.round(F.sum("total_spend"), 2).cast("double").alias("segment_spend"),
    )


def funnel(
    events: DataFrame,
    steps: tuple = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: per user, the first time each step
    fires STRICTLY AFTER the previous step's first firing (the classic
    product-analytics funnel — same-timestamp events do not chain, a
    disclosed strictness choice), plus ``steps_completed``.

    Plan shape: every step is a conditional ``min() OVER (PARTITION BY
    user)`` on the SAME window key, then the per-user rollup groups on
    that key again — ONE exchange total (Catalyst reuses the hash
    partitioning across the window chain and the final aggregate). No
    joins, no per-step corpus passes; at 10^12 events the user id is the
    shuffle key and per-user state is O(len(steps))."""
    if not steps:
        raise ValueError("funnel: steps must be non-empty")
    w = Window.partitionBy(user_col)
    df = events.select(user_col, ts_col, type_col)
    cols = []
    for i, s in enumerate(steps):
        cond = F.col(type_col) == s
        if cols:
            cond = cond & (F.col(ts_col) > F.col(cols[-1]))
        name = f"first_{s}"
        df = df.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        cols.append(name)
    completed = F.lit(0)
    for name in cols:
        completed = F.when(F.col(name).isNull(), completed).otherwise(
            completed + 1
        )
    # steps chain: a NULL step makes every later step NULL by
    # construction (its condition references the NULL), so the CASE
    # walk above counts the longest prefix
    return (
        df.groupBy(user_col)
        .agg(*[F.max(c).alias(c) for c in cols])
        .select(
            user_col,
            *cols,
            completed.cast("long").alias("steps_completed"),
        )
    )


def events_error_rate(events: DataFrame) -> DataFrame:
    """Daily error-share per the events stream (ratio with portable
    truncation: multiply-first association matches the SQL oracle)."""
    daily = events.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n_errors"),
    )
    return daily.select(
        "day",
        "n_events",
        F.col("n_errors").cast("long").alias("n_errors"),
        (
            F.floor(F.lit(1000000.0) * F.col("n_errors") / F.col("n_events"))
            / F.lit(1000000.0)
        ).alias("error_rate"),
    )


def supplier_balance_rank(supplier: DataFrame, nation: DataFrame) -> DataFrame:
    """Top-2 suppliers by account balance per nation (window over a
    broadcast-joined dim)."""
    joined = supplier.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey").asc()
    )
    return (
        joined.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 2)
        .select(
            "n_name",
            "s_suppkey",
            F.round(F.col("s_acctbal").cast("decimal(18,4)"), 2).cast("double").alias("acctbal"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


def user_retention(events: DataFrame) -> DataFrame:
    """Day-over-day returning users (classic retention analytics).

    Per day: distinct active users, how many were also active the previous
    calendar day, and the retention ratio (floor-truncated to 1e-6 for
    engine-portable compare). Scale shape: one distinct on (day, user) —
    map-side partial agg — then an equi-join on (user, day-1); both sides
    shuffle on the same key family, no broadcast of a corpus-sized side."""
    days = events.select(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"), "user_id"
    ).distinct()
    prev = days.select(
        F.col("day").alias("prev_day"), F.col("user_id").alias("prev_user")
    )
    joined = days.join(
        prev,
        (F.col("user_id") == F.col("prev_user"))
        & (F.col("prev_day") == F.date_sub(F.col("day"), 1)),
        "left",
    )
    return joined.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.count("prev_user").alias("n_retained"),
        # multiply BEFORE dividing — same op order as the oracle's
        # floor(1e6 * a / b) (multiply-after-divide differs on .xx5-boundary
        # doubles; see the float-parity recipes in __spark_entry__)
        (F.floor(F.count("prev_user") * F.lit(1000000.0) / F.count(F.lit(1)))
         / F.lit(1000000.0)).alias("retention_rate"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts: str = "ts",
    right_cols: tuple[str, ...] = ("event_id",),
    suffix: str = "_asof",
) -> DataFrame:
    """AS-OF join: every ``left`` row picks the most recent ``right`` row
    at-or-before its timestamp within the same key (time-series point
    lookup — kdb+ ``aj``, DuckDB/QuestDB ``ASOF JOIN``).

    Spark has no native ASOF operator; the naive rewrites either explode
    (range-condition theta join → O(|L|·|R|) per key) or collapse to a
    per-key driver loop. The scalable declarative form used here is the
    merge-sorted union + keyed last-non-null carry-forward: both inputs
    union into one relation, a single window partitioned by key and
    ordered by (ts, side, payload) carries the latest right payload
    forward, and left rows read their match off the carry — ONE shuffle
    on the key, linear work, AQE-skew-splittable like any window. The
    DuckDB oracle runs its *native* ``ASOF LEFT JOIN``, so the rewrite is
    validated against the real operator semantics, not a mirror of
    itself.

    Semantics: ties at equal timestamps match (``>=``); right rows
    should be unique per ``(on, ts)`` — with duplicates the carry
    deterministically picks the max payload struct (total order via the
    payload tie-break), where a native ASOF's pick is unspecified.
    Unmatched left rows keep NULL match columns (left-outer flavor).
    """
    rpay = F.struct(
        F.col(ts).alias("rts"), *[F.col(c).alias(c) for c in right_cols]
    )
    r2 = right.select(
        F.col(on), F.col(ts), F.lit(0).alias("__is_l"), rpay.alias("__rpay")
    )
    l2 = left.withColumn("__is_l", F.lit(1))
    u = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("__is_l").asc(), F.col("__rpay").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__m", F.last("__rpay", ignorenulls=True).over(w))
    return u.where(F.col("__is_l") == 1).select(
        *left.columns,
        F.col("__m.rts").alias(ts + suffix),
        *[F.col(f"__m.{c}").alias(c + suffix) for c in right_cols],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    left_ts: str = "ts",
    right_start: str = "start_ts",
    right_end: str = "end_ts",
    bucket_seconds: int = 600,
) -> DataFrame:
    """Range (interval) join: each ``left`` event paired with every
    ``right`` interval of the same key that contains it
    (``start <= ts < end``) — the other join Spark's planner has no
    native strategy for (a range predicate alone degenerates to a
    per-key nested loop).

    The scalable form is the *bucketized* rewrite (what Databricks'
    RANGE_JOIN hint does under the hood): time is cut into
    ``bucket_seconds`` buckets, each interval explodes onto the buckets
    it covers, events map to their single bucket, and the join becomes a
    plain equi-join on (key, bucket) + the exact containment filter.
    Work is O(events + intervals · interval_len/bucket) with a shuffle
    Catalyst plans like any equi-join (AQE skew-split applies) — no
    cartesian per key. Bucket coverage over-approximates (the exact
    filter trims); matches are never lost. Pick ``bucket_seconds`` near
    the median interval length so the explode factor stays ~1-2.
    """
    if bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds ({bucket_seconds}) must be positive")

    def epoch(col: str) -> Column:
        return F.expr(
            f"timestampdiff(SECOND, CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ), "
            f"CAST({col} AS TIMESTAMP_NTZ))"
        )

    l2 = left.withColumn(
        "__b", F.floor(epoch(left_ts) / F.lit(bucket_seconds))
    )
    r2 = right.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(epoch(right_start) / F.lit(bucket_seconds)),
                F.floor(epoch(right_end) / F.lit(bucket_seconds)),
            )
        ),
    )
    return (
        l2.join(r2, [on, "__b"])
        .where(
            (F.col(left_ts) >= F.col(right_start))
            & (F.col(left_ts) < F.col(right_end))
        )
        .drop("__b")
    )


def props_stats(events: DataFrame, field: str = "k") -> DataFrame:
    """Semi-structured payload analytics: extract an integer field from
    the JSON ``props`` column (schema-on-read — no pre-parsing into a
    typed column) and roll up per event type.

    ``get_json_object`` evaluates JVM-side inside codegen; at crawl scale
    the same shape handles arbitrary sidecar metadata (crawler fetch
    stats, HTTP headers) without a schema migration. All-integer
    aggregates — engine-exact.
    """
    k = F.expr(f"CAST(get_json_object(props, '$.{field}') AS BIGINT)")
    return events.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("k").alias("n_with_field"),
        F.sum("k").cast("long").alias("sum_k"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"),
    )


def order_priority_pending(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4-shaped priority report: orders (in a date window) that
    HAVE a late line item — EXISTS rewritten as a LEFT SEMI join with a
    cross-table predicate (``l_shipdate > o_orderdate + 60 days``; the
    committed/receipt dates Q4 proper uses aren't in this schema).

    Plan shape to care about at scale: the semi join keeps the probe
    side narrow (no lineitem payload columns survive), duplicate
    matches never multiply rows, and both scans take pushed filters.
    """
    late = lineitem.select("l_orderkey", "l_shipdate")
    return (
        orders.where(F.col("o_orderdate") >= F.lit("1997-01-01"))
        .join(
            late,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (
                F.col("l_shipdate")
                > F.expr("o_orderdate + INTERVAL 60 DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


def inactive_customers(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q22-shaped anti-join report: customers with NO order since
    a cutoff, counted per market segment with their mean balance
    (integer-cents exact: sum(round(bal·100)) DIV n — division-free).

    NOT EXISTS as a LEFT ANTI join: the orders side reduces to the
    distinct active custkey set under the pushed date filter before it
    reaches the join, so the anti probe is key-only. Balance reported as
    an integer-cents sum, not a mean — Spark's DIV truncates toward zero
    while DuckDB's // floors, so a negative mean would diverge; the sum
    is exact in both.
    """
    active = orders.where(
        F.col("o_orderdate") >= F.lit("1998-01-01")
    ).select("o_custkey")
    return (
        customer.join(
            active, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_inactive"),
            F.expr("sum(CAST(round(c_acctbal * 100) AS BIGINT))")
            .cast("long")
            .alias("sum_acctbal_cents"),
        )
    )
