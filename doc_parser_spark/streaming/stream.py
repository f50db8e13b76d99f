"""Structured Streaming surface: streaming extraction + windowed analytics.

The reference is batch-only (SURVEY.md §2.7: no streaming/watermarks); on
Spark the same extraction kernel runs unchanged over a stream — the
``mapInPandas`` stage is stateless, so it composes with ``readStream`` /
``writeStream`` and the file sink's exactly-once commit log gives the
streaming flavor of checkpoint/resume for free.

Three entry points:

* :func:`stream_extract` — file-stream of page parquet → documents_out
  parquet sink with a checkpoint dir. ``trigger(availableNow=True)`` drains
  the backlog batch-style (used by tests); in production the same call
  tails a landing zone of WARC-derived parquet drops.
* :func:`windowed_event_counts` — watermarked tumbling-window aggregation
  over an event stream (late data handled by the watermark).
* :func:`running_user_totals` — custom stateful operator via
  ``applyInPandasWithState`` (GroupState): per-user running event count /
  value sum, the pattern a custom streaming accumulator (e.g. per-host
  crawl-quota tracking) would use at scale.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal
from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int = 16,
):
    """Streaming extraction job; returns the started StreamingQuery."""
    from doc_parser_spark.operators.extract import extract_documents

    reader = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    docs = extract_documents(reader, with_markdown=False).drop("spans", "chunks")
    writer = (
        docs.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts per event type (works on both
    static and streaming DataFrames)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def _update_user_totals(
    key, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n_events, sum_value = state.get
    else:
        n_events, sum_value = 0, 0.0
    for pdf in pdfs:
        n_events += len(pdf)
        sum_value += float(pdf["value"].sum())
    state.update((n_events, sum_value))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n_events], "sum_value": [round(sum_value, 2)]}
    )


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: per-user running totals
    (``applyInPandasWithState`` — Arrow-batched, executor-partitioned
    state; the scale path for bespoke streaming accumulators)."""
    return (
        events_stream.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_url_dedup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    available_now: bool = True,
):
    """Streaming URL-level dedup: first canonical-URL occurrence wins.

    ``dropDuplicatesWithinWatermark`` keeps the dedup state BOUNDED — a
    crawl stream revisits the same URLs for days, and an unbounded
    ``dropDuplicates`` state would grow with the full URL universe. The
    watermark on ``warc_ts`` is the crawl-recency horizon: re-fetches
    inside it dedup exactly; a re-fetch after the horizon is a new
    observation (which is what a training-data pipeline wants — content
    may have changed). State survives restarts via the checkpoint."""
    from doc_parser_spark.operators.web import canonical_url_col

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )
    deduped = (
        stream.withColumn("canonical_url", canonical_url_col("url"))
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["canonical_url"])
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# -- streaming sessionization (event-time gap sessions) -----------------------

SESSION_GAP_US = 1_800_000_000  # 30 min, matches operators.relational.sessionize

_SESS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_no", T.LongType()),
        # UNSEALED events only (ts plus 1e-4-scaled values; a null value
        # stays null — the batch twin's SUM skips it). Bounded by the
        # watermark: only events newer than (watermark - gap) can still
        # be unsealed, so the buffer never outgrows the lateness window.
        T.StructField("ts_us", T.ArrayType(T.LongType())),
        T.StructField("vals", T.ArrayType(T.LongType())),
    ]
)

_SESS_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_no", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def _scale4(value: float) -> int:
    """double -> exact 1e-4-unit integer, HALF_UP — the same result as
    Spark's CAST(value AS DECIMAL(18,4)) (BigDecimal of the shortest
    decimal repr, setScale(4, HALF_UP)), so streaming sums are integer-
    exact twins of the batch DECIMAL sums."""
    return int(
        Decimal(repr(float(value))).scaleb(4).to_integral_value(ROUND_HALF_UP)
    )


def _round2(sum_scaled: int) -> float:
    return float(
        Decimal(sum_scaled).scaleb(-4).quantize(Decimal("0.01"), ROUND_HALF_UP)
    )


def _watermark_us(state: GroupState) -> int:
    try:
        return int(state.getCurrentWatermarkMs()) * 1000
    except Exception:  # pragma: no cover - API absent in stubbed tests
        return 0


def _update_sessions(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    """Per-user gap sessionizer, sealed strictly by the WATERMARK.

    State = the UNSEALED event buffer plus the numbering residue. New
    events merge into the buffer; the buffer splits into gap sessions in
    event-time order, and a session is emitted exactly when the
    watermark passes its last event + gap — only then can no admissible
    late event extend or bridge it. (Closing on an in-arrival-order gap
    — the previous design — emitted too early: a late-but-in-watermark
    event bridging the gap merges sessions in the batch twin, and the
    stream must agree.) The timeout re-fires at the first unsealed
    session's seal time so sessions close without new data arriving
    (GroupStateTimeout.EventTimeTimeout). After everything seals, the
    numbering residue (session_no, empty buffer) is kept WITHOUT a new
    timeout so a returning user continues batch-identical numbering.
    Null event values stay null in the buffer: the batch twin's
    SUM(DECIMAL) skips them while n_events still counts the row —
    an all-null session emits a null sum the same way."""
    (user_id,) = key
    if state.exists:
        sn, buf_ts, buf_vals = state.get
        buf_ts, buf_vals = list(buf_ts), list(buf_vals)
    else:
        sn, buf_ts, buf_vals = 0, [], []
    if not state.hasTimedOut:
        for batch in pdfs:
            for ts, value in zip(batch["ts"], batch["value"]):
                buf_ts.append(int(ts.value) // 1000)  # pandas ns -> us
                buf_vals.append(
                    None if pd.isna(value) else _scale4(value)
                )
    order = sorted(range(len(buf_ts)), key=lambda i: buf_ts[i])
    events = [(buf_ts[i], buf_vals[i]) for i in order]

    sessions: list[list[tuple]] = []
    for ev in events:
        if sessions and ev[0] - sessions[-1][-1][0] <= SESSION_GAP_US:
            sessions[-1].append(ev)
        else:
            sessions.append([ev])

    wm_us = _watermark_us(state)
    closed = []
    kept: list[list[tuple]] = []
    for s in sessions:
        # seal in order only (seal times are monotone across sessions,
        # the guard just makes that structural)
        if not kept and s[-1][0] + SESSION_GAP_US <= wm_us:
            vals = [v for _, v in s if v is not None]
            closed.append(
                (
                    user_id,
                    sn,
                    len(s),
                    _round2(sum(vals)) if vals else None,
                )
            )
            sn += 1
        else:
            kept.append(s)

    if kept:
        flat = [ev for s in kept for ev in s]
        state.update(
            (sn, [t for t, _ in flat], [v for _, v in flat])
        )
        # re-fire when the first unsealed session becomes sealable
        state.setTimeoutTimestamp(
            (kept[0][-1][0] + SESSION_GAP_US) // 1000
        )
    else:
        # numbering residue only; no timeout until new data
        state.update((sn, [], []))
    yield pd.DataFrame(
        closed, columns=["user_id", "session_no", "n_events", "sum_value"]
    )


def streaming_sessionize(events_stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Custom stateful streaming operator: event-time gap sessionization
    (the streaming twin of ``relational.sessionize``, same 30-min gap,
    output shape, DECIMAL-exact sums, and — because sessions seal
    strictly at the watermark, with unsealed events buffered in state —
    identical sessions AND numbering for every admitted event, late ones
    included). Per-key state is bounded by the lateness window: only
    events newer than (watermark - gap) can still be unsealed. After a
    user's buffer drains, a one-long numbering residue persists — the
    price of batch-identical numbering; key the output on session start
    and ``remove()`` instead if global numbering is not needed.

    At crawl scale this is the per-host fetch-session/politeness tracker:
    keyed state partitioned across executors, Arrow-batched updates, no
    driver involvement."""
    # watermarks require TIMESTAMP (ltz); crawl tables carry TIMESTAMP_NTZ.
    # The cast interprets NTZ in the session timezone — run production
    # pipelines in UTC (the cluster default): under a DST-shifting session
    # timezone, wall-clock gaps straddling a transition are distorted by
    # the offset change relative to the batch twin's pure-NTZ arithmetic.
    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_sessions,
            outputStructType=_SESS_OUT_SCHEMA,
            stateStructType=_SESS_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# -- streaming politeness scheduler (per-host fetch slots) ---------------------

_POLITE_DEFAULT_DELAY_MS = 1000  # crawler default when robots is silent

_POLITE_STATE_SCHEMA = T.StructType(
    [T.StructField("next_slot", T.LongType())]
)

_POLITE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("slot", T.LongType()),
        T.StructField("not_before_ms", T.LongType()),
    ]
)


def _update_polite(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    host = key[0]
    rows = pd.concat(list(pdfs), ignore_index=True)
    if rows.empty:  # pragma: no cover — NoTimeout never invokes empty
        return
    rows = rows.sort_values(
        ["discovered_ts", "url"], kind="mergesort"
    ).reset_index(drop=True)
    next_slot = state.get[0] if state.exists else 0
    slots = [next_slot + i for i in range(len(rows))]
    state.update((next_slot + len(rows),))
    # a host missing from the robots relation arrives with NULL delay
    # (left-join miss -> NaN in the Arrow float column): fall back to
    # the default instead of killing the whole streaming query
    delays = [
        int(d) if pd.notna(d) else _POLITE_DEFAULT_DELAY_MS
        for d in rows["delay_ms"]
    ]
    yield pd.DataFrame(
        {
            "host": host,
            "url": rows["url"],
            "slot": slots,
            "not_before_ms": [s * d for s, d in zip(slots, delays)],
        }
    )


def streaming_polite_schedule(frontier_stream: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: the streaming twin of
    ``web.polite_schedule``'s per-host queue discipline — newly
    discovered frontier URLs get consecutive per-host fetch slots that
    CONTINUE across micro-batches (the property a batch recomputation
    cannot give a live crawler: batch slot 0 restarts every run;
    streaming state remembers that the host already burned its early
    slots), with ``not_before_ms = slot · crawl_delay_ms`` keeping the
    RFC 9309 / Mercator per-host spacing.

    Input rows ``(host, url, discovered_ts, delay_ms)`` — the caller
    stream-static-joins the robots crawl-delay relation on host; a host
    with no robots row (NULL delay) falls back to the 1 s crawler
    default instead of failing the micro-batch.
    Within a micro-batch, slot order is the deterministic
    ``(discovered_ts, url)`` sort, so the schedule is replayable from
    the checkpoint; per-host state is ONE long (the next slot) — state
    size is bounded by the active-host count, orders of magnitude below
    the URL universe, which is why this needs no watermark eviction.
    """
    return frontier_stream.groupBy("host").applyInPandasWithState(
        _update_polite,
        outputStructType=_POLITE_OUT_SCHEMA,
        stateStructType=_POLITE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_host_rate(
    pages: DataFrame,
    robots_profile: DataFrame,
    window: str = "1 minute",
    watermark: str = "5 minutes",
    window_seconds: int = 60,
) -> DataFrame:
    """Live politeness monitor: per-host fetch rate per tumbling
    event-time window, checked against each host's robots crawl-delay
    budget — the crawl-ops dashboard relation a fleet operator watches
    (the scheduler *plans* politeness; this measures what the fleet
    actually did, where retries/races/multiple schedulers can break
    the plan).

    ``pages`` is the capture stream ``(url, warc_ts, html, ...)``;
    ``robots_profile`` is a STATIC relation ``(host, crawl_delay_s)``
    — the stream-static equi-join is stateless (each micro-batch probes
    the static side; Spark re-plans it per batch, so a refreshed
    profile table is picked up on the next trigger), demonstrated here
    beside the stateful patterns (dedup, sessionize, keyed scheduler)
    the other streaming relations cover.

    Output per (window, host): ``n_fetches``, ``n_bytes``,
    ``allowed_fetches`` = ``window_seconds DIV crawl_delay_s`` (0 delay
    or no robots row → unlimited, emitted as NULL allowance with
    ``over_budget`` false), and ``over_budget``. Works identically on a
    static frame (the batch-parity contract every streaming relation
    here keeps).
    """
    from doc_parser_spark.operators.web import host_col

    joined = (
        pages.select(
            host_col("url").alias("host"),
            F.col("warc_ts"),
            F.length(F.col("html")).cast("long").alias("n_b"),
        )
        .join(F.broadcast(robots_profile), "host", "left")
    )
    agg = (
        joined.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"), "host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_fetches"),
            F.sum("n_b").cast("long").alias("n_bytes"),
            F.max("crawl_delay_s").alias("delay_s"),
        )
    )
    return agg.select(
        F.col("win.start").alias("window_start"),
        "host",
        "n_fetches",
        "n_bytes",
        F.expr(
            f"CASE WHEN delay_s IS NULL OR delay_s <= 0 THEN"
            f" CAST(NULL AS BIGINT)"
            f" ELSE CAST({window_seconds} DIV delay_s AS BIGINT) END"
        ).alias("allowed_fetches"),
        F.expr(
            f"CASE WHEN delay_s IS NULL OR delay_s <= 0 THEN false"
            f" ELSE n_fetches > ({window_seconds} DIV delay_s) END"
        ).alias("over_budget"),
    )
