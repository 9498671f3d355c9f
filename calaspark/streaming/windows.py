"""Structured Streaming operators (SURVEY.md §2.5 E23).

The declared correctness contract covers the BATCH twins (q31/q35/q36
— identical aggregation plans, oracle-checked); this module is the
true streaming surface: the same windowed aggregations as incremental
queries with watermarked state, plus stateful streaming dedup.

Scale notes: streaming state lives in the state store partitioned by
the grouping key — same shuffle key as the batch twin, so a plan that
is right in batch stays right incrementally. Watermarks bound state
(late rows beyond the watermark are dropped); `availableNow` gives
batch-boundedness for backfills and tests.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_stream(
    spark: SparkSession, src_dir: str, schema: StructType | str
) -> DataFrame:
    """File-source stream over a parquet directory (the lake layout
    the ingest pipeline writes). Schema must be declared — streaming
    sources never infer."""
    return spark.readStream.schema(schema).parquet(src_dir)


def tumbling_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of q35: watermarked tumbling count/sum."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("wstart"), "n", "sum_value")
    )


def sliding_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming twin of q31."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("wstart"), "n")
    )


def session_counts(
    stream: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of q36 via native session_window."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(key), F.session_window(ts_col, gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(key, F.col("w.start").alias("sess_start"), "n_events")
    )


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stateful streaming exact dedup (E15 streaming form):
    `dropDuplicatesWithinWatermark` keeps per-key state only within
    the watermark horizon — bounded state at any throughput."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def run_available_now(
    agg: DataFrame,
    query_name: str,
    output_mode: str = "complete",
    checkpoint: str | None = None,
):
    """Drain all available input as one bounded run into an in-memory
    table (tests / backfills), returning the finished query. With
    ``checkpoint`` set, watermark/state persist across runs — repeated
    invocations over a growing source behave as ONE logical stream
    (each run resumes the previous run's event-time watermark, so late
    rows are dropped exactly as a continuous query would drop them)."""
    w = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    q = w.start()
    q.awaitTermination()
    return q


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    *,
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
    on: tuple[tuple[str, str], ...] = (),
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join on equi keys + event-time range — the
    streaming twin of :func:`calaspark.ops.rangejoin.interval_join`
    (same half-open window ``[left_ts+lower, left_ts+upper)``).

    Structured Streaming keeps BOTH sides in join state; the range
    condition on the two event-time columns plus the watermarks is
    what makes that state bounded — the engine derives that a left
    row is dead once the right watermark passes ``left_ts + upper``
    and evicts it. Without the time bounds the state grows forever,
    which is why this wrapper refuses to build an unbounded
    condition. Column names must be disjoint across sides
    (pre-alias); ``on`` pairs (left_col, right_col) keys.

    Output mode is append-only (Spark's stream-stream inner join
    contract) — aggregate downstream in a separate query if needed.
    """
    span = int(upper) - int(lower)
    if span <= 0:
        raise ValueError(f"empty window: lower={lower} upper={upper}")
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(right_ts) >= F.col(left_ts) + F.expr(f"INTERVAL {int(lower)} SECOND"))
        & (F.col(right_ts) < F.col(left_ts) + F.expr(f"INTERVAL {int(upper)} SECOND"))
    )
    for lk, rk in on:
        cond = cond & (F.col(lk) == F.col(rk))
    return l.join(r, cond, "inner")
