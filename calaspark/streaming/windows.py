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


def release_stream_state(spark) -> None:
    """Release executor-side state-store providers left by TERMINATED
    streaming queries (round-16 q188 root cause).

    The executor JVM caches every loaded ``StateStoreProvider`` (for a
    stream-stream join: the FULL both-sides buffered state — an
    availableNow drain of a bounded source runs as one batch whose
    starting watermark is 0, so nothing was evicted) and only unloads
    a terminated query's providers when the 60 s maintenance tick
    notices the coordinator deactivated them. Back-to-back drains —
    bench runs each drain query 2-3×, and seven drain gates run in
    one bench session — stack dead state on the heap faster than
    maintenance clears it; measured on q188 at sf0.1: runs grew
    9.1 → 13.3 → 16.5 → 21.9 s within one session, and stopped
    growing with an explicit unload between runs. ``StateStore.stop``
    unloads all providers and stops the maintenance task; the next
    streaming query's first store load restarts maintenance
    (``StateStore.get`` → ``startMaintenanceIfNeeded``), so this is
    safe between queries — guarded to a no-op while any query is
    still ACTIVE, and failure-tolerant (a Spark-internal rename turns
    this into a perf regression, never an error).

    SINGLE-SESSION ASSUMPTION (round-17 advice closure): the
    active-query guard checks THIS session's ``spark.streams``, but
    ``StateStore.stop()`` is JVM-global — a sibling ``newSession()``
    / separately-built session in the same JVM with its own ACTIVE
    stateful query would have its live providers unloaded mid-query
    (checkpointed queries reload the store from the checkpoint on
    the next batch — a latency hit; a checkpoint-less memory-sink
    drain in flight could fail its batch). No public JVM-wide
    active-query enumeration exists (each session owns its
    ``StreamingQueryManager``), so the guard cannot be widened
    cheaply; callers running concurrent multi-session streaming in
    one JVM must skip this call. Every in-repo caller goes through
    :func:`drain_snapshot`, which this engine runs strictly
    sequentially within one session (gate + bench contract)."""
    try:
        if spark.streams.active:
            return
        jvm = spark._jvm
        jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()
        spark.streams.resetTerminated()
    except Exception:  # noqa: BLE001 — perf hygiene only, never fatal
        pass


def drain_snapshot(
    agg: DataFrame,
    name: str,
    output_mode: str,
    state_partitions: int | None = None,
) -> DataFrame:
    """Drain a bounded stream and return a SELF-CONTAINED batch
    snapshot of its memory-sink table, releasing the run's references
    (round-16): the sink's temp view is dropped (complete/append
    memory sinks pin their whole output on the driver heap for the
    session lifetime otherwise) and the terminated query's
    state-store providers are unloaded. The snapshot is
    lineage-cut via :func:`calaspark.ops.materialize.materialize`,
    so the returned DataFrame does not reference the dropped view.
    Drain outputs are aggregate/key-grain by contract (each drain
    gate's docstring argues its own bound), so the snapshot is
    model-sized — never a data-grain copy.

    ``state_partitions`` sizes the stream's STATE partitioning: a
    streaming plan pins its stateful-exchange partition count from
    ``spark.sql.shuffle.partitions`` at query start (no AQE inside a
    stateful stream), and that count should track STATE VOLUME, not
    the session's batch shuffle default — each state partition pays
    fixed per-batch store open/commit/maintenance cost, so 32
    near-empty stores cost far more than they buy in parallelism
    (measured on the q188 stream-stream join at the sf0.01 gate:
    12.4 s → 2.5 s going 32 → 4, identical 874-row output). The conf
    is set around query START only and restored immediately —
    batch-plan behavior is untouched. Every drain gate's output is
    partition-count invariant (aggregate / join-pair-set / distinct
    semantics; each gate's docstring carries its own argument), so
    this is a pure physical knob. On a production continuous stream
    the same knob is sized to expected in-horizon state instead.

    NOT THREAD-SAFE (round-17 advice closure): the override mutates
    the session-global ``spark.sql.shuffle.partitions`` for the
    start-the-query window, so a batch query PLANNED concurrently in
    another thread of the same session would silently pick up the
    drain's state-partition count. The engine's gates and bench run
    strictly sequentially, where this is sound; a concurrent caller
    must serialize drains against batch planning (scoping the
    override via a cloned ``spark.newSession()`` does not work here:
    the memory sink registers its temp view in the session that
    starts the query, and the snapshot must be read from — and the
    view dropped in — that same session)."""
    spark = agg.sparkSession
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    try:
        if state_partitions is not None:
            spark.conf.set(key, str(int(state_partitions)))
        q = run_available_now(agg, name, output_mode=output_mode)
    finally:
        spark.conf.set(key, prev)
    assert q.lastProgress is not None  # a StreamingQuery really ran
    from ..ops.materialize import materialize

    snap = materialize(spark.table(name))
    spark.catalog.dropTempView(name)
    release_stream_state(spark)
    return snap


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
