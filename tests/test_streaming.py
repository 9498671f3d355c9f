"""Structured Streaming smoke tests (E23): the streaming window
aggregations and stateful dedup run for real (availableNow bounded
drain) and agree with their batch twins on the same input."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from calaspark.streaming import (
    dedup_stream,
    read_stream,
    run_available_now,
    tumbling_counts,
)

# Watermarks require TIMESTAMP (not NTZ); the session is pinned UTC
# so wall-clock values are identical either way.
SCHEMA = "event_id long, ts timestamp, user_id long, value double"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Small events table as a parquet dir (µs timestamps — the lake
    layout ingest writes; the raw testdata's TIMESTAMP(NANOS) quirk is
    a batch-source concern handled in tables.load_table)."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=7 * i), i % 3, float(i)) for i in range(100)
    ]
    # duplicate a few event_ids for the dedup test
    rows += [rows[0], rows[1], rows[2]]
    path = str(tmp_path_factory.mktemp("stream") / "events")
    spark.createDataFrame(rows, SCHEMA).write.mode("overwrite").parquet(path)
    return path


def test_streaming_tumbling_matches_batch(spark, events_dir):
    stream = read_stream(spark, events_dir, SCHEMA)
    assert stream.isStreaming
    q = run_available_now(
        tumbling_counts(stream, window="1 hour", watermark="2 hours"),
        "t_tumbling",
    )
    got = {
        (r["wstart"], r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM t_tumbling").collect()
    }
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .select(F.col("w.start").alias("wstart"), "n", "s")
    )
    want = {(r["wstart"], r["n"], r["s"]) for r in batch.collect()}
    assert got == want and len(got) > 0
    q.stop()


def test_streaming_stateful_dedup(spark, events_dir):
    stream = read_stream(spark, events_dir, SCHEMA)
    q = run_available_now(
        dedup_stream(stream, ["event_id"], watermark="24 hours"),
        "t_dedup",
        output_mode="append",
    )
    n = spark.sql("SELECT count(*) AS n FROM t_dedup").collect()[0]["n"]
    n_src = spark.read.parquet(events_dir).count()
    n_distinct = (
        spark.read.parquet(events_dir).select("event_id").distinct().count()
    )
    assert n_src == n_distinct + 3  # fixture added 3 dupes
    assert n == n_distinct
    q.stop()


def test_stateful_running_totals(spark, events_dir):
    """applyInPandasWithState running totals == batch groupBy on the
    same bounded input (one availableNow micro-batch)."""
    from calaspark.streaming import running_totals_stream

    stream = read_stream(spark, events_dir, SCHEMA)
    q = run_available_now(
        running_totals_stream(stream), "t_state", output_mode="update"
    )
    got = {
        r["user_id"]: (r["n_events"], round(r["sum_value"], 6))
        for r in spark.sql("SELECT * FROM t_state").collect()
    }
    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
    )
    want = {
        r["user_id"]: (r["n"], round(r["s"], 6)) for r in batch.collect()
    }
    assert got == want and len(got) == 3
    q.stop()


def test_transform_with_state(spark, events_dir):
    """transformWithStateInPandas (typed state + TTL) matches the
    batch groupBy twin — same contract as the applyInPandasWithState
    accumulator, through the Spark 4 successor API. Skips when the
    runtime lacks google.protobuf (Spark's transform_with_state
    driver worker hard-requires it; not shipped in this container)."""
    from calaspark.streaming import (
        ROCKSDB_PROVIDER_CONF,
        running_totals_tws,
        tws_available,
    )

    # plan construction is protobuf-free: the operator must always
    # produce a valid streaming plan with the declared output schema
    built = running_totals_tws(read_stream(spark, events_dir, SCHEMA), ttl_ms=1000)
    assert built.isStreaming
    assert [f.name for f in built.schema] == ["user_id", "n_events", "sum_value"]

    if not tws_available():
        pytest.skip("google.protobuf unavailable: tws driver worker cannot start")

    conf_key, conf_val = ROCKSDB_PROVIDER_CONF
    saved = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, conf_val)
    try:
        stream = read_stream(spark, events_dir, SCHEMA)
        # 1h TTL: far beyond the bounded drain, so no key expires
        # mid-test; the TTL + processingTime paths are still exercised
        q = run_available_now(
            running_totals_tws(stream, ttl_ms=3_600_000),
            "t_tws",
            output_mode="update",
        )
        got = {
            r["user_id"]: (r["n_events"], round(r["sum_value"], 6))
            for r in spark.sql("SELECT * FROM t_tws").collect()
        }
        batch = (
            spark.read.parquet(events_dir)
            .groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        )
        want = {
            r["user_id"]: (r["n"], round(r["s"], 6)) for r in batch.collect()
        }
        assert got == want and len(got) == 3
        q.stop()
    finally:
        if saved is not None:
            spark.conf.set(conf_key, saved)
        else:
            spark.conf.unset(conf_key)


def test_streaming_soak_growing_source_drops_late_rows(spark, tmp_path):
    """Soak shape: repeated availableNow runs over a GROWING file
    source sharing one checkpoint — the repeated-backfill pattern that
    must behave like one continuous query. Run 1 establishes the
    event-time watermark; run 2 appends fresh rows plus rows far
    behind the watermark and must (a) drop exactly the late rows —
    observable in StreamingQueryProgress.stateOperators
    [].numRowsDroppedByWatermark — and (b) keep the on-time windows
    correct."""
    src = tmp_path / "grow"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    base = dt.datetime(2024, 1, 1)

    def write_batch(rows):
        # append part-files into ONE directory — how a lake partition
        # actually grows; the file source picks up only the new files
        spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(
            str(src)
        )

    def run():
        # parquet sink: the memory sink cannot recover a checkpoint,
        # and a file sink is the real lake shape anyway
        stream = read_stream(spark, str(src), SCHEMA)
        q = (
            tumbling_counts(stream, window="1 hour", watermark="10 minutes")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # progress events post asynchronously; drain until the
        # data-carrying batch is visible (bounded wait)
        import time as _t

        for _ in range(50):
            if any(p.numInputRows > 0 for p in q.recentProgress):
                break
            _t.sleep(0.2)
        dropped = sum(
            op.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for op in p.get("stateOperators", [])
        )
        q.stop()
        return dropped

    # Run 1: 50 on-time rows, minutes 0..245 → watermark lands at
    # max_event_time - 10 min ≈ minute 235.
    write_batch([
        (i, base + dt.timedelta(minutes=5 * i), i % 3, float(i))
        for i in range(50)
    ])
    dropped1 = run()
    assert dropped1 == 0  # first run: watermark starts at epoch 0

    # Run 2: 10 fresh rows past the frontier + 3 LATE rows aimed at
    # the three fully-closed hours 0/1/2 (watermark resumed ≈ 3:55).
    # The drop counter tallies POST-partial-agg rows at the state
    # store — one per late GROUP — so distinct target windows make
    # the expected count exact.
    write_batch([
        (100 + i, base + dt.timedelta(minutes=250 + 5 * i), i % 3, 1.0)
        for i in range(10)
    ] + [
        (200 + i, base + dt.timedelta(minutes=61 * i), i % 3, 99.0)
        for i in range(3)
    ])
    dropped2 = run()
    assert dropped2 == 3  # exactly the three late windows' groups

    # The late 99.0-valued rows must not leak into emitted windows:
    # hours 0 and 1 closed in run 1's state and must read exactly as
    # their on-time content (rows 0..11 sum 66; rows 12..23 sum 210).
    emitted = {
        r["wstart"]: (r["n"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    }
    assert emitted[base] == (12, 66.0)
    assert emitted[base + dt.timedelta(hours=1)] == (12, 210.0)
    assert len(emitted) >= 3  # later closed windows emitted too


def test_stream_stream_interval_join_matches_batch(spark, events_dir):
    """Watermarked stream-stream interval join (E23) drains to the
    same pair set the naive batch theta join produces."""
    from calaspark.streaming import (
        interval_join_stream,
        read_stream,
        run_available_now,
    )

    def lsel(df):
        return df.filter(F.col("event_id") % 2 == 0).select(
            F.col("event_id").alias("lid"),
            F.col("ts").alias("lt"),
            F.col("user_id").alias("lk"),
        )

    def rsel(df):
        return df.filter(F.col("event_id") % 2 == 1).select(
            F.col("event_id").alias("rid"),
            F.col("ts").alias("rt"),
            F.col("user_id").alias("rk"),
        )

    s = read_stream(spark, events_dir, SCHEMA)
    joined = interval_join_stream(
        lsel(s), rsel(s),
        left_ts="lt", right_ts="rt",
        lower=0, upper=3600,
        on=(("lk", "rk"),),
    ).select("lid", "rid")
    q = run_available_now(joined, "ssjoin_pairs", output_mode="append")
    got = {
        (r["lid"], r["rid"])
        for r in spark.sql("SELECT * FROM ssjoin_pairs").collect()
    }
    q.stop()

    b = spark.read.parquet(events_dir)
    lb, rb = lsel(b), rsel(b)
    expected = {
        (r["lid"], r["rid"])
        for r in lb.join(
            rb,
            (lb.lk == rb.rk)
            & (rb.rt >= lb.lt)
            & (rb.rt < lb.lt + F.expr("INTERVAL 3600 SECOND")),
        ).collect()
    }
    assert got == expected and expected


def test_foreach_batch_upsert_cdc(spark, tmp_path):
    """Streaming CDC upsert: file-stream row images merged per
    micro-batch; newest version per key wins, replay is a no-op
    (effectively-once), and NULL source cells overwrite (row-image
    semantics, not per-cell coalesce)."""
    from calaspark.streaming import (
        foreach_batch_upsert,
        merge_upsert,
        read_upsert_table,
    )

    src = tmp_path / "cdc_in"
    src.mkdir()
    tgt = str(tmp_path / "cdc_tgt")
    ckpt = str(tmp_path / "cdc_ckpt")
    schema = "k long, ver long, payload string"

    def feed(rows, stage_name):
        """The file-stream source watches the top-level dir only:
        write via a staging dir, move part-files in flat."""
        import shutil

        stage = tmp_path / stage_name
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(stage))
        for i, p in enumerate(sorted(stage.glob("part-*.parquet"))):
            shutil.move(str(p), str(src / f"{stage_name}_{i}.parquet"))

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            stream.writeStream.foreachBatch(
                foreach_batch_upsert(tgt, "k", [F.col("ver").desc()])
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    feed([(1, 1, "a1"), (2, 1, "b1"), (1, 2, "a2")], "batch0")
    drain()
    t1 = {r["k"]: (r["ver"], r["payload"]) for r in read_upsert_table(spark, tgt).collect()}
    assert t1 == {1: (2, "a2"), 2: (1, "b1")}

    # second file: update k=2, insert k=3 with NULL payload cell
    feed([(2, 5, "b5"), (3, 1, None)], "batch1")
    drain()
    t2 = {r["k"]: (r["ver"], r["payload"]) for r in read_upsert_table(spark, tgt).collect()}
    assert t2 == {1: (2, "a2"), 2: (5, "b5"), 3: (1, None)}

    # replay the SAME change set directly (at-least-once delivery):
    # the merge is idempotent, table unchanged
    replay = spark.createDataFrame([(2, 5, "b5"), (3, 1, None)], schema)
    merge_upsert(spark, tgt, replay, "k", [F.col("ver").desc()])
    t3 = {r["k"]: (r["ver"], r["payload"]) for r in read_upsert_table(spark, tgt).collect()}
    assert t3 == t2

    # a NULL cell in a NEWER row image must overwrite the old value
    merge_upsert(
        spark,
        tgt,
        spark.createDataFrame([(2, 6, None)], schema),
        "k",
        [F.col("ver").desc()],
    )
    t4 = {r["k"]: (r["ver"], r["payload"]) for r in read_upsert_table(spark, tgt).collect()}
    assert t4[2] == (6, None)


def test_merge_upsert_rejects_schema_drift(spark, tmp_path):
    """A batch whose columns differ from the target must raise the
    explicit migration error, not crash unresolved or silently drop
    target-only columns."""
    import pytest as _pytest

    from calaspark.streaming import merge_upsert

    tgt = str(tmp_path / "drift_tgt")
    schema = "k long, ver long, payload string"
    merge_upsert(
        spark, tgt, spark.createDataFrame([(1, 1, "a")], schema),
        "k", [F.col("ver").desc()],
    )
    drifted = spark.createDataFrame(
        [(1, 2, "b", "extra")], schema + ", extra_col string"
    )
    with _pytest.raises(ValueError, match="schema drift"):
        merge_upsert(spark, tgt, drifted, "k", [F.col("ver").desc()])


def test_merge_upsert_tolerates_present_named_column(spark, tmp_path):
    """A batch column legitimately named `_present` must merge with
    its real values — the internal row-presence marker may not
    clobber it (it once did: withColumn replaced the user column and
    every merged value came back 1)."""
    from calaspark.streaming import merge_upsert, read_upsert_table

    tgt = str(tmp_path / "present_tgt")
    schema = "k long, ver long, _present long"
    merge_upsert(
        spark, tgt, spark.createDataFrame([(1, 1, 7), (2, 1, None)], schema),
        "k", [F.col("ver").desc()],
    )
    merge_upsert(
        spark, tgt, spark.createDataFrame([(2, 2, 9)], schema),
        "k", [F.col("ver").desc()],
    )
    got = {
        r["k"]: (r["ver"], r["_present"])
        for r in read_upsert_table(spark, tgt).collect()
    }
    assert got == {1: (1, 7), 2: (2, 9)}


def test_stream_static_broadcast_enrich(spark, events_dir):
    """Stream-static join (E23's enrichment shape): a micro-batched
    stream joins a small STATIC dimension — Spark broadcasts the
    static side into every micro-batch, no state store involved.
    The drained result must equal the batch join on the same input."""
    from calaspark.streaming import read_stream, run_available_now

    dim = spark.createDataFrame(
        [(0, "bronze"), (1, "silver"), (2, "gold")], "user_id long, tier string"
    )
    stream = read_stream(spark, events_dir, SCHEMA)
    enriched = (
        stream.join(F.broadcast(dim), "user_id")
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("s"),
        )
    )
    q = run_available_now(enriched, "t_enrich", output_mode="complete")
    got = {
        r["tier"]: (r["n"], float(r["s"]))
        for r in spark.sql("SELECT * FROM t_enrich").collect()
    }
    q.stop()

    batch = (
        spark.read.parquet(events_dir)
        .join(dim, "user_id")
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("s"),
        )
    )
    expect = {r["tier"]: (r["n"], float(r["s"])) for r in batch.collect()}
    assert got == expect and len(got) == 3


def test_streaming_heavy_hitters_covers_batch_truth(spark, tmp_path):
    """Streaming Misra-Gries candidates (mergeable per-bucket state,
    multiple micro-batches) must cover every true heavy hitter of
    the bounded input, and the batch recount of the final candidate
    set must equal the exact batch answer — the stream/batch twin
    contract applied to ops/heavy.py."""
    from calaspark.streaming import heavy_hitters_stream, run_available_now

    # skewed token stream split across several files so availableNow
    # drains in more than one micro-batch (maxFilesPerTrigger=1)
    import random

    rng = random.Random(7)
    toks = []
    for j in range(10):
        toks += [f"tok{j:02d}"] * (2**j)
    rng.shuffle(toks)
    src = tmp_path / "toks"
    n_files = 5
    per = (len(toks) + n_files - 1) // n_files
    for i in range(n_files):
        spark.createDataFrame(
            [(t,) for t in toks[i * per : (i + 1) * per]], "tok string"
        ).coalesce(1).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema("tok string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = run_available_now(
        heavy_hitters_stream(stream), "t_hh", output_mode="update"
    )
    cands = {r["tok"] for r in spark.sql("SELECT tok FROM t_hh").collect()}
    q.stop()

    from collections import Counter

    k = 32  # HH_CAPACITY
    n = len(toks)
    truth = {t: c for t, c in Counter(toks).items() if c * k > n}
    assert set(truth) <= cands, sorted(set(truth) - cands)

    # exact recount of the streamed candidate set == batch truth
    batch = spark.createDataFrame([(t,) for t in toks], "tok string")
    got = {
        r["tok"]: r["cnt"]
        for r in batch.filter(F.col("tok").isin(list(cands)))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * k > F.lit(n))
        .collect()
    }
    assert got == truth



def test_streaming_ewma_drift_matches_batch_kernel(spark, tmp_path):
    """The drained streaming EWMA must be BITWISE equal per key to
    the batch ops/sequential.ewma_running closing value over the
    same ordered input (the stream/batch twin contract for the
    sequential-recurrence family), and the alert counter must match
    a pure-Python replay of the same deterministic rule."""
    import random

    from calaspark.ops.sequential import ewma_running
    from calaspark.streaming import ewma_drift_stream, run_available_now

    rng = random.Random(11)
    rows = []
    for i in range(600):
        key = f"k{i % 3}"
        base = 10.0 * (1 + i % 3)
        x = base + rng.uniform(-1, 1)
        if i % 97 == 0:
            x *= 8  # injected level jumps -> alerts
        rows.append((key, i, round(x, 3)))

    # split across files IN ORDER so availableNow drains in several
    # in-order micro-batches (the operator's ordering contract)
    src = tmp_path / "vals"
    n_files = 4
    per = (len(rows) + n_files - 1) // n_files
    for i in range(n_files):
        spark.createDataFrame(
            rows[i * per : (i + 1) * per],
            "key string, seq long, value double",
        ).coalesce(1).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema("key string, seq long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = run_available_now(
        ewma_drift_stream(
            stream, key_col="key", order_col="seq", val_col="value",
            alpha=0.125, tau=1.5,
        ),
        "t_drift",
        output_mode="update",
    )
    # "update" emits one row per key per touching micro-batch; the
    # final state per key is the row with the max n_events
    got = {
        r["key"]: r
        for r in spark.sql(
            """SELECT key, n_events, ewma, n_alerts FROM (
                 SELECT *, row_number() OVER (
                   PARTITION BY key ORDER BY n_events DESC) AS rn
                 FROM t_drift) WHERE rn = 1"""
        ).collect()
    }
    q.stop()

    batch = spark.createDataFrame(rows, "key string, seq long, value double")
    fin = ewma_running(batch, ["key"], ["seq"], "value", alpha=0.125)
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    last = (
        fin.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("key").orderBy(F.col("seq").desc())
            ),
        )
        .filter("rn = 1")
        .collect()
    )
    want_ewma = {r["key"]: r["ewma"] for r in last}

    # pure-Python replay of the alert rule
    from collections import defaultdict

    seq = defaultdict(list)
    for k, i, x in rows:
        seq[k].append((i, x))
    want_alerts = {}
    for k, vs in seq.items():
        s, have, na = 0.0, False, 0
        for _, x in sorted(vs):
            if have and s != 0.0 and abs(x - s) > 1.5 * abs(s):
                na += 1
            s = x if not have else 0.125 * x + 0.875 * s
            have = True
        want_alerts[k] = (na, s)

    for k in seq:
        assert got[k]["n_events"] == len(seq[k])
        assert got[k]["ewma"] == want_ewma[k], (k, "stream vs batch kernel")
        assert got[k]["ewma"] == want_alerts[k][1], (k, "stream vs replay")
        assert got[k]["n_alerts"] == want_alerts[k][0], (k, "alerts")
    assert sum(v[0] for v in want_alerts.values()) > 0  # jumps fired


def test_streaming_ewma_drift_multichunk_group(spark, tmp_path):
    """A key whose micro-batch spans MULTIPLE Arrow chunks must still
    fold in order_col order (the kernel concats chunks before the
    one sort — sorting per chunk would corrupt the recurrence).
    Forces tiny Arrow batches so one 400-row key arrives as ~50
    chunks, and pins bitwise equality to a pure-Python replay."""
    from calaspark.streaming import ewma_drift_stream, run_available_now

    rows = [("k", i, float((i * 37) % 101)) for i in range(400)]
    import random

    shuffled = rows[:]
    random.Random(3).shuffle(shuffled)  # file order != seq order
    src = tmp_path / "mc"
    spark.createDataFrame(
        shuffled, "key string, seq long, value double"
    ).coalesce(1).write.parquet(str(src))

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "8")
    try:
        stream = (
            spark.readStream.schema("key string, seq long, value double")
            .parquet(str(src))
        )
        q = run_available_now(
            ewma_drift_stream(
                stream, key_col="key", order_col="seq", val_col="value",
                alpha=0.25, tau=0.5,
            ),
            "t_drift_mc",
            output_mode="update",
        )
        got = spark.sql(
            "SELECT * FROM t_drift_mc ORDER BY n_events DESC LIMIT 1"
        ).collect()[0]
        q.stop()
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )

    s, have, na = 0.0, False, 0
    for _, _, x in sorted(rows, key=lambda r: r[1]):
        if have and s != 0.0 and abs(x - s) > 0.5 * abs(s):
            na += 1
        s = x if not have else 0.25 * x + 0.75 * s
        have = True
    assert got["n_events"] == 400
    assert got["ewma"] == s  # bitwise
    assert got["n_alerts"] == na


def test_stateful_dedup_state_survives_micro_batches(spark, tmp_path):
    """q184's operator across REAL micro-batch boundaries
    (maxFilesPerTrigger=1): a key first seen in batch 0 and recurring
    in batch 2 must NOT re-emit while its event time is inside the
    watermark horizon — per-key state in the state store carries
    across batches, which the single-file availableNow drains of the
    q184 gate cannot exercise on their own."""
    import datetime as dt
    import shutil

    import pyspark.sql.functions as F

    src = tmp_path / "dd_in"
    src.mkdir()
    schema = "ts timestamp, k string"
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def feed(rows, name):
        stage = tmp_path / name
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(stage))
        for i, p in enumerate(sorted(stage.glob("part-*.parquet"))):
            shutil.move(str(p), str(src / f"{name}_{i}.parquet"))

    m = dt.timedelta(minutes=1)
    feed([(t0, "a"), (t0 + m, "b")], "f0")
    feed([(t0 + 2 * m, "c")], "f1")
    feed([(t0 + 3 * m, "a"), (t0 + 4 * m, "d"), (t0 + 5 * m, "b")], "f2")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    deduped = (
        stream.withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["k"])
        .select("k")
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("t_dd_mb")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # ≥3 triggers really ran (one per file) and the recurrences of
    # a/b in the third file were suppressed by cross-batch state
    assert q.lastProgress is not None
    out = [r["k"] for r in spark.table("t_dd_mb").collect()]
    assert sorted(out) == ["a", "b", "c", "d"], out
    q.stop()


def test_session_window_gap_boundary_is_inclusive(spark, tmp_path):
    """Pin the semantics q187 depends on: Spark's session_window
    merges an event landing EXACTLY ``gap`` after the previous event
    (inclusive boundary), and splits one second past it. If an engine
    upgrade ever flips this to exclusive, q187's gap constant (1800 s
    ≡ the q36 islands rule "floored gap ≤ 1800") must flip to 1801 —
    this test is the tripwire."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    src = tmp_path / "sess_in"
    spark.createDataFrame(
        [
            (1, t0),
            (1, t0 + dt.timedelta(seconds=1800)),  # exactly gap later
            (2, t0),
            (2, t0 + dt.timedelta(seconds=1801)),  # one past gap
        ],
        "user_id int, ts timestamp",
    ).write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema("user_id int, ts timestamp").parquet(
        str(src)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy("user_id", F.session_window("ts", "1800 seconds"))
        .agg(F.count("*").alias("n"))
        .select("user_id", "n")
    )
    q = run_available_now(agg, "t_sess_boundary", output_mode="complete")
    rows = sorted(
        (r["user_id"], r["n"]) for r in spark.table("t_sess_boundary").collect()
    )
    # user 1: one merged session of 2; user 2: two singleton sessions
    assert rows == [(1, 2), (2, 1), (2, 1)], rows
    q.stop()


def test_q187_q188_drains_match_batch_twins(spark):
    """The two new hash-gated streaming drains equal their batch
    formulations bitwise on the pinned sf0.001 corpus (the driver
    proves them against the DuckDB oracle at sf0.01; this is the
    in-repo twin)."""
    from calaspark.queries.extensions import (
        q187_stream_session_drain,
        q188_stream_stream_join_drain,
    )
    from calaspark.queries.extensions import q36_session_window_batch

    sf = "/root/testdata/sf0.001"
    got = {
        tuple(r)
        for r in q187_stream_session_drain(spark, sf)
        .select("user_id", "sess_start", "sess_end", "n_events")
        .collect()
    }
    want = {
        tuple(r)
        for r in q36_session_window_batch(spark, sf)
        .select("user_id", "sess_start", "sess_end", "n_events")
        .collect()
    }
    assert got == want and len(got) > 0

    from calaspark.ops.rangejoin import interval_join
    from calaspark.tables import load_table

    e = load_table(spark, sf, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("ep"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("ep").alias("c_ts"), "user_id"
    )
    views = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("ep").alias("v_ts"),
        "user_id",
        "value",
    )
    batch_pairs = interval_join(
        clicks,
        views,
        left_ts="c_ts",
        right_ts="v_ts",
        lower=1,
        upper=86401,
        on=("user_id",),
    ).select(
        "click_id",
        "user_id",
        F.col("c_ts").alias("click_ep"),
        "view_id",
        F.col("v_ts").alias("view_ep"),
        "value",
    )
    got_j = {tuple(r) for r in q188_stream_stream_join_drain(spark, sf).collect()}
    want_j = {tuple(r) for r in batch_pairs.collect()}
    assert got_j == want_j and len(got_j) > 0


def test_q190_drain_matches_batch_heavy_hitters(spark):
    """The hash-gated applyInPandasWithState drain (q190) must equal
    the batch q113 heavy hitters exactly on the pinned sf0.001 corpus
    — the superset-candidates + exact-recount contract makes the
    stateful streaming pass answer-invariant (the driver proves the
    same equality against the DuckDB oracle at sf0.01)."""
    from calaspark.queries.advanced import q113_heavy_hitters
    from calaspark.queries.extensions import q190_stream_heavy_hitters_drain

    sf = "/root/testdata/sf0.001"
    got = {tuple(r) for r in q190_stream_heavy_hitters_drain(spark, sf).collect()}
    want = {tuple(r) for r in q113_heavy_hitters(spark, sf).collect()}
    assert got == want and len(got) > 0


def test_drain_snapshot_releases_and_preserves(spark, events_dir):
    """drain_snapshot (round 16) must return a snapshot equal to the
    memory-sink contents while (a) dropping the sink's temp view —
    the round-16 q188 root cause was drained tables pinned on the
    heap for the session lifetime, (b) restoring the session's
    shuffle-partition conf after sizing the stream's state exchange,
    and (c) leaving the snapshot fully usable after the drop
    (lineage-cut — no reference to the dropped view)."""
    from calaspark.streaming import drain_snapshot, read_stream

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    agg = (
        read_stream(spark, events_dir, SCHEMA)
        .withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
    )
    snap = drain_snapshot(agg, "drain_snap_t1", "complete", state_partitions=3)
    # conf restored
    assert spark.conf.get(key) == before
    # sink view gone
    assert not any(
        t.name == "drain_snap_t1" for t in spark.catalog.listTables()
    )
    # snapshot matches the batch twin and survives the view drop
    batch = (
        spark.read.schema(SCHEMA)
        .parquet(events_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
    )
    assert sorted(map(tuple, snap.collect())) == sorted(
        map(tuple, batch.collect())
    )
    # the state exchange really ran at the requested partition count:
    # the drained aggregation is partition-count invariant (same rows
    # at 3 as the session default) — the q193-style invariance the
    # gates rely on
    snap2 = drain_snapshot(agg, "drain_snap_t2", "complete")
    assert sorted(map(tuple, snap2.collect())) == sorted(
        map(tuple, snap.collect())
    )


def test_release_stream_state_noop_while_active(spark, events_dir):
    """release_stream_state must refuse to unload providers while ANY
    streaming query is active (unloading live state would force
    reload-from-checkpoint mid-query at best), and must be callable
    on a quiet session without error."""
    from calaspark.streaming import read_stream, release_stream_state

    stream = read_stream(spark, events_dir, SCHEMA)
    q = (
        stream.writeStream.format("memory")
        .queryName("release_guard_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        # may or may not still be active when we get here; the call
        # must be safe either way
        release_stream_state(spark)
    finally:
        q.awaitTermination()
    spark.catalog.dropTempView("release_guard_t")
    release_stream_state(spark)  # quiet session: full release path


def test_drain_snapshot_unloads_state_machinery(spark, events_dir):
    """Mechanism regression test for the round-16 q188 root cause —
    not timing-based (timings flake), but the observable the fix
    changes: after drain_snapshot returns on a quiet session, the
    JVM's state-store maintenance task must be STOPPED (providers
    unloaded via StateStore.stop — dead drains no longer hold their
    state on the heap), and a SUBSEQUENT stateful drain must restart
    the machinery transparently and produce correct results."""
    from calaspark.streaming import drain_snapshot, read_stream

    ss = spark._jvm.org.apache.spark.sql.execution.streaming.state.StateStore

    def drain(name):
        agg = (
            read_stream(spark, events_dir, SCHEMA)
            .withWatermark("ts", "1 hour")
            .groupBy("user_id")
            .agg(F.count("*").alias("n"))
        )
        return drain_snapshot(agg, name, "complete", state_partitions=2)

    first = drain("unload_t1")
    assert not ss.isMaintenanceRunning()  # providers released
    # the machinery restarts for the next stateful query
    second = drain("unload_t2")
    assert not ss.isMaintenanceRunning()
    assert sorted(map(tuple, first.collect())) == sorted(
        map(tuple, second.collect())
    )


def test_drain_partition_count_invariance_property(spark, tmp_path):
    """Property: a drained stateful aggregation is invariant to the
    state-partition count (the q193-style invariance every drain
    gate's state_partitions sizing relies on) — over a randomized
    event table (seeded), the drained complete-mode result is
    IDENTICAL at 2, 3, and 8 state partitions and equals the batch
    twin."""
    import random as _random

    from calaspark.streaming import drain_snapshot, read_stream

    rng = _random.Random(0xC16)
    base = dt.datetime(2024, 3, 1)
    rows = [
        (
            i,
            base + dt.timedelta(seconds=rng.randrange(0, 86400)),
            rng.randrange(0, 7),
            float(rng.randrange(-100, 100)),
        )
        for i in range(500)
    ]
    path = str(tmp_path / "rand_events")
    spark.createDataFrame(rows, SCHEMA).write.mode("overwrite").parquet(path)

    def agg_of(df):
        return df.groupBy("user_id").agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("s"),
            F.min("ts").alias("first_ts"),
        )

    results = []
    for i, nparts in enumerate((2, 3, 8)):
        snap = drain_snapshot(
            agg_of(
                read_stream(spark, path, SCHEMA).withWatermark("ts", "2 hours")
            ),
            f"inv_prop_t{i}",
            "complete",
            state_partitions=nparts,
        )
        results.append(sorted(map(tuple, snap.collect())))
    assert results[0] == results[1] == results[2]
    batch = sorted(
        map(tuple, agg_of(spark.read.schema(SCHEMA).parquet(path)).collect())
    )
    assert results[0] == batch
