"""Extension-query semantics tests: session-window parity (the
SURVEY.md §7 watch-list item — Spark's native `session_window` must
agree with the declared gaps-and-islands SQL shape), sliding-window
slot arithmetic, and a full-registry smoke run at sf0.001."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from calaspark.queries import QUERIES

SF_SMOKE = "/root/testdata/sf0.001"


def _ts(minute: float) -> dt.datetime:
    base = dt.datetime(2024, 1, 1)
    return base + dt.timedelta(minutes=minute)


def test_session_window_parity(spark):
    """Gaps-and-islands (q36's declared shape) ≡ native session_window.

    Data avoids gaps of exactly 30 min — the one point where the two
    formulations legitimately differ (islands: > gap starts a new
    session; session_window: >= gap does).
    """
    rows = [
        # user 1: two sessions (gap of 45 min between minute 40 and 85)
        (1, 100, _ts(0)), (1, 101, _ts(10)), (1, 102, _ts(40)),
        (1, 103, _ts(85)), (1, 104, _ts(86)),
        # user 2: one session, single event
        (2, 200, _ts(5)),
        # user 3: three sessions
        (3, 300, _ts(0)), (3, 301, _ts(31)), (3, 302, _ts(62)),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp_ntz"
    )

    # islands formulation (same shape as q36, gap > 30 min)
    from pyspark.sql import Window

    e = df.select("user_id", "event_id", F.col("ts").cast("timestamp").alias("t"))
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    prev = F.lag("t").over(w)
    is_new = F.when(
        prev.isNull() | (F.unix_timestamp("t") - F.unix_timestamp(prev) > 1800), 1
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    islands = (
        e.withColumn("sid", F.sum(is_new).over(run))
        .groupBy("user_id", "sid")
        .agg(F.min("t").alias("start"), F.count("*").alias("n"))
    )
    got_islands = {
        (r["user_id"], r["start"], r["n"]) for r in islands.collect()
    }

    native = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(
            "user_id", F.col("w.start").cast("timestamp").alias("start"), "n"
        )
    )
    got_native = {(r["user_id"], r["start"], r["n"]) for r in native.collect()}

    assert got_islands == got_native
    assert len(got_islands) == 2 + 1 + 3


def test_sliding_window_slots(spark):
    """Every event lands in exactly ⌈10/5⌉ = 2 windows; counts match
    hand-computed slot assignment."""
    rows = [(1, _ts(0)), (2, _ts(4)), (3, _ts(7)), (4, _ts(12))]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp_ntz")
    out = (
        df.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start").cast("timestamp")).alias("ws"),
            "n",
        )
    )
    base = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    got = {(r["ws"] - base) // 60: r["n"] for r in out.collect()}
    # windows by start minute: -5:[0,4], 0:[0,4,7], 5:[7,12], 10:[12]
    assert got == {-5: 2, 0: 3, 5: 2, 10: 1}
    assert sum(got.values()) == 2 * len(rows)


def test_registry_smoke_all_queries(spark):
    """Every declared query runs end-to-end at sf0.001 and yields a
    stable non-degenerate schema (the driver's smoke bar)."""
    for qid, fn in QUERIES.items():
        df = fn(spark, SF_SMOKE)
        assert len(df.columns) > 0, qid
        assert df.count() >= 0, qid


def test_registry_oracle_consistency():
    """Registry/oracle invariants the driver gate depends on: every
    oracle id names a registered query (no dead oracle SQL), and the
    driver's 50-slot correctness window holds ONLY oracled ids — a
    rows-only demo drifting into the window would silently swap a
    hash check for the weaker rows-only check."""
    from calaspark.oracles import ORACLES

    assert set(ORACLES) <= set(QUERIES), sorted(set(ORACLES) - set(QUERIES))
    window = list(QUERIES)[:50]
    assert all(q in ORACLES for q in window), [
        q for q in window if q not in ORACLES
    ]


def test_q33_threshold_is_integer_exact(spark):
    """3·inter ≥ inter+union ⟺ Jaccard ≥ 0.5 on representative sets."""
    for inter, union in [(1, 2), (1, 3), (2, 4), (3, 10), (5, 10), (0, 7)]:
        assert (3 * inter >= union + inter) == (inter / union >= 0.5)


def test_q43_unpivot_roundtrip(spark):
    """Unpivot of the pivot matrix must agree with a direct groupBy
    wherever counts are nonzero, and pad zeros elsewhere."""
    from calaspark.queries.extensions import q43_unpivot_events
    from calaspark.tables import load_table

    long = q43_unpivot_events(spark, SF_SMOKE)
    direct = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy(
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
            F.col("event_type"),
        )
        .count()
    )
    got = {(r["day"], r["event_type"]): r["n"] for r in long.collect()}
    want = {(r["day"], r["event_type"]): r["count"] for r in direct.collect()}
    for k, v in want.items():
        assert got[k] == v
    zeros = set(got) - set(want)
    assert all(got[k] == 0 for k in zeros)
    n_days = len({d for d, _ in got})
    assert len(got) == n_days * 5  # dense day×type grid


def test_q44_grouping_sets_levels(spark):
    """Each grouping-sets level must reproduce its standalone twin,
    and the () row must equal the global aggregate."""
    from calaspark.queries.extensions import q44_grouping_sets
    from calaspark.tables import load_table

    rows = q44_grouping_sets(spark, SF_SMOKE).collect()
    o = load_table(spark, SF_SMOKE, "orders")
    by_status = {
        r["o_orderstatus"]: r["count"]
        for r in o.groupBy("o_orderstatus").count().collect()
    }
    got_status = {
        r["o_orderstatus"]: r["n"] for r in rows if r["gid"] == 1
    }
    assert got_status == by_status
    total = [r for r in rows if r["gid"] == 3]
    assert len(total) == 1 and total[0]["n"] == o.count()


def test_q45_array_funcs_spot(spark):
    """Spot-check the higher-order fold against Python on one doc."""
    from calaspark.queries.extensions import q45_array_funcs
    from calaspark.tables import load_table

    row = (
        q45_array_funcs(spark, SF_SMOKE)
        .filter(F.col("doc_id") == 0)
        .collect()[0]
    )
    text = (
        load_table(spark, SF_SMOKE, "documents")
        .filter(F.col("doc_id") == 0)
        .collect()[0]["text"]
    )
    toks = [t for t in text.split(" ") if t]
    assert row["n_toks"] == len(toks)
    assert row["total_chars"] == sum(len(t) for t in toks)
    assert row["first3"] == "-".join(sorted(set(toks))[:3])
    assert row["has_the"] == ("the" in toks)


def test_bench_stdout_key_map_covers_registry():
    """Every registered query id must short-key cleanly in bench.py
    (numeric ids via base36, named ids via the abbreviation map) with
    no collisions — otherwise bench crashes at startup AFTER a round
    lands a new demo id without an abbreviation (q181-era insurance:
    this moves that failure from the driver's bench run to pytest)."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "benchmod", Path(__file__).resolve().parent.parent / "bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    bench._validate_stdout_keys(QUERIES)  # raises on gap or collision


def test_stdout_line_headroom_at_250_ids():
    """Round-13 verdict item 4: the registry is at 224 ids and the
    stdout line rides the deciseconds fallback at ~1,680 of the
    driver's 2,000-byte capture. Project the NEXT growth step through
    the real encoder — the current registry plus synthetic ids up to
    ≥250 total — under a pessimistic time distribution (every query slower
    than today's p90, plus 25 ids past 10 s, i.e. 3-digit
    deciseconds) and prove the tiered fallbacks keep the line under
    1,950 bytes. Also round-trips the tier-3 packed encoding through
    _kv_decode (what _prev_bench will use on a future packed
    BENCH_r file)."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "benchmod", Path(__file__).resolve().parent.parent / "bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    # synthesize past the registry's current max numeric id to ≥250
    top = max(
        int(q[1:]) for q in QUERIES if q.startswith("q") and q[1:].isdigit()
    )
    ids = list(QUERIES) + [f"q{i}" for i in range(top + 1, top + 1 + 27)]
    assert len(ids) >= 250
    bench._validate_stdout_keys(ids)  # collision-free at 250 too
    # pessimistic: 2.5 s everywhere (today's mean is ~0.9 s), 25
    # heavy ids at 42.3 s (3-digit deciseconds)
    times = {q: 2.5 for q in ids}
    # derive the heavy/light witnesses from the sampled set instead
    # of hardcoding ids: window rotations reorder the registry every
    # round, so "q05 is heavy" broke in r17 when the cut moved
    heavy_ids = list(ids)[::10][:25]
    light_id = next(q for q in ids if q not in heavy_ids)
    for q in heavy_ids:
        times[q] = 42.3
    out, line = bench._stdout_payload(times, 0.1, "ab12cd34ef")
    assert len(line) < 1950, len(line)
    assert out["run_id"] == "ab12cd34ef"  # the sidecar-pairing key
    # the projected line must have fallen through to a denser tier
    # and stay self-describing + decodable
    assert out["queries_unit"] == "ds"
    if out.get("queries_enc") == "kv":
        decoded = bench._kv_decode(out["queries"])
    else:
        decoded = out["queries"]
    assert decoded[bench._short_key(light_id)] == 25  # 2.5 s → 25 ds
    assert decoded[bench._short_key(heavy_ids[0])] == 423  # 3-digit ds
    assert len(decoded) == len(ids)
    # tier-3 decode is the exact inverse of the packing
    packed = " ".join(f"{k}:{v}" for k, v in decoded.items())
    assert bench._kv_decode(packed) == decoded


def test_bench_host_canary_and_normalizer(tmp_path):
    """Round-15 verdict item 2 + round-16 advice 4: the host-speed
    canary must (a) be a real positive measurement, (b) only pair
    with a previous sidecar written by the run that produced the
    newest BENCH_r file — by run_id when both files carry one, else
    by the legacy 2-dp total match, decided in ONE place
    (_prev_bench) — and (c) normalize a uniform host slowdown to ~0
    delta while leaving a real per-query regression visible."""
    import importlib.util
    import json
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "benchmod", Path(__file__).resolve().parent.parent / "bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    c = bench._cpu_canary()
    assert 0.001 < c < 60  # a measurement, not a constant fold

    def write_pair(bench_payload, side):
        (tmp_path / "BENCH_r01.json").write_text(
            json.dumps({"parsed": bench_payload})
        )
        (tmp_path / "BENCH_full_local.json").write_text(json.dumps(side))

    payload = {
        "value": 239.02,
        "queries_unit": "s",
        "queries": {bench._short_key("q05"): 239.02},
    }
    side = {
        "value": 239.022,
        "host_canary": {"cpu_loop_sec": 0.5},
        "plan_fingerprints": {"q05": "aaa"},
    }
    # legacy files (no run_id): totals within 2-dp rounding → paired
    write_pair(payload, side)
    name, full, paired = bench._prev_bench(tmp_path)
    assert full == {"q05": 239.02}
    assert paired["host_canary"]["cpu_loop_sec"] == 0.5
    # mismatched totals → some other run's sidecar, rejected
    write_pair(dict(payload, value=194.30), dict(side, value=194.0))
    assert bench._prev_bench(tmp_path)[2] == {}
    # run_id on both sides wins over the total gate, in BOTH
    # directions: equal ids pair even with drifted totals …
    write_pair(
        dict(payload, run_id="r16aaa", value=500.0),
        dict(side, run_id="r16aaa"),
    )
    assert bench._prev_bench(tmp_path)[2]["host_canary"][
        "cpu_loop_sec"
    ] == 0.5
    # … and different ids reject even when totals coincide
    write_pair(dict(payload, run_id="r16aaa"), dict(side, run_id="r16bbb"))
    assert bench._prev_bench(tmp_path)[2] == {}
    # mixed-era (run_id on exactly one side) is UNPAIRED even with
    # coinciding totals — both files of one post-r16 run carry the
    # id, so one-sided presence proves different eras (round-17
    # advice closure), in both directions
    write_pair(dict(payload, run_id="r16aaa"), side)
    assert bench._prev_bench(tmp_path)[2] == {}
    write_pair(payload, dict(side, run_id="r16bbb"))
    assert bench._prev_bench(tmp_path)[2] == {}

    # normalization arithmetic: host got 1.4x slower uniformly
    prev_times = {"q05": 1.0, "q33": 4.0}
    scale = 0.7 / 0.5  # canary_now / canary_prev
    now_times = {"q05": 1.0 * scale, "q33": 4.0 * scale + 2.1}
    norm = {
        qid: round(t / scale - prev_times[qid], 3)
        for qid, t in now_times.items()
    }
    assert norm["q05"] == 0.0  # uniform slowdown normalizes away
    assert norm["q33"] == 1.5  # the real regression survives (2.1/1.4)

    # bootstrap fallback: median ratio is robust to a minority of
    # real movers (q05's own 0.44 ratio against a 1.07 registry
    # median is why a single-query fallback was rejected)
    import statistics

    prev = {"a": 1.0, "b": 2.0, "c": 3.0, "d": 4.0, "q05": 2.0}
    now = {"a": 1.07, "b": 2.14, "c": 3.21, "d": 4.28, "q05": 0.9}
    med = statistics.median(sorted(now[q] / prev[q] for q in prev))
    assert round(med, 4) == 1.07

    # the noise list rides the sidecar so diffs can auto-annotate
    assert set(bench._KNOWN_FINGERPRINT_NOISE) == {
        "q18", "q90", "q171", "q180",
    }


def test_bench_fingerprint_invariant_to_session_counters(spark):
    """bench.py's plan fingerprint must not move when session-global
    JVM counters advance (round-12 advisory: 53 ids churned across
    bench sessions with no code change). The three known leaks are
    the CSE alias counter (_common_expr_N — q16/q22/q26), the
    higher-order-function lambda variable counter (q34), and the
    drain queries' memory-sink sequence; planning OTHER queries in
    between advances the first two, and re-calling a drain advances
    the third."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "benchmod", Path(__file__).resolve().parent.parent / "bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    ids = ["q16", "q22", "q34", "q181"]
    before = {q: bench._fingerprint(QUERIES[q](spark, SF_SMOKE)) for q in ids}
    # advance the session counters: CSE aliases, lambda variables
    for warm in ["q26", "q34", "q22", "q16"]:
        QUERIES[warm](spark, SF_SMOKE).count()
    after = {q: bench._fingerprint(QUERIES[q](spark, SF_SMOKE)) for q in ids}
    assert after == before, {
        q: (before[q], after[q]) for q in ids if before[q] != after[q]
    }
    # and distinct queries must still hash apart (the normalizer may
    # never collapse real plan differences)
    assert len(set(before.values())) == len(ids)


def test_token_volume_estimate_footer_only():
    """q190's state-partition sizing input (round-17 advice closure):
    the exploded-token volume estimate must (a) come from footer
    metadata only, (b) sit at token order-of-magnitude — far above
    the document count it replaced and below the character count —
    and (c) scale with SF, so the 25k-rows-per-partition rationale it
    feeds actually tracks the stateful exchange's row grain."""
    from calaspark.queries.extensions import _token_volume_estimate

    est_01 = _token_volume_estimate("/root/testdata/sf0.01")
    est_1 = _token_volume_estimate("/root/testdata/sf0.1")
    import pyarrow.parquet as pq

    for sf, est in (("sf0.01", est_01), ("sf0.1", est_1)):
        md = pq.ParquetFile(f"/root/testdata/{sf}/documents.parquet").metadata
        n_docs = md.num_rows
        # token grain: well above document grain, below char grain
        assert est > 3 * n_docs, (sf, est, n_docs)
        assert est < 200 * n_docs, (sf, est, n_docs)
    # scales with the table (sf0.01 -> sf0.1 is 500 -> 5000 docs;
    # sf0.001 and sf0.01 share a 500-doc table, so compare these two)
    assert 4 * est_01 < est_1 < 40 * est_01
    # a failed single-file read (multi-file table, missing path)
    # returns None — the caller then sizes by the Spark footer row
    # count, which reads multi-file directories natively and stays
    # volume-proportional (a constant floor would collapse a large
    # corpus's token-grain state onto 2 partitions)
    assert _token_volume_estimate("/nonexistent") is None


def test_token_volume_fallback_sizes_by_spark_row_count(spark, tmp_path):
    """The None fallback path end-to-end: a MULTI-FILE documents
    table (the realistic big-corpus shape) defeats the single-file
    pyarrow read, and _state_partitions(est_rows=None) must then size
    by the Spark footer row count over the directory — proportional
    to volume, not the constant floor."""
    from calaspark.queries.extensions import (
        _state_partitions,
        _token_volume_estimate,
    )

    src = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    multi = str(tmp_path / "documents.parquet")
    src.repartition(3).write.parquet(multi)

    est = _token_volume_estimate(str(tmp_path))
    assert est is None  # directory defeats pq.ParquetFile

    # 500 docs / 25k per partition -> the 2-partition floor here, but
    # via the row-count path: inflate the per-partition divisor by
    # checking the exact arithmetic rather than just the clamp
    got = _state_partitions(spark, str(tmp_path), "documents", est_rows=est)
    import math

    n = spark.read.parquet(multi).count()
    assert n == 500
    cur = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert got == max(2, min(cur, math.ceil(n / 25_000)))
