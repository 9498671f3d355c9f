"""Scale-technique plan assertions (SURVEY.md §2.5 E24; the brief's
100 TB checklist): bucketed joins must be exchange-free, salted joins
must equal their unsalted twins, broadcast hints must take, and
filter pushdown must reach the parquet scan."""

from __future__ import annotations

import pyspark.sql.functions as F

from calaspark.ops.skew import salted_join, write_bucketed
from calaspark.tables import load_table

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load_table(spark, SF, "orders")
        c = load_table(spark, SF, "customer")
        write_bucketed(o, "b_orders", "o_custkey", 8)
        write_bucketed(
            c.withColumnRenamed("c_custkey", "o_custkey"), "b_cust", "o_custkey", 8
        )
        j = spark.table("b_orders").join(spark.table("b_cust"), "o_custkey")
        plan = _plan(j)
        # co-located: SortMergeJoin with NO shuffle exchange on either side
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert j.count() == 15000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_cust")


def test_salted_join_matches_plain(spark):
    o = load_table(spark, SF, "orders").select("o_custkey", "o_orderkey")
    c = load_table(spark, SF, "customer").select("c_custkey", "c_mktsegment")
    small = c.withColumnRenamed("c_custkey", "o_custkey")
    plain = o.join(small, "o_custkey")
    salted = salted_join(o, small, "o_custkey", n_salts=4)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_broadcast_hint_takes(spark):
    n = load_table(spark, SF, "nation")
    c = load_table(spark, SF, "customer")
    j = c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
    assert "BroadcastHashJoin" in _plan(j)


def test_filter_pushdown_reaches_scan(spark):
    li = load_table(spark, SF, "lineitem")
    q = li.filter(F.col("l_shipdate") < "1996-01-01").select("l_orderkey")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan
    # column pruning: the scan reads only the 2 referenced columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_shipdate:timestamp" in plan


def test_aqe_splits_skewed_join(spark):
    """AQE skew-join: a hot key's shuffle partition is split at
    runtime (SortMergeJoin(skew=true) + 'AQEShuffleRead … skewed').

    Two conditions the test documents because they bite in practice:
    the thresholds must be below the hot partition's size (defaults
    are 256 MB — tuned down here for local data), and NO downstream
    operator may require the join's hash partitioning (a groupBy on
    the join key pins the distribution and disables the split — in
    that shape, use ops.skew.salted_join instead).
    """
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big = (
            spark.range(2_000_000)
            .select(F.lit(1).alias("k"), F.col("id").alias("payload"))
            .unionAll(
                spark.range(9_900).select(
                    (F.col("id") % 99 + 2).alias("k"), F.col("id")
                )
            )
        )
        small = spark.range(1, 101).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )
        # non-pushable cross-side filter keeps the join unconstrained
        j = big.join(small, "k").filter((F.col("payload") * F.col("v")) < 0)
        assert j.collect() == []
        plan = _plan(j)
        assert "skew=true" in plan
        assert "isFinalPlan=true" in plan
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)


def test_salted_join_rejects_outer_small_side(spark):
    """Round-2 advice: right/full outer would emit every unmatched
    small-side row once per salt replica — must raise, not corrupt."""
    import pytest as _pytest

    big = spark.range(10).select(F.col("id").alias("k"))
    small = spark.range(5).select(F.col("id").alias("k"))
    for how in ("right", "full", "full_outer", "right_outer"):
        with _pytest.raises(ValueError, match="salted_join"):
            salted_join(big, small, "k", how=how)
    # left outer stays allowed: big side carries exactly one salt/row
    n = salted_join(big, small, "k", how="left").count()
    assert n == 10


# ---------------------------------------------------------- layout ops


def test_zorder_key_matches_reference(spark):
    """zorder_key ≡ the textbook Morton interleave (Python oracle)."""
    from calaspark.ops.layout import zorder_key

    def morton(vals, bits, n):
        out = 0
        for b in range(bits):
            for j, v in enumerate(vals):
                out |= ((v >> b) & 1) << (b * n + j)
        return out

    rows = [(x, y) for x in (0, 1, 5, 255) for y in (0, 3, 128, 255)]
    df = spark.createDataFrame(rows, "x long, y long").select(
        "x", "y", zorder_key(["x", "y"], bits=8).alias("z")
    )
    for r in df.collect():
        assert r["z"] == morton((r["x"], r["y"]), 8, 2), (r["x"], r["y"])


def test_zorder_write_clusters_both_dimensions(spark, tmp_path):
    """Z-ordered files have small bounding boxes in BOTH clustered
    dimensions (parquet footer min/max), so a conjunctive predicate
    prunes most files — single-column sort can only bound its
    leading column."""
    import pyarrow.parquet as pq

    from calaspark.ops.layout import minmax_bucket, write_zordered
    from calaspark.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "user_id", F.unix_timestamp("ts").alias("ep"), "value"
    )
    lo, hi = [
        r[0]
        for r in e.agg(F.min("ep")).collect()
        + e.agg(F.max("ep")).collect()
    ]
    n_users = e.agg(F.max("user_id")).collect()[0][0]
    path = str(tmp_path / "events_z")
    write_zordered(
        e,
        path,
        zcols=[
            minmax_bucket("user_id", 0, n_users, bits=8),
            minmax_bucket("ep", lo, hi, bits=8),
        ],
        n_files=8,
        bits=8,
    )
    files = sorted(str(p) for p in (tmp_path / "events_z").glob("*.parquet"))
    assert len(files) >= 4
    user_cov, ep_cov = [], []
    for f in files:
        md = pq.read_metadata(f)
        umin, umax = None, None
        emin, emax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                st = col.statistics
                if st is None:
                    continue
                name = col.path_in_schema
                if name == "user_id":
                    umin = st.min if umin is None else min(umin, st.min)
                    umax = st.max if umax is None else max(umax, st.max)
                elif name == "ep":
                    emin = st.min if emin is None else min(emin, st.min)
                    emax = st.max if emax is None else max(emax, st.max)
        user_cov.append((umax - umin) / max(n_users, 1))
        ep_cov.append((emax - emin) / max(hi - lo, 1))
    # every file's bounding box is a fraction of each dimension, on
    # average well under the whole range in BOTH dims at once
    assert sum(user_cov) / len(user_cov) < 0.7, user_cov
    assert sum(ep_cov) / len(ep_cov) < 0.7, ep_cov


def test_runtime_bloom_filter_injected(spark):
    """tune_runtime_filters makes the optimizer build a bloom filter
    from the selective dim side and probe it below the fact shuffle."""
    from calaspark.ops.layout import semi_prune, tune_runtime_filters

    keys = [
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold",
        "spark.sql.autoBroadcastJoinThreshold",
    ]
    saved = {k: spark.conf.get(k, None) for k in keys}
    try:
        tune_runtime_filters(
            spark, creation_side_max="10GB", application_side_min="0"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        sf = "/root/testdata/sf0.01"
        li = spark.read.parquet(f"{sf}/lineitem.parquet")
        p = spark.read.parquet(f"{sf}/part.parquet").filter(
            F.col("p_brand") == "Brand#4"
        )
        j = (
            li.join(p, li.l_partkey == p.p_partkey)
            .groupBy("p_brand")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan
        assert j.collect()[0]["n"] > 0
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)

    # explicit form: broadcast semi prune, big side un-shuffled
    pruned = semi_prune(
        spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet"),
        spark.read.parquet("/root/testdata/sf0.01/part.parquet")
        .filter(F.col("p_brand") == "Brand#4")
        .select(F.col("p_partkey").alias("l_partkey")),
        "l_partkey",
    )
    pplan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in pplan and "LeftSemi" in pplan
    assert pruned.count() > 0


def test_compact_parquet_collapses_small_files(spark, tmp_path):
    """64 writer-task shards collapse toward target-sized files with
    identical content; the partitioned variant leaves one file per
    partition directory and keeps pruning intact."""
    import pyspark.sql.functions as F

    from calaspark.ops.layout import compact_parquet

    src = str(tmp_path / "frag")
    df = spark.range(50_000).select(
        F.col("id"),
        (F.col("id") % 3).alias("flag"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    df.repartition(64).write.parquet(src)

    dst = str(tmp_path / "compact")
    stats = compact_parquet(spark, src, dst, target_file_bytes=16 << 20)
    assert stats["files_before"] == 64
    assert stats["files_after"] <= 4
    assert stats["rows"] == 50_000
    back = spark.read.parquet(dst)
    assert back.count() == 50_000
    assert back.agg(F.sum("id")).collect()[0][0] == 49_999 * 50_000 // 2

    dstp = str(tmp_path / "compact_part")
    stats_p = compact_parquet(
        spark, src, dstp, target_file_bytes=16 << 20, partition_cols=["flag"]
    )
    assert stats_p["rows"] == 50_000
    from pathlib import Path

    per_dir = {
        d.name: len(list(d.glob("*.parquet")))
        for d in Path(dstp).iterdir()
        if d.is_dir()
    }
    assert set(per_dir) == {"flag=0", "flag=1", "flag=2"}
    assert all(n == 1 for n in per_dir.values())
    pruned = spark.read.parquet(dstp).filter(F.col("flag") == 1)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(flag" in plan
    assert pruned.count() == sum(1 for i in range(50_000) if i % 3 == 1)


def test_vanilla_session_runs_arrow_kernel_queries(tmp_path):
    """Driver-contract regression: a VANILLA SparkSession built from a
    NON-repo working directory must be able to execute a query whose
    worker closure references a module-level kernel (q165's PAVA) —
    exactly the correctness driver's setup. Guards session.prepare's
    package shipping (round 9: the import failed only at execution
    time, invisible to every in-repo test)."""
    import subprocess
    import sys

    script = """
import importlib.util
spec = importlib.util.spec_from_file_location("entry", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false").getOrCreate())
n = mod.queries()["q165"](spark, "/root/testdata/sf0.001").count()
assert n > 0, n
print("VANILLA_OK", n)
spark.stop()
"""
    p = subprocess.run(
        [sys.executable, "-c", script],
        cwd=str(tmp_path),  # decisive: repo not on sys.path via CWD
        capture_output=True,
        text=True,
        timeout=300,
        env={
            k: v
            for k, v in __import__("os").environ.items()
            if k != "PYTHONPATH"
        },
    )
    assert "VANILLA_OK" in p.stdout, (p.stdout[-500:], p.stderr[-1500:])


def test_pkg_zip_content_addressed_and_self_healing():
    """The executor-shippable package zip must be (a) deterministic —
    same sources, same path, across processes — (b) built inside a
    0700 per-user directory, and (c) self-healing: a stale or
    tampered file already sitting at the content-addressed path is
    detected by digest mismatch and rebuilt (round-9 advice: the old
    pid-keyed name reused whatever bytes were there)."""
    import os
    import zipfile

    from calaspark.session import _build_pkg_zip

    p1 = _build_pkg_zip()
    assert _build_pkg_zip() == p1  # deterministic name
    mode = os.stat(os.path.dirname(p1)).st_mode & 0o777
    assert mode == 0o700, oct(mode)
    # tamper: plant garbage at the exact expected path
    with open(p1, "wb") as fh:
        fh.write(b"not a zip")
    p2 = _build_pkg_zip()
    assert p2 == p1
    names = zipfile.ZipFile(p2).namelist()  # valid zip again
    assert any(n.endswith("calaspark/session.py") for n in names)


def test_verify_spool_fetch_is_type_identical_to_collect(spark):
    """tools/verify_local._spool_to_arrow (the driver-memory-free
    fetch for data-sized oracled results, round-14) must be
    indistinguishable from ``toArrow`` at the comparison layer:
    same sorted column names, same canonical logical types, same
    row multiset — across every type family the oracle contract
    emits (bigint, double incl. specials, decimal, string+NULL,
    date, timestamp_ntz)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from verify_local import _spool_to_arrow, _table_info

    df = spark.sql(
        """
        SELECT * FROM VALUES
          (1L, 1.5D, CAST(12.34 AS DECIMAL(14,2)), 'a',
           DATE'2001-02-03', TIMESTAMP_NTZ'2001-02-03 04:05:06'),
          (2L, CAST('NaN' AS DOUBLE), CAST(-0.01 AS DECIMAL(14,2)),
           CAST(NULL AS STRING),
           DATE'1999-12-31', TIMESTAMP_NTZ'1999-12-31 23:59:59')
        AS t(i, d, m, s, dt, ts)
        """
    )
    assert _table_info(_spool_to_arrow(df)) == _table_info(df.toArrow())


def test_round_tie_audit_benign_gate_is_per_divergence():
    """tools/round_tie_audit's allowlist must match the SPECIFIC
    adjudicated divergence class, not the query id (round-16 advice):
    a fresh divergence class — or an ERR / ARG-CAP-OVERFLOW — in
    q02/q175 must flip the gate even though those ids carry benign
    entries."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from round_tie_audit import _is_benign, spark_emu

    # the adjudicated classes still pass
    assert _is_benign("q02", ("div", 8285.425, 2, 8285.43, 8285.42))
    assert _is_benign("q175", ("div", 1.7e14, 6, 1.7e14, 1.7e14))
    # a NEW class in the same ids fails: wrong scale, wrong magnitude,
    # or an argument that is not a 6-dp decimal (q02's site emits
    # exact DECIMAL(*,6) products only)
    assert not _is_benign("q02", ("div", 8285.425, 3, 0.0, 0.0))
    assert not _is_benign("q02", ("div", 0.1234567, 2, 0.12, 0.13))
    assert not _is_benign("q175", ("div", 123.4565, 6, 0.0, 0.0))
    # ERR and overflow are never benign, in any id
    assert not _is_benign("q02", ("err", "ERR: boom"))
    assert not _is_benign("q175", ("overflow",))
    # an unlisted id is never benign
    assert not _is_benign("q192", ("div", 18.27125, 4, 18.2713, 18.2712))
    # the emulation the gate is built on: the canonical q192 find
    assert spark_emu(18.27125, 4) == 18.2713


def test_scale_probe_replication_invariants(spark):
    """tools/scale_probe.build_scaled_dir must produce the documented
    shape-preserving replication: exact row multiples with re-keyed
    ids, DISJOINT per-replica token universes for documents, an exact
    ISOMETRY per embedding replica (norms agree to 1e-6 — float
    re-association, not bit drift), a grown events user universe;
    unscaled tables symlink."""
    import math
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import scale_probe

    sf = "/root/testdata/sf0.001"
    scaled = scale_probe.build_scaled_dir(spark, sf, 2)

    import pyspark.sql.functions as F

    d0 = spark.read.parquet(f"{sf}/documents.parquet")
    d2 = spark.read.parquet(f"{scaled}/documents.parquet")
    n0 = d0.count()
    assert d2.count() == 2 * n0
    # replica ids occupy disjoint ranges
    assert d2.filter(F.col("doc_id") >= scale_probe.OFF).count() == n0
    # token universes are disjoint across replicas
    toks = d2.select(
        (F.col("doc_id") >= scale_probe.OFF).alias("rep1"),
        F.explode(F.split("text", r"[\t\n\f\r ]")).alias("t"),
    ).filter(F.length("t") > 0)
    both = (
        toks.groupBy("t")
        .agg(F.countDistinct("rep1").alias("nrep"))
        .filter(F.col("nrep") > 1)
        .count()
    )
    assert both == 0

    e0 = spark.read.parquet(f"{sf}/embeddings.parquet")
    e2 = spark.read.parquet(f"{scaled}/embeddings.parquet")
    assert e2.count() == 2 * e0.count()
    # isometry: norm of every replica-1 vector equals its source's
    norm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double")),
            F.lit(0.0),
            lambda a, x: a + x * x,
        )
    )
    src = {r["vec_id"]: r["n"] for r in e0.select("vec_id", norm.alias("n")).collect()}
    rep = {
        r["vec_id"] - scale_probe.OFF: r["n"]
        for r in e2.filter(F.col("vec_id") >= scale_probe.OFF)
        .select("vec_id", norm.alias("n"))
        .collect()
    }
    assert set(src) == set(rep)
    assert all(math.isclose(src[k], rep[k], rel_tol=1e-6) for k in src)

    ev2 = spark.read.parquet(f"{scaled}/events.parquet")
    from calaspark.tables import load_table

    ev0 = load_table(spark, sf, "events")
    assert ev2.count() == 2 * ev0.count()
    u0 = ev0.select("user_id").distinct().count()
    assert ev2.select("user_id").distinct().count() == 2 * u0
    # unscaled tables symlink to the originals
    assert (Path(scaled) / "orders.parquet").is_symlink()
