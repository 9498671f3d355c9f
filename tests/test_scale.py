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
