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
