"""Declared contract queries Q01–Q20 — the relational query surface
(SURVEY.md §2.4 R1–R10, §2.5 E1–E5, §2.6).

The reference exposes these semantics through the Django ORM over its
~80 loaded tables (`calaccess_raw/models/*`, admin in
`calaccess_raw/admin/__init__.py §BaseAdmin`); it has no execution
operators of its own (SURVEY.md §2.3) — our engine supplies them
natively via Spark DataFrame ops so Catalyst plans them (pushdown,
pruning, join selection, AQE all apply).

Every computed column is aliased identically to the DuckDB oracle in
``calaspark/oracles.py`` (driver sorts columns by name before
hashing).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..ops.windows import latest_per_key, running, topk_per_group
from ..tables import load_table
from ._util import MONEY, RATE, as_date, dec, money_avg, money_sum

# ---------------------------------------------------------------- Q01


def q01_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global aggregates over lineitem (R4/R8; V1 row-count twin)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        money_sum("l_quantity", "sum_qty"),
        money_avg("l_quantity", "avg_qty"),
        F.min(as_date("l_shipdate")).alias("min_ship"),
        F.max(as_date("l_shipdate")).alias("max_ship"),
    )


# ---------------------------------------------------------------- Q02


def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicates + computed projection (R1).

    Filters reach the parquet scan as PushedFilters; `revenue` is a
    per-row exact decimal product rounded to 2 (rule 1).
    """
    li = load_table(spark, sf_dir, "lineitem")
    revenue = dec("l_extendedprice") * (
        F.lit(1).cast(RATE) - dec("l_discount", RATE)
    )
    return (
        li.filter(
            (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.02, 0.06)
            & (F.col("l_returnflag") != "N")
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            as_date("l_shipdate").alias("ship_date"),
            F.col("l_returnflag").alias("returnflag"),
            F.round(revenue, 2).cast("double").alias("revenue"),
        )
    )


# ---------------------------------------------------------------- Q03


def q03_sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort + deterministic top-100 (R5/E4).

    Total order (o_orderkey is unique) before LIMIT — rule 3. Spark
    plans this as TakeOrderedAndProject: no full sort materialized.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(
            F.col("o_orderpriority").asc(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey").asc(),
        )
        .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
        .limit(100)
    )


# ---------------------------------------------------------------- Q04


def q04_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination: rows 101–200 by c_custkey (R6, admin changelist)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.orderBy("c_custkey")
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
        .offset(100)
        .limit(100)
    )


# ---------------------------------------------------------------- Q05


def q05_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary (R3/E2) — the flagship query.

    All sums in exact decimal (rule 1); averages as decimal-sum /
    count in double (rule 4). Partial aggregation (map-side combine)
    applies — the shuffle carries one row per (flag,status) pair per
    task, not per input row.
    """
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast(RATE)
    disc_price = dec("l_extendedprice") * (one - dec("l_discount", RATE))
    charge = disc_price * (one + dec("l_tax", RATE))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity", "sum_qty"),
            money_sum("l_extendedprice", "sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            money_avg("l_quantity", "avg_qty"),
            money_avg("l_extendedprice", "avg_price"),
            (
                F.sum(dec("l_discount", RATE)).cast("double")
                / F.count("l_discount").cast("double")
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------- Q06


def q06_groupby_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped aggregate + HAVING on the exact decimal sum (R3)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.sum(dec("o_totalprice")).alias("_rev"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .filter(F.col("_rev") > 200000)
        .select(
            "o_custkey",
            F.round("_rev", 2).cast("double").alias("revenue"),
            "n_orders",
        )
    )


# ---------------------------------------------------------------- Q07


def q07_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-table star join, revenue per region/nation (TPC-H Q5 shape;
    R9/E1 — the reference's documented-key navigation, natively).

    region/nation are broadcast (tiny dims); customer⋈orders⋈lineitem
    shuffle on their keys. At 100 TB the fact-fact join dominates —
    AQE picks sort-merge with skew splitting; dims never shuffle.

    The year filter is a half-open date range (not `year(col) == y`):
    a plain range predicate reaches the parquet scan as PushedFilters
    and prunes row groups via min/max stats; a function-of-column
    predicate cannot, and at 100 TB would read the whole orders table.
    """
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = dec("l_extendedprice") * (F.lit(1).cast(RATE) - dec("l_discount", RATE))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
        )
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(revenue), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------- Q08


def q08_join_left_nullfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT JOIN preserving order-less customers; COALESCE fill (E1/E9)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.round(F.sum(dec("o_totalprice")), 2).cast("double"), F.lit(0.0)
            ).alias("total_spent"),
        )
    )


# ---------------------------------------------------------------- Q09


def q09_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with ≥1 finished order — leftsemi ≡ oracle EXISTS (E1)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "leftsemi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


# ---------------------------------------------------------------- Q10


def q10_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no pending orders — leftanti ≡ NOT EXISTS (E1)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "leftanti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# ---------------------------------------------------------------- Q11


def q11_join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast dims (physical-only hint; same result) (E1)."""
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            money_sum("s_acctbal", "total_acctbal"),
            money_avg("s_acctbal", "avg_acctbal"),
        )
    )


# ---------------------------------------------------------------- Q12


def q12_join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + band (theta) join: quantity within ±5 of part size (E1).

    The equi key carries the join (hash/sort-merge); the band predicate
    is a post-join filter — at scale this is the right plan because a
    pure theta join would be a broadcast nested loop.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(
            p,
            (li.l_partkey == p.p_partkey)
            & li.l_quantity.between(p.p_size - 5, p.p_size + 5),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            money_sum("l_quantity", "sum_qty"),
        )
    )


# ---------------------------------------------------------------- Q13


def q13_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer under a total order (E3/E4).

    rn + filter(rn<=k) lowers to WindowGroupLimit (top-k per group
    without materializing full sorted groups) — see ops/windows.py.
    """
    o = load_table(spark, sf_dir, "orders")
    return topk_per_group(
        o,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        3,
    ).select("o_custkey", F.col("rn").cast("long").alias("rn"), "o_orderkey", "o_totalprice")


def q13_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC 'latest record per key' — the reference's latest-amendment-
    wins convention (R10/E16; `models/base.py §UNIQUE_KEY`)."""
    o = load_table(spark, sf_dir, "orders")
    return latest_per_key(
        o,
        ["o_custkey"],
        [F.col("o_orderdate").desc(), F.col("o_orderkey").desc()],
    ).select(
        "o_custkey",
        "o_orderkey",
        as_date("o_orderdate").alias("latest_date"),
        "o_totalprice",
    )


# ---------------------------------------------------------------- Q14


def q14_rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING_ID subtotal tags (E2).

    Two-phase: pre-aggregate to the base (flag, status) level FIRST,
    then rollup the ≤|groups| partials. A direct rollup Expands every
    fact row ×3 before partial aggregation; pre-aggregation makes the
    Expand run on the tiny grouped frame instead — the rewrite
    Catalyst does not do itself, and the difference at 100 TB is the
    whole fact table shuffled 3× vs once. Decimal partials stay
    unrounded so re-aggregation is exact (sums are associative).
    """
    li = load_table(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(dec("l_quantity")).alias("pq"),
        F.sum(dec("l_extendedprice")).alias("pb"),
        F.count(F.lit(1)).alias("pn"),
    )
    return (
        base.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.round(F.sum("pq"), 2).cast("double").alias("sum_qty"),
            F.round(F.sum("pb"), 2).cast("double").alias("sum_base_price"),
            F.sum("pn").alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "sum_base_price", "n")
    )


# ---------------------------------------------------------------- Q15


def q15_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over status × priority (E2) — same two-phase shape as
    q14: base-level pre-aggregation, then the ×4 Expand runs over
    ≤|groups| partial rows instead of the whole fact table."""
    o = load_table(spark, sf_dir, "orders")
    base = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(dec("o_totalprice")).alias("pt"),
    )
    return (
        base.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.sum("pn").alias("n"),
            F.round(F.sum("pt"), 2).cast("double").alias("total"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n", "total")
    )


# ---------------------------------------------------------------- Q16


def q16_minby_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by/count_if per nation (E2).

    Ordering argument is an integer encoding of (acctbal, custkey) so
    ties are impossible — min_by/max_by with non-unique orderings are
    nondeterministic in every engine (rule 3 applied to aggregates).
    Cents are extracted via exact DECIMAL(12,2) arithmetic (no double
    rounding), and the 1e10 multiplier keeps the encoding injective up
    to 10 B customers — safe at the 100 TB target (|cents| < 1e8 →
    |enc| < 1e18 < bigint max).
    """
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    enc = (
        (dec("c_acctbal") * 100).cast("long") * F.lit(10_000_000_000)
        + F.col("c_custkey")
    ).alias("_enc")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .select("n_name", "c_name", "c_acctbal", "c_custkey", enc)
        .groupBy("n_name")
        .agg(
            F.min_by("c_name", F.col("_enc")).alias("poorest"),
            F.max_by("c_name", F.col("_enc")).alias("richest"),
            F.count_if(F.col("c_acctbal") > 0).alias("n_positive"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


# ---------------------------------------------------------------- Q17


def q17_window_running_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running decimal sum + lag/lead per customer (E3 frames)."""
    o = load_table(spark, sf_dir, "orders")
    order = [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()]
    w = Window.partitionBy("o_custkey").orderBy(*order)
    df = running(
        o, ["o_custkey"], order, F.sum(dec("o_totalprice")), "_run"
    )
    return df.select(
        "o_custkey",
        "o_orderkey",
        as_date("o_orderdate").alias("order_date"),
        F.round("_run", 2).cast("double").alias("running_total"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


# ---------------------------------------------------------------- Q18


def q18_distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) per group (R7; exact twin of E14)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def q18_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT projection (R7)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_mktsegment", "c_nationkey").distinct()


# ---------------------------------------------------------------- Q19


def q19_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (exact twin of E14's sketch).

    Spark `percentile` and DuckDB `quantile_cont` share the linear-
    interpolation formula; inputs are small integers as doubles so
    the arithmetic is deterministic. ROUND(.,4) belt-and-braces.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 4).alias("p90"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------- Q20


def q20_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL / INTERSECT / EXCEPT branches, tagged (E5)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    open_orders = (
        o.filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    tag = lambda df, t: df.select(F.lit(t).alias("tag"), "custkey")  # noqa: E731
    return (
        tag(building.unionAll(open_orders), "union_all")
        .unionAll(tag(building.intersect(open_orders), "intersect"))
        .unionAll(tag(building.subtract(open_orders), "except"))
    )
