"""Exact grouped order statistics with BUCKET-GRAIN windows (the
q98/q121 two-level search as a reusable operator — E13).

``exact_quantiles_bucketed`` returns, per group and requested
fraction ``num/den``, the smallest value whose cumulative weight
reaches that fraction of the group total — the float-free
membership test ``den·cum ≥ num·tot`` (no division, no
interpolation; ties and even counts resolve to the smallest
qualifying value, a DECLARED contract both engines state
identically).  Multiple ``nums`` share ONE pre-agg and ONE bucket
cum table — the search fans out only at the tiny bucket grain.

Scale shape (the round-6 q98 lesson): a naive window over all
distinct values puts a group's whole value domain through one task.
Here the cumulative window runs over ``value_range / bucket_width``
bucket rows per group (a fixed value-domain constant), the single
surviving bucket per (group, num) broadcasts back, and the exact
test runs only inside it — the final window's input is bounded by
the bucket width, never the data volume.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def exact_quantiles_bucketed(
    grain: DataFrame,
    group_col: str,
    val_col: str,
    weight_col: str,
    nums: Sequence[int],
    den: int,
    bucket_width: float = 1024.0,
) -> DataFrame:
    """(group, _num, q, tot) — per requested ``num`` in ``nums``,
    the smallest ``val`` with ``den·cum ≥ num·tot`` plus the exact
    group weight total.

    ``grain`` must already be (group, val)-grain with an exact
    (integer/decimal) ``weight_col`` — pre-aggregate duplicates
    first; exactness of the weights is what makes the membership
    test bit-identical across engines.
    """
    nums = list(nums)
    gb = grain.withColumn("_bkt", F.floor(F.col(val_col) / F.lit(bucket_width)))
    b = gb.groupBy(group_col, "_bkt").agg(F.sum(weight_col).alias("_bw"))
    wcumb = (
        Window.partitionBy(group_col)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtotb = Window.partitionBy(group_col)
    bc = b.select(
        group_col,
        "_bkt",
        "_bw",
        F.sum("_bw").over(wcumb).alias("_bcum"),
        F.sum("_bw").over(wtotb).alias("_tot"),
    )
    # the bucket-grain search fans out per requested fraction HERE,
    # where rows are value_range/bucket_width per group — never at
    # the data grain
    ks = F.explode(F.array(*[F.lit(int(n)) for n in nums])).alias("_num")
    mb = (
        bc.select(group_col, "_bkt", "_bw", "_bcum", "_tot", ks)
        .filter(F.lit(den) * F.col("_bcum") >= F.col("_num") * F.col("_tot"))
        .groupBy(group_col, "_num")
        .agg(
            F.min_by(
                F.struct(
                    F.col("_bkt").alias("_mbkt"),
                    (F.col("_bcum") - F.col("_bw")).alias("_cum_before"),
                    F.col("_tot").alias("_tot"),
                ),
                F.col("_bkt"),
            ).alias("_s")
        )
        .select(group_col, "_num", "_s._mbkt", "_s._cum_before", "_s._tot")
    )
    inb = gb.join(F.broadcast(mb), group_col).filter(
        F.col("_bkt") == F.col("_mbkt")
    )
    wcum = (
        Window.partitionBy(group_col, "_num")
        .orderBy(val_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = inb.select(
        group_col,
        "_num",
        val_col,
        (F.col("_cum_before") + F.sum(weight_col).over(wcum)).alias("_cum"),
        "_tot",
    )
    return (
        c.filter(F.lit(den) * F.col("_cum") >= F.col("_num") * F.col("_tot"))
        .groupBy(group_col, "_num")
        .agg(F.min(val_col).alias("q"), F.max("_tot").alias("tot"))
    )


def exact_quantile_bucketed(
    grain: DataFrame,
    group_col: str,
    val_col: str,
    weight_col: str,
    num: int,
    den: int,
    bucket_width: float = 1024.0,
) -> DataFrame:
    """(group, q) — single-fraction convenience over
    :func:`exact_quantiles_bucketed`."""
    return exact_quantiles_bucketed(
        grain, group_col, val_col, weight_col, [num], den, bucket_width
    ).select(group_col, "q")
