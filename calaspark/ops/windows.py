"""Reusable window-function operators (SURVEY.md §2.4 R10, §2.5 E3/E16).

`latest_per_key` is the engine's twin of the reference's
"latest amendment wins" convention — consumers of CAL-ACCESS keep the
max `AMEND_ID` row per `FILING_ID` (`calaccess_raw/models/base.py
§UNIQUE_KEY` encodes it; the reference itself delegates the query to
SQL). Here it is a first-class distributed operator.

Scale notes: one shuffle on the partition keys; Spark's window exec
sorts within partitions (spillable UnsafeExternalSorter). For a
100 TB CDC table, partitionBy(key) is the natural layout so the
shuffle is the unavoidable minimum. `row_number` + filter(rn=1) gets
optimized to a TopK-per-group (WindowGroupLimit) physical node in
Spark 3.5+/4.x, so it does NOT materialize full sorted groups.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def topk_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rn_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group under a total (deterministic) order."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rn_col, F.row_number().over(w)).filter(F.col(rn_col) <= k)


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    version_cols: Sequence[Column],
) -> DataFrame:
    """Keep the single latest row per key (CDC / latest-amendment).

    ``version_cols`` must define a total order within each key group
    (pass a tie-breaker, e.g. ``[F.col("amend_id").desc(),
    F.col("filing_id").desc()]``) or the result is nondeterministic.
    """
    return topk_per_group(df, keys, version_cols, 1).drop("rn")


def running(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    agg: Column,
    alias: str,
) -> DataFrame:
    """Running aggregate over rows UNBOUNDED PRECEDING..CURRENT ROW."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(alias, agg.over(w))
