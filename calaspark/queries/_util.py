"""Shared helpers enforcing SURVEY.md §2.6 determinism rules.

Rule 1 (money): aggregate in exact decimal, round, cast to double.
Rule 2 (timestamps): never emit a raw timestamp — format or epoch.
Rule 4 (averages): decimal SUM / COUNT, divided in double.

All the money/value columns in the testdata are 2-decimal-clean
doubles (verified against the parquet footers), so the decimal casts
below are exact in both Spark and DuckDB and the resulting sums are
associative — hash-stable regardless of partitioning or AQE plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

#: Exact decimal type for 2-decimal money columns (max |value| < 1e6
#: per row; sums widen to DECIMAL(38,_) automatically in both engines).
MONEY = "decimal(12,2)"
#: For small rates (discount/tax, 0.00–0.10).
RATE = "decimal(6,4)"


def dec(col: str | Column, typ: str = MONEY) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def money_sum(col: str | Column, alias: str) -> Column:
    """SUM in exact decimal → ROUND(.,2) → DOUBLE (rule 1)."""
    return F.round(F.sum(dec(col)), 2).cast("double").alias(alias)


def money_avg(col: str | Column, alias: str) -> Column:
    """Decimal SUM / COUNT, division in double (rule 4)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c)).cast("double") / F.count(c).cast("double")).alias(alias)


def as_date(col: str) -> Column:
    return F.col(col).cast("date")


def ts_str(col: str | Column, alias: str | None = None) -> Column:
    """Second-precision wall-clock string of a TIMESTAMP_NTZ column."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.date_format(c, "yyyy-MM-dd HH:mm:ss")
    return out.alias(alias) if alias else out
