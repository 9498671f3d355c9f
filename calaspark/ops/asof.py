"""As-of join — the canonical "operator Spark lacks" (brief §custom
operators; DuckDB/Pandas/kdb have it natively, Spark does not).

``asof_join(left, right)``: for every left row, attach the single
most recent right row for the same key with ``right.ts <= left.ts``
(backward as-of). The naive formulation is a range theta-join +
per-left-row argmax — quadratic per key. The Spark-native plan here
is the UNION-SENTINEL pattern:

1. tag and union both sides (right rows carry their payload, left
   rows carry NULL payload),
2. one window per key ordered by (ts, tag) with
   ``last(payload, ignorenulls=True)`` over UNBOUNDED PRECEDING..
   CURRENT ROW — each left row picks up the latest right payload at
   or before it,
3. filter back to left rows.

Cost: ONE shuffle on the key + an in-partition sort — the same as
any window, linear in |left|+|right|, no join explosion, AQE-safe.
At 100 TB this is the plan you want: as-of degenerate joins via
ranges explode; via union+window they stream.

Tie rule: right rows sort BEFORE left rows at equal ts (tag 0 < 1),
so a right row exactly at ``left.ts`` matches — same as DuckDB's
``ASOF JOIN ... ON l.ts >= r.ts`` (the oracle in queries q42).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: list[str] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join, union-sentinel plan (see module doc).

    ``payload``: right columns to attach (default: all except key/ts).
    ``tiebreak``: right column ordering equal-ts right rows among
    themselves (latest wins); required for determinism if right can
    hold duplicate (key, ts) pairs.
    """
    if payload is None:
        payload = [c for c in right.columns if c not in (key, right_ts)]

    lhs = left.withColumn("_tag", F.lit(1)).withColumn("_ats", F.col(left_ts))
    rhs = right.withColumn("_tag", F.lit(0)).withColumn("_ats", F.col(right_ts))
    rhs_cols = [key, "_ats", "_tag"] + payload
    lhs_all = lhs.select(
        *left.columns, "_ats", "_tag", *[F.lit(None).alias(c) for c in payload]
    )
    u = lhs_all.unionByName(rhs.select(*rhs_cols), allowMissingColumns=True)

    order = [F.col("_ats").asc(), F.col("_tag").asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc_nulls_first())
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*",
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in payload
        ],
    )
    out = filled.filter(F.col("_tag") == 1).select(
        *left.columns,
        *[F.col(f"_asof_{c}").alias(c) for c in payload],
    )
    return out
