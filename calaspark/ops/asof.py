"""As-of join — the canonical "operator Spark lacks" (brief §custom
operators; DuckDB/Pandas/kdb have it natively, Spark does not).

``asof_join(left, right)``: for every left row, attach the single
most recent right row for the same key with ``right.ts <= left.ts``
(backward as-of). The naive formulation is a range theta-join +
per-left-row argmax — quadratic per key. The Spark-native plan here
is the UNION-SENTINEL pattern:

1. tag and union both sides (right rows carry their payload, left
   rows carry NULL payload),
2. one window per key ordered by (ts, tag) with a single
   ``last(struct(payload...), ignorenulls=True)`` over UNBOUNDED
   PRECEDING..CURRENT ROW — each left row picks up the latest right
   row's payload ATOMICALLY (the whole struct comes from one right
   row, so a NULL payload column in the matched right row stays NULL
   instead of being back-filled from an older right row),
3. filter back to left rows and unpack the struct.

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

    # Pack the whole right payload into ONE struct column so the window's
    # single last(ignorenulls=True) attaches the matched right row
    # atomically. Per-column last() would skip a legitimately-NULL payload
    # column in the most recent right row and stitch values from DIFFERENT
    # right rows — wrong for nullable payloads.
    lhs = left.withColumn("_tag", F.lit(1)).withColumn("_ats", F.col(left_ts))
    rhs = right.withColumn("_tag", F.lit(0)).withColumn("_ats", F.col(right_ts))
    tb = [F.col(tiebreak).alias("_tb")] if tiebreak is not None else []
    rhs_pack = rhs.select(
        key,
        "_ats",
        "_tag",
        F.struct(*[F.col(c) for c in payload]).alias("_payload"),
        *tb,
    )
    lhs_all = lhs.select(
        *left.columns,
        "_ats",
        "_tag",
        F.lit(None).cast(rhs_pack.schema["_payload"].dataType).alias("_payload"),
        *([F.lit(None).alias("_tb")] if tiebreak is not None else []),
    )
    u = lhs_all.unionByName(rhs_pack, allowMissingColumns=True)

    order = [F.col("_ats").asc(), F.col("_tag").asc()]
    if tiebreak is not None:
        # only orders right rows among themselves at equal ts (left
        # rows all carry NULL and already sort after right via _tag)
        order.append(F.col("_tb").asc_nulls_first())
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*", F.last("_payload", ignorenulls=True).over(w).alias("_asof")
    )
    out = filled.filter(F.col("_tag") == 1).select(
        *left.columns,
        *[F.col(f"_asof.{c}").alias(c) for c in payload],
    )
    return out
