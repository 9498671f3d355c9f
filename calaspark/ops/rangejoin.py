"""Interval (range) join — the time-range join family Spark's
DataFrame API lacks as a primitive (SURVEY.md §2.5 E1; the reference
delegates range predicates to SQL consumers,
`calaccess_raw/models/base.py §CalAccessBaseModel.objects`).

Semantics: pair every left row with every right row sharing the
equi keys whose right timestamp falls in the half-open window
``[left_ts + lower, left_ts + upper)`` (offsets in ``unit`` —
seconds by default, milliseconds with ``unit="ms"``).

Why not ``left.join(right, range_predicate)``: without an equi
condition Catalyst can only pick BroadcastNestedLoopJoin — the exact
cartesian blow-up that dies at scale (``tools/plan_audit.py`` flags
it). The standard distributed plan is **bin bucketing**:

- bin width ``B = upper - lower`` (the window span), so any window
  overlaps at most TWO consecutive bins;
- each right row lands in exactly ONE bin (``floor(ts / B)``) — the
  big side is never replicated;
- each left row explodes to the ≤2 bins its window touches
  (``sequence(floor((ts+lower)/B), floor((ts+upper-1)/B))``);
- a plain shuffle hash/sort-merge equi-join on ``(keys…, _bin)``
  meets candidates, and the exact range predicate filters residually.

A (left, right) pair can meet only in the one bin the right row
occupies, so the inner join emits no duplicates and needs no dedup.
Cost: one shuffle per side on a compound key whose cardinality is
``|keys| × time-span/B`` — co-partitioned, skew-salvageable, AQE-
splittable; replication factor ≤ 2 on the LEFT side only. This is
the plan that survives 100 TB of events where a theta join cannot.

Outer semantics (``how="left"``): a naive outer join over the
exploded left side would emit one null-extended row per PROBED BIN
(up to two per unmatched left row), so the outer variant is instead
composed scale-safely: inner interval join ∪ (left rows anti-joined
on a caller-named unique ``left_id``, null-extended on the right
columns). Both legs are shuffle equi-joins; no BNLJ appears. The
aggregate-then-join-back composition (q52 in
``calaspark/queries/extensions.py``) remains the right shape when
the consumer wants per-left aggregates rather than pairs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: offset unit → epoch extractor (integer, floored at that resolution)
_EPOCH = {
    "s": lambda c: F.unix_timestamp(c),
    "ms": lambda c: F.unix_millis(c),
}


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
    on: tuple[str, ...] = (),
    how: str = "inner",
    left_id: str | None = None,
    unit: str = "s",
) -> DataFrame:
    """Join rows where ``right[right_ts]`` is in
    ``[left[left_ts] + lower, left[left_ts] + upper)`` and all ``on``
    key columns match (same names both sides; the output keeps the
    left copy). Offsets are integers in ``unit`` ("s" epoch-second
    floor — the default, "ms" epoch-millisecond floor for sub-second
    windows). Timestamp columns must be named differently on the two
    sides (pre-alias if not); non-key column names should be disjoint.

    ``how="inner"`` (default) emits matched pairs. ``how="left"``
    additionally keeps unmatched left rows with the right-side
    columns null — requires ``left_id``, the name of a UNIQUE left
    key column, for the scale-safe anti-join composition documented
    in the module docstring.
    """
    span = int(upper) - int(lower)
    if span <= 0:
        raise ValueError(f"empty window: lower={lower} upper={upper}")
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct names")
    if unit not in _EPOCH:
        raise ValueError(f"unit must be one of {sorted(_EPOCH)}: {unit!r}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left': {how!r}")
    if how == "left" and not left_id:
        raise ValueError("how='left' requires left_id (unique left key)")

    def epoch(name: str) -> Column:
        return _EPOCH[unit](F.col(name).cast("timestamp"))

    lo = epoch(left_ts) + F.lit(int(lower))
    hi = epoch(left_ts) + F.lit(int(upper))  # window is [lo, hi)
    lhs = (
        left.withColumn("_lo", lo)
        .withColumn("_hi", hi)
        .withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    F.floor(F.col("_lo") / span),
                    F.floor((F.col("_hi") - 1) / span),
                )
            ),
        )
        .alias("L")
    )
    rhs = right.withColumn("_bin", F.floor(epoch(right_ts) / span)).alias("R")

    cond = F.col("L._bin") == F.col("R._bin")
    for k in on:
        cond = cond & (F.col(f"L.{k}") == F.col(f"R.{k}"))
    r_ep = _EPOCH[unit](F.col(f"R.{right_ts}").cast("timestamp"))
    cond = cond & (r_ep >= F.col("L._lo")) & (r_ep < F.col("L._hi"))

    out = lhs.join(rhs, cond, "inner")
    drop = [F.col("L._lo"), F.col("L._hi"), F.col("L._bin"), F.col("R._bin")]
    drop += [F.col(f"R.{k}") for k in on]
    pairs = out.drop(*drop)
    if how == "inner":
        return pairs

    # Left-outer leg: the unmatched left rows, right columns typed-null.
    r_only = [f for f in right.schema.fields if f.name not in on]
    unmatched = left.join(pairs.select(left_id), left_id, "left_anti").select(
        "*", *[F.lit(None).cast(f.dataType).alias(f.name) for f in r_only]
    )
    return pairs.unionByName(unmatched)
