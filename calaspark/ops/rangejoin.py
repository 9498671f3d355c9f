"""Interval (range) join — the time-range join family Spark's
DataFrame API lacks as a primitive (SURVEY.md §2.5 E1; the reference
delegates range predicates to SQL consumers,
`calaccess_raw/models/base.py §CalAccessBaseModel.objects`).

Semantics: pair every left row with every right row sharing the
equi keys whose right timestamp falls in the half-open window
``[left_ts + lower, left_ts + upper)`` (offsets in seconds).

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

Composition notes: ``how`` is intentionally inner-only — outer
variants over an exploded left side would emit one null-extended row
per probed bin. Get left-outer semantics the scale-safe way: inner
interval join → aggregate → join back to the left table (q52 in
``calaspark/queries/extensions.py`` does exactly this).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
    on: tuple[str, ...] = (),
) -> DataFrame:
    """Inner-join rows where ``right[right_ts]`` is in
    ``[left[left_ts] + lower, left[left_ts] + upper)`` (seconds) and
    all ``on`` key columns match (same names both sides; the output
    keeps the left copy). Timestamp columns are compared at floored
    epoch-second resolution and must be named differently on the two
    sides (pre-alias if not).
    """
    span = int(upper) - int(lower)
    if span <= 0:
        raise ValueError(f"empty window: lower={lower} upper={upper}")
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct names")

    l_ep = F.unix_timestamp(F.col(left_ts).cast("timestamp"))
    r_ep = F.unix_timestamp(F.col(right_ts).cast("timestamp"))

    lo = l_ep + F.lit(int(lower))
    hi = l_ep + F.lit(int(upper))  # window is [lo, hi)
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
    rhs = right.withColumn("_bin", F.floor(r_ep / span)).alias("R")

    cond = F.col("L._bin") == F.col("R._bin")
    for k in on:
        cond = cond & (F.col(f"L.{k}") == F.col(f"R.{k}"))
    r_ep_r = F.unix_timestamp(F.col(f"R.{right_ts}").cast("timestamp"))
    cond = cond & (r_ep_r >= F.col("L._lo")) & (r_ep_r < F.col("L._hi"))

    out = lhs.join(rhs, cond, "inner")
    drop = [F.col("L._lo"), F.col("L._hi"), F.col("L._bin"), F.col("R._bin")]
    drop += [F.col(f"R.{k}") for k in on]
    return out.drop(*drop)
