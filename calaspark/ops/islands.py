"""Distributed gaps-and-islands over an integer key column.

``islands(df, key)``: group the distinct values of an integer key
into maximal runs of consecutive values ("islands"), returning one
row per island with ``start_key / end_key / n_keys``. The classic
single-node SQL idiom is ``k - ROW_NUMBER() OVER (ORDER BY k)`` — a
global window over ONE partition, which is exactly the plan you must
not ship at 100 TB (every key funnels through a single task).

The distributed plan here keeps the whole computation partitioned:

1. **Bucket** keys by ``k div B`` (B = ``bucket_size``). Runs are
   detected *within* each bucket with a per-bucket window
   (``lag`` over ``PARTITION BY bucket ORDER BY k``) — fully
   parallel, each bucket is an independent task.
2. **Split** the per-bucket islands into *interior* islands (touch
   neither bucket edge — already maximal, because extending across a
   bucket boundary requires the island to contain the edge key) and
   *boundary* islands (start at ``b*B`` and/or end at ``b*B+B-1``).
   At most 2 boundary islands exist per non-empty bucket, so the
   boundary set is ~``2 * n_keys / B`` rows — model-sized for any
   sane B.
3. **Stitch** boundary islands with one more lag-window pass
   (adjacent intervals with ``start == prev_end + 1`` merge). This
   pass runs on the tiny boundary set only; a single partition there
   is legitimate driver-scale state, not a data-scale bottleneck —
   the same shape as IVF centroids or connected-components
   convergence probes elsewhere in this repo.

Result ≡ the naive global-window islands (property-tested in
``tests/test_ops.py`` against randomized key sets, including islands
spanning many buckets).

Reference anchor: the reference has no islands operator (its surface
is Django ORM lookups, SURVEY.md §2.3); this is E24-adjacent scale
engineering for the sequence-integrity checks (gap detection over
``FILING_ID`` ranges) its users run downstream of a load.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def islands(df: DataFrame, key: str, bucket_size: int = 4096) -> DataFrame:
    """Maximal consecutive-integer runs of ``df[key]`` (distinct).

    Returns columns ``start_key, end_key, n_keys`` (all bigint).
    ``n_keys == end_key - start_key + 1`` by construction (keys are
    deduplicated before run detection). Negative keys are handled:
    the bucket id is a FLOOR division (``div`` alone truncates
    toward zero, which would make negative keys straddle bucket
    boundaries), so every bucket spans exactly
    ``[_b*B, _b*B + B - 1]`` for any sign of ``k``.
    """
    if bucket_size < 1:
        raise ValueError(f"bucket_size must be >= 1, got {bucket_size}")
    B_ = int(bucket_size)
    k = df.select(F.col(key).cast("long").alias("k")).distinct()
    # floor division for all signs: shift the remainder first
    b = k.withColumn("_b", F.expr(f"(k - pmod(k, {B_})) div {B_}"))

    # Stage 1: runs WITHIN each bucket (parallel windows).
    w = Window.partitionBy("_b").orderBy("k")
    new_run = (
        F.when(F.lag("k").over(w).isNull(), 1)
        .when(F.lag("k").over(w) != F.col("k") - 1, 1)
        .otherwise(0)
    )
    runs = (
        b.withColumn("_new", new_run)
        .withColumn(
            "_rid",
            F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("_b", "_rid")
        .agg(F.min("k").alias("start_key"), F.max("k").alias("end_key"))
    )

    # Stage 2: interior islands are already maximal.
    B = int(bucket_size)
    lo = F.col("_b") * B
    hi = F.col("_b") * B + (B - 1)
    touches = (F.col("start_key") == lo) | (F.col("end_key") == hi)
    interior = runs.filter(~touches).select("start_key", "end_key")
    boundary = runs.filter(touches).select("start_key", "end_key")

    # Stage 3: stitch the (tiny) boundary set across buckets.
    ws = Window.orderBy("start_key")
    stitched = (
        boundary.withColumn(
            "_new",
            F.when(F.lag("end_key").over(ws).isNull(), 1)
            .when(F.lag("end_key").over(ws) != F.col("start_key") - 1, 1)
            .otherwise(0),
        )
        .withColumn(
            "_gid",
            F.sum("_new").over(ws.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("_gid")
        .agg(F.min("start_key").alias("start_key"), F.max("end_key").alias("end_key"))
        .select("start_key", "end_key")
    )

    out = interior.unionByName(stitched)
    return out.select(
        "start_key",
        "end_key",
        (F.col("end_key") - F.col("start_key") + F.lit(1)).alias("n_keys"),
    )
