"""Count-min sketch (Cormode & Muthukrishnan 2005, public
literature) as a DataFrame operator — the mergeable FREQUENCY sketch
beside HLL's cardinality sketch (SURVEY §2 E14): a (depth × width)
counter table answers "how often did key k occur?" within a
one-sided error (estimates only ever OVER-count; the min over depth
rows bounds the collision inflation by ~Σcounts/width w.h.p.).

Spark shape: the sketch IS a tiny DataFrame aggregate —
``groupBy(hash_row, bucket).count()`` over a depth-way explode of
the key stream. Counters are bounded state (depth·width rows, a
constant), map-side partials absorb the corpus, and two sketches
merge by unioning counter tables and summing — the same
mergeability contract the streaming Misra-Gries path (ops/heavy.py)
documents, here in its classic sublinear-memory form. Point lookups
broadcast the (tiny) query key set against the counter table.

When to use which (both measured, never asserted — the sketch_error
discipline): exact heavy hitters (q113) when you need exact counts
for the FEW biggest keys; CMS when you need O(1)-state approximate
counts for ARBITRARY keys at any scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def cms_counters(
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build the (d, bucket, cnt) counter table from a key stream
    (one input row = one occurrence). Each of the ``depth`` rows
    hashes the key with a different seed (``xxhash64(d, key)``);
    bucket = hash pmod width. depth·width rows of bounded state.
    """
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    d = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d")
    rows = keys.select(F.col(key_col).alias("_k")).select(d, "_k")
    return (
        rows.select(
            "d",
            F.pmod(F.xxhash64("d", "_k"), F.lit(width)).alias("bucket"),
        )
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    counters: DataFrame,
    query_keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(key, est) — the CMS point estimate min over depth rows for
    each distinct key in ``query_keys``. The query side is hashed
    with the SAME seeds and broadcast (query sets are model-sized;
    the counter table is constant-sized anyway); absent buckets
    read as 0 via the left join.
    """
    d = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d")
    q = (
        query_keys.select(F.col(key_col).alias("_k"))
        .distinct()
        .select(d, "_k")
        .select(
            "_k",
            "d",
            F.pmod(F.xxhash64("d", "_k"), F.lit(width)).alias("bucket"),
        )
    )
    return (
        F.broadcast(q)
        .join(counters, ["d", "bucket"], "left")
        .groupBy("_k")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
        .select(F.col("_k").alias(key_col), "est")
    )
