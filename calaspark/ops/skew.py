"""Skew mitigation + co-location operators (SURVEY.md §2.5 E24; the
100 TB join toolbox the brief calls out explicitly).

Three tools, in preference order:

1. **AQE skew-join** (free): ``spark.sql.adaptive.skewJoin.enabled``
   is on in :func:`calaspark.session.get_spark` — oversized shuffle
   partitions are split at runtime. Use it first; it needs no code.
2. **Salted join** (:func:`salted_join`): when AQE can't help (e.g.
   a broadcast is impossible and one key dominates), explode the
   small side into N salt replicas and scatter the big side's hot
   keys across N subpartitions. Deterministic results; N× small-side
   duplication is the price.
3. **Bucketed tables** (:func:`write_bucketed`): pre-shuffle once at
   write time; every later equi-join/agg on the bucket key runs
   shuffle-free (see tests/test_scale.py for the plan assertion).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's per-key skew scattered N ways.

    big gains a deterministic salt in [0, N) — hash of its OTHER
    columns would be ideal; a hash of the key + a per-row offset is
    enough to scatter, here `pmod(xxhash64(key, monotonic row
    marker), N)` is replaced by a cheap spray on the key's hash and
    a row-local component (`spark_partition_id`) so rows of one hot
    key spread across salts without an RNG (determinism: results are
    join results either way — salting changes placement, not output).

    small is exploded N× so every (key, salt) pair exists. Join key
    becomes (key, salt): one shuffle, hot keys now occupy N
    partitions instead of one.

    ``how`` is restricted to join types where the exploded small side
    cannot leak duplicates: for right/full outer joins every UNMATCHED
    small-side row would be emitted once per salt replica (N copies).
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched small-side "
            f"rows n_salts times (small side is exploded {n_salts}x); "
            f"allowed: {sorted(allowed)}. For right/full outer, swap sides "
            "or de-dup after an unsalted join."
        )
    salt_col = F.pmod(
        F.xxhash64(F.col(key), F.spark_partition_id()), F.lit(n_salts)
    ).cast("int")
    b = big.withColumn("_salt", salt_col)
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = b.join(s, [key, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (+ sorted) managed table: the one-time
    shuffle that makes every later join/agg on ``key`` exchange-free.
    Requires a session with a warehouse dir (any get_spark session).
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)
