"""Triangle block join — distributed exact all-pairs (SURVEY.md §2.5
E17/E18 exact contracts).

The shape for "compare every unordered pair" that survives scale-up:
no broadcast of the corpus, no BroadcastNestedLoopJoin, no cartesian.
Rows hash into ``B`` buckets; a row in bucket ``b`` is emitted once
per bucket-pair group it belongs to (left role: group (b, j) for
j ≥ b; right role: group (i, b) for i ≤ b), and a plain shuffle
EQUI-join on the (i, j) group key brings exactly the rows of buckets
i and j together. Every unordered pair meets in exactly ONE group
(same-bucket groups contain both orientations; one is kept by id
order), so the output is the exact pair set.

Cost model: each side shuffles B copies of its rows (keep the
projected row narrow — ids, counts, fingerprints, vectors), and the
O(n²) compare work splits into B(B+1)/2 independent, hash-balanced
key groups of (n/B)² pairs — even parallelism at any n, no skew by
construction. Raise B with cluster size: work per group shrinks as
B², replication only linearly.

Exact all-pairs is inherently quadratic — at true 100 TB the
near-dup answer is candidate generation (banded MinHash /
SimHash buckets / IVF cells in :mod:`calaspark.ops.lsh` and
:mod:`calaspark.ops.ann_ivf`); this operator is the plan when the
declared contract is EVERY qualifying pair.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def triangle_block_pairs(
    df: DataFrame, id_col: str, n_buckets: int = 8
) -> DataFrame:
    """All unordered pairs of ``df`` rows, each exactly once, as a
    joined frame aliased ``a`` / ``b`` (select with ``F.col("a.x")``
    / ``F.col("b.x")``). ``id_col`` must be unique; pair orientation
    within same-bucket groups follows id order, cross-bucket
    orientation follows bucket order — callers wanting a canonical
    (lo, hi) id pair use ``least``/``greatest``.
    """
    bucketed = df.withColumn(
        "_bkt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).cast("int")
    )
    a = (
        bucketed.withColumn(
            "_pj", F.explode(F.sequence(F.col("_bkt"), F.lit(n_buckets - 1)))
        )
        .withColumnRenamed("_bkt", "_pi")
        .alias("a")
    )
    b = (
        bucketed.withColumn(
            "_pi", F.explode(F.sequence(F.lit(0), F.col("_bkt")))
        )
        .withColumnRenamed("_bkt", "_pj")
        .alias("b")
    )
    return a.join(
        b,
        (F.col("a._pi") == F.col("b._pi")) & (F.col("a._pj") == F.col("b._pj")),
    ).filter(
        (F.col("a._pi") < F.col("a._pj"))
        | (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    )


def substring_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    max_df: int | None = None,
) -> DataFrame:
    """Document pairs sharing ≥1 exact ``window``-token substring,
    with the count of shared distinct windows — the decontamination /
    boilerplate-removal signal set-Jaccard never sees (documents can
    be set-dissimilar yet share verbatim passages).

    Plan: per-doc window fingerprints (md5 of the joined window, so a
    DuckDB oracle computes identical keys), ``array_distinct`` BEFORE
    the explode (a window repeated inside one doc cannot inflate pair
    counts), then a self-EQUI-join on the fingerprint — the standard
    inverted index a decontamination pass materializes once.

    ``max_df`` is the scale guard: a fingerprint appearing in more
    than ``max_df`` docs is dropped BEFORE the self-join (one
    groupBy + semi-shaped equi-join, no new plan pattern). Without
    it, one boilerplate window shared by f docs emits f² join rows
    through a single hot key — at 100 TB a ubiquitous header would
    be a straggler that never finishes, and those windows are
    boilerplate, not duplication signal. ``max_df=None`` keeps the
    exact uncapped contract (the q64 oracle form).
    """
    from .text import tokens

    w = window
    d = df.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("toks"))
    d = d.filter(F.size("toks") >= w)
    wins = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - (w - 1)),
            lambda i: F.md5(F.array_join(F.slice("toks", i, w), " ")),
        )
    )
    e = d.select("doc_id", F.explode(wins).alias("wh"))
    if max_df is not None:
        from .materialize import materialize

        # Three consumers read the inverted index when the cap is on
        # (the df groupBy + both self-join sides) — materialize it
        # once instead of re-tokenizing and re-hashing the corpus per
        # consumer. (doc_id, wh) is unique after array_distinct, so
        # COUNT(*) per wh IS the document frequency.
        e = materialize(e)
        keep = (
            e.groupBy("wh")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("wh")
        )
        e = e.join(keep, "wh")
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.wh") == F.col("b.wh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_windows"))
    )
