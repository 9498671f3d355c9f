"""SemDeDup-style semantic deduplication (Abbas et al., "SemDeDup:
Data-efficient learning at web-scale through semantic deduplication",
2023 — public literature): cluster embeddings with a k-means coarse
quantizer, run exact cosine comparisons ONLY inside each cluster, and
keep one representative per near-duplicate group.

Contract vs the exact family: :func:`calaspark.ops.pairs.
grid_cosine_pairs` guarantees recall 1 (triangle-bound blocking);
SemDeDup trades recall for cluster-bounded compare work — a
qualifying pair whose members quantize into DIFFERENT cells is
missed by design (raise ``n_cells`` ↔ recall ↔ cost; the published
method accepts this, and tests pin the within-cell stage exact).

Scale shape (SURVEY §2.5 dedup endgame): quantizer training is
model-sized (ops/ann_ivf — Arrow matmul over sampled batches);
assignment is one scan; the intra-cell self-join runs on a NARROW
flat projection (ids, cell, prefix coords — never the dim-sized
arrays, the q73/pairs.py measured rule) with salted join groups so
parallelism is not capped at the cell count; survivors re-fetch
vectors by id for the exact verify; clustering the survivor pairs is
:func:`calaspark.ops.components.dedup_clusters` (log-diameter star
contraction). Nothing is all-pairs, nothing collects data-sized
state.

Reference anchor: the reference has no vector ops (SURVEY §2 —
Django ORM ETL); this module is north-star pipeline scope (§2.5).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .components import dedup_clusters


def _dot(x, y):
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p * q),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def semdedup_pairs(
    inv: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "e",
    cell_col: str = "cell",
    prefilter_dims: int = 16,
    n_salts: int = 8,
    slack: float = 1e-6,
) -> DataFrame:
    """Exact cosine near-dup pairs (sim ≥ ``threshold``) WITHIN each
    cell of a cell-assigned embedding table ``inv`` (e.g.
    :func:`calaspark.ops.ann_ivf.ivf_assign` output).

    The join condition stages cheap-to-expensive inside one codegen
    span (the pairs.py discipline): equi (cell, salt) hash keys, id
    order, then the staged partial-distance prefilter — for unit
    vectors ``cos ≥ τ ⟺ ‖â−b̂‖² ≤ 2−2τ``, and the partial sum over
    the first k coordinates is a necessary bound since omitted terms
    are nonnegative. Survivors re-fetch full vectors by id and run
    the index-ordered exact fold.

    ``prefilter_dims`` must not exceed the embedding dimension (the
    prefix coordinates are plain array indexes — out-of-bounds
    errors loudly, by design, rather than silently weakening the
    bound).
    """
    w2 = (2.0 - 2.0 * threshold) * (1.0 + slack)
    nrm = F.sqrt(_dot(F.col(vec_col), F.col(vec_col)))
    pts = inv.select(
        F.col(id_col).alias("_id"),
        F.col(cell_col).alias("_cell"),
        F.col(vec_col).alias("_e"),
        nrm.alias("_n"),
    ).filter(F.col("_n") > 0)
    narrow = pts.select(
        "_id",
        "_cell",
        *[
            (F.col("_e")[i] / F.col("_n")).alias(f"_u{i}")
            for i in range(prefilter_dims)
        ],
    )
    # NOTE (round-17): an explicit pinned repartition on the
    # (salt, cell) equi key — the grid_cosine_pairs fix — was tried
    # here and MEASURED WORSE (4.8 s → 8.3 s at sf0.1): this
    # operator's materialized input already carries enough partitions
    # that the compare join parallelizes, so the forced shuffle of
    # both prefilter-column sides plus the inflated downstream
    # partition counts only added cost. Reverted; left alone.
    a = narrow.select(
        F.col("_id").alias("id_a"),
        F.col("_cell").alias("_ca"),
        F.pmod(F.xxhash64("_id"), F.lit(n_salts)).cast("int").alias("_salt"),
        *[F.col(f"_u{i}").alias(f"_ua{i}") for i in range(prefilter_dims)],
    )
    b = narrow.withColumn(
        "_salt", F.explode(F.array(*[F.lit(s) for s in range(n_salts)]))
    ).select(
        F.col("_id").alias("id_b"),
        F.col("_cell").alias("_cb"),
        "_salt",
        *[F.col(f"_u{i}").alias(f"_ub{i}") for i in range(prefilter_dims)],
    )
    cond = (
        (F.col("a._salt") == F.col("b._salt"))
        & (F.col("a._ca") == F.col("b._cb"))
        & (F.col("a.id_a") < F.col("b.id_b"))
    )
    for k in (prefilter_dims // 2, prefilter_dims):
        if k == 0:
            continue
        pdist = F.lit(0.0)
        for i in range(k):
            d = F.col(f"a._ua{i}") - F.col(f"b._ub{i}")
            pdist = pdist + d * d
        cond = cond & (pdist <= F.lit(w2))
    surv = a.alias("a").join(b.alias("b"), cond).select(
        "id_a", "id_b", F.col("a._ca").alias("cell")
    )
    va = pts.select(
        F.col("_id").alias("id_a"),
        F.col("_e").alias("ea"),
        F.col("_n").alias("na"),
    )
    vb = pts.select(
        F.col("_id").alias("id_b"),
        F.col("_e").alias("eb"),
        F.col("_n").alias("nb"),
    )
    sim = _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        surv.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("sim", sim)
        .filter(F.col("sim") >= F.lit(threshold))
        .select("id_a", "id_b", "cell", "sim")
    )


def semdedup(
    emb: DataFrame,
    n_cells: int = 16,
    iters: int = 2,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "e",
    prefilter_dims: int = 16,
    train_sample_mod: int | None = None,
    centroids=None,
) -> DataFrame:
    """End-to-end SemDeDup: train the coarse quantizer, assign every
    vector to its cell, find within-cell near-dup pairs, cluster
    them, and elect the minimum-id survivor per cluster.

    ``train_sample_mod``: when set, the quantizer trains on the
    deterministic hash sample ``xxhash64(id) % mod == 0`` instead of
    the full corpus — the standard at-scale recipe (a coarse
    quantizer needs representative cell SHAPES, not every point; at
    100 TB a full-corpus Lloyd pass per iteration is the dominant
    cost for no recall benefit, since correctness comes from the
    exact verify, not the clustering). Assignment still covers every
    vector.

    ``centroids``: a pre-trained (k × dim) quantizer to reuse —
    corpus-level MODEL state, the ann_ivf build/probe discipline:
    train once per corpus, reuse across dedup invocations (repeated
    pipeline runs over the same snapshot retrain nothing).

    Returns (id, cell, cluster, is_canonical) — filter
    ``is_canonical = 1`` for the semantically deduplicated corpus.
    """
    from .ann_ivf import ivf_assign, train_ivf_centroids
    from .materialize import materialize

    # Assignment feeds BOTH join roles and the survivor re-fetch —
    # materialize so the upstream (and quantizer assignment matmul)
    # computes once (the q94/q95 shared-table rule).
    e = materialize(emb.select(id_col, vec_col))
    if centroids is not None:
        cents = centroids
    else:
        train = (
            e.filter(
                F.pmod(
                    F.xxhash64(F.col(id_col).cast("long")), train_sample_mod
                )
                == 0
            )
            if train_sample_mod
            else e
        )
        cents = train_ivf_centroids(train, n_cells, iters, id_col, vec_col)
    inv = materialize(ivf_assign(e, cents, id_col, vec_col))
    pairs = semdedup_pairs(
        inv,
        threshold=threshold,
        id_col=id_col,
        vec_col=vec_col,
        prefilter_dims=prefilter_dims,
    )
    out = dedup_clusters(
        pairs, inv.select(id_col), id_col, src="id_a", dst="id_b"
    )
    return out.join(
        inv.select(F.col(id_col), F.col("cell").cast("int").alias("cell")),
        id_col,
    ).select(id_col, "cell", "cluster", "is_canonical")
