"""Connected components over a pair graph — the dedup endgame
(SURVEY.md §2.5 E15/E17 composition).

Near-dup detection yields PAIRS; deduplication needs CLUSTERS (keep
one canonical doc per group of mutual near-dups). That is connected
components on the similarity graph. Spark has no built-in; this
implements ALTERNATING STAR CONTRACTION (the large-star /
small-star algorithm of Kiveris et al., "Connected Components in
MapReduce and Beyond", ACM SoCC'14 — public literature):

    large-star: every neighbor of n LARGER than n re-attaches to
                min(Γ(n) ∪ {n})
    small-star: every neighbor of n not larger than n (and n
                itself) re-attaches to min(Γ≤(n) ∪ {n})

Each phase is one groupBy(min) + one equi-join; alternation
converges in O(log²) rounds to vertex-disjoint STARS rooted at each
component's minimum (the bigger→smaller edge orientation forces the
root to be the star minimum, and both phases preserve
connectivity). Two structural wins over plain min-label
propagation: the edge set SHRINKS every round (after one
alternation most edges already point at roots, so later rounds
touch ~V rows, not 2E+V), and rounds scale with log diameter, not
diameter. Lineage is cut each round via
:func:`calaspark.ops.materialize.materialize` (reliable
``checkpoint()`` when the session has a checkpoint dir, else
``localCheckpoint``) or the plan tree grows exponentially (the
classic iterative-DataFrame trap at scale).

This is an honest iterative-algorithm demo: driver-side loop, but
each step is fully distributed and the loop count is bounded by
log² of component size, not data size.
"""

from __future__ import annotations

import warnings

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .materialize import materialize


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(vertex, component) with component = min vertex id reachable.

    ``edges`` is undirected input (each pair once, either order).
    Deterministic: star contraction's min choices are
    order-independent.

    Warns (without truncating the partial result) if the edge set
    has not converged to stars after ``max_iter`` alternations — a
    pathological graph would otherwise return silently-wrong
    components with no signal to the caller.
    """
    # Materialize the raw edge list FIRST: an expensive edges
    # lineage (e.g. an LSH candidate join) computes ONCE; the vertex
    # universe and the canonical edge set both read the materialized
    # blocks.
    raw = materialize(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    )
    verts = raw.select(F.col("a").alias("v")).unionAll(
        raw.select(F.col("b").alias("v"))
    ).distinct()
    # Canonical bigger→smaller orientation, self-pairs dropped. NO
    # distinct / materialize here: duplicate edges change no min and
    # round 0's own distinct collapses them — pre-shuffling the full
    # edge list once more would only add a shuffle. Both phases
    # preserve the orientation (every emitted edge (n, m) has m
    # strictly below n).
    e = raw.filter(F.col("a") != F.col("b")).select(
        F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
    )

    def is_star_set(df: DataFrame) -> bool:
        # EXACT convergence test (one alternation leaves a star set
        # unchanged, and only star sets survive both phases): edges
        # are vertex-disjoint stars ⟺ no vertex is both a source
        # and a target (depth 1) AND every source has one target.
        # Both phases preserve components and orient bigger→smaller,
        # so stars ⟹ root = component minimum. ONE probe job (union
        # + groupBy + limit 1) on the materialized
        # (post-contraction, ≈vertex-sized) edge set. (A set-
        # stability fingerprint — stop when (count, xor-hash) of
        # consecutive rounds agree — was measured as the
        # alternative: it removes the probe jobs but detects the
        # fixed point one full alternation LATER, which costs more
        # than the probes it saves; rejected.)
        roles = df.select(
            F.col("u").alias("id"), F.lit(1).alias("s"), F.lit(0).alias("t")
        ).unionAll(
            df.select(F.col("v").alias("id"), F.lit(0).alias("s"), F.lit(1).alias("t"))
        )
        bad = (
            roles.groupBy("id")
            .agg(F.sum("s").alias("n_src"), F.max("t").alias("any_tgt"))
            .filter(
                (F.col("n_src") > 1)
                | ((F.col("n_src") > 0) & (F.col("any_tgt") > 0))
            )
            .limit(1)
            .count()
        )
        return bad == 0

    converged = False
    for it in range(max_iter):
        # ---- large-star: emit (nbr, m) for every nbr > n, where
        # m = min(Γ(n) ∪ {n}); one undirected edge → one output row.
        sym = e.unionAll(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
        # NO distinct here (round-17: one Exchange per round removed):
        # duplicate (u, v) rows — two centers re-attaching the same
        # neighbor to the same min — change neither mins2's MIN nor
        # the e2 set, because the small-star groupBy dedups map-side
        # and e2 keeps its own distinct. Volume is bounded by |sym|
        # (each sym row emits ≤ 1 row), so the multiset never exceeds
        # what the removed shuffle itself had to carry.
        e1 = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(
                F.col("v").alias("u"),
                F.least("mn", F.col("u")).alias("v"),
            )
        )
        # ---- small-star: per source n (all targets below n), emit
        # (t, m) for t ∈ targets(n) ∪ {n}, t ≠ m, m = min target.
        mins2 = e1.groupBy("u").agg(F.min("v").alias("mn"))
        rewired = (
            e1.join(mins2, "u")
            .filter(F.col("v") != F.col("mn"))
            .select(F.col("v").alias("u"), F.col("mn").alias("v"))
        )
        e2 = materialize(
            rewired.unionAll(mins2.select("u", F.col("mn").alias("v")))
            .distinct()
        )
        e = e2
        # Skip the probe on the first two rounds: a non-trivial
        # graph cannot contract to vertex-disjoint stars in fewer
        # than two alternations (round 0 leaves depth-2 chains
        # wherever two stars share their minimum through a non-root;
        # measured on the LSH representative graph: star at round 2,
        # never earlier), so probing there is a guaranteed-false job
        # ×2 per call. If the INPUT was already a star set, the
        # skipped probes cost two no-op alternations on a
        # vertex-sized edge set — cheaper than probing every round.
        # The final permitted round always probes so a small
        # ``max_iter`` cannot yield a false non-convergence warning.
        if (it >= 2 or it == max_iter - 1) and is_star_set(e):
            converged = True
            break
    if not converged:
        warnings.warn(
            f"connected_components did not converge in max_iter={max_iter} "
            "alternations; labels are a partial contraction — raise "
            "max_iter",
            RuntimeWarning,
            stacklevel=2,
        )
    # Final stars: source → root; roots and isolated vertices (e.g.
    # self-pair input) label themselves. On a CONVERGED star set the
    # probe has just proven one target per source, so the
    # min-aggregate is skipped outright (round-17: one shuffle per
    # call removed); it is kept only for the unconverged partial
    # result, where it keeps the output one-row-per-vertex.
    star = e.select(F.col("u").alias("v"), F.col("v").alias("comp"))
    if not converged:
        star = star.groupBy("v").agg(F.min("comp").alias("comp"))
    return verts.join(star, "v", "left").select(
        F.col("v").alias("vertex"),
        F.coalesce("comp", F.col("v")).alias("comp"),
    )


def dedup_clusters(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Cluster near-dup pairs and elect the canonical survivor
    (min id) per cluster; singletons survive as themselves.

    Output: (id, cluster, is_canonical) — filter is_canonical for
    the deduplicated corpus.
    """
    comp = connected_components(pairs, src, dst)
    out = (
        all_ids.select(F.col(id_col).alias("vertex"))
        .join(comp, "vertex", "left")
        .select(
            F.col("vertex").alias(id_col),
            F.coalesce("comp", F.col("vertex")).alias("cluster"),
        )
    )
    return out.withColumn(
        "is_canonical", (F.col(id_col) == F.col("cluster")).cast("int")
    )


def pointer_jump_depths(
    parents: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent",
    max_doublings: int = 6,
) -> DataFrame:
    """(id, root, depth) for a forest given as child→parent pointers —
    hierarchy flattening by POINTER JUMPING (path doubling), the
    log-depth alternative to one-join-per-level BFS.

    Roots self-loop (``parent == id``) and get depth 0. State rows
    are ``(id, anc, d)`` = "anc is my ancestor, d hops up"; each
    round joins the state with itself on ``anc = id`` to compose
    pointers, DOUBLING the reachable distance: after k rounds every
    node whose depth ≤ 2^k has collapsed onto its root (root rows
    are (r, r, 0) fixpoints, so composition past the root adds 0).
    ``max_doublings`` rounds handle depth ≤ 2^max_doublings — 6
    covers depth 64, i.e. any ternary-ish hierarchy below ~3⁶⁴
    nodes; raise it for pathological chain-shaped data (the property
    test drives a pure chain).

    At scale: each round is ONE self equi-join of an (id, anc, d)
    triple — log(depth) shuffles total vs depth shuffles for naive
    BFS; lineage is cut per round (same discipline as
    :func:`connected_components`).
    """
    state = materialize(
        parents.select(
            F.col(id_col).alias("id"),
            F.col(parent_col).alias("anc"),
            F.when(F.col(parent_col) == F.col(id_col), F.lit(0))
            .otherwise(F.lit(1))
            .cast("int")
            .alias("d"),
        )
    )
    for _ in range(max_doublings):
        nxt = state.select(
            F.col("id").alias("anc"), F.col("anc").alias("anc2"),
            F.col("d").alias("d2"),
        )
        state = materialize(
            state.join(nxt, "anc").select(
                "id",
                F.col("anc2").alias("anc"),
                (F.col("d") + F.col("d2")).cast("int").alias("d"),
            )
        )
    return state.select(
        "id", F.col("anc").alias("root"), F.col("d").alias("depth")
    )
