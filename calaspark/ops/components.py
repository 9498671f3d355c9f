"""Connected components over a pair graph — the dedup endgame
(SURVEY.md §2.5 E15/E17 composition).

Near-dup detection yields PAIRS; deduplication needs CLUSTERS (keep
one canonical doc per group of mutual near-dups). That is connected
components on the similarity graph. Spark has no built-in; the
distributed classic is iterative min-label propagation:

    label(v) ← min(label(v), min over neighbors(label(u)))

repeated until fixpoint. Each iteration is one shuffle (groupBy on
vertex); convergence takes O(diameter) iterations — near-dup cluster
graphs are dense and shallow, so a handful. Lineage is cut each
round via :func:`calaspark.ops.materialize.materialize` (reliable
``checkpoint()`` when the session has a checkpoint dir, else
``localCheckpoint``) or the plan tree grows exponentially (the
classic iterative-DataFrame trap at scale).

This is an honest iterative-algorithm demo: driver-side loop, but
each step is fully distributed and the loop count is bounded by
graph diameter, not data size.
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
    Deterministic: min-label is order-independent.

    Warns (without truncating the partial result) if labels have not
    converged after ``max_iter`` rounds — a graph with diameter >
    ``max_iter`` (e.g. a long near-dup chain) would otherwise return
    silently-wrong components with no signal to the caller.
    """
    # Materialize the edge list BEFORE symmetrizing: the union reads
    # each direction from the materialized blocks, so an expensive
    # edges lineage (e.g. an LSH candidate join) computes ONCE, not
    # once per union branch.
    e = materialize(edges.select(F.col(src).alias("u"), F.col(dst).alias("v")))
    sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # Self-loops fold "keep my own label" into the SAME min-aggregate
    # as the neighbor labels, so each round is ONE join + ONE groupBy
    # — the earlier formulation needed a second (left) join per round
    # just to merge own-vs-neighbor labels.
    sym = materialize(
        sym.unionAll(
            sym.select(F.col("u").alias("u"), F.col("u").alias("v"))
        ).distinct()
    )

    labels = materialize(
        sym.select(F.col("u").alias("v"))
        .distinct()
        .withColumn("comp", F.col("v"))
    )

    def label_sum(lbl: DataFrame):
        # exact decimal so huge vertex-id sums cannot overflow a long
        return lbl.agg(
            F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    # Convergence probe: min-label propagation only ever LOWERS a
    # label, so the label sum strictly decreases until fixpoint and
    # sum-equality ⟺ elementwise equality — one cheap aggregate over
    # the materialized labels instead of a comparison join per round.
    prev_sum = label_sum(labels)
    converged = False
    for _ in range(max_iter):
        labels = materialize(
            sym.join(labels.withColumnRenamed("v", "u"), "u")
            .groupBy("v")
            .agg(F.min("comp").alias("comp"))
        )
        cur_sum = label_sum(labels)
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        warnings.warn(
            f"connected_components did not converge in max_iter={max_iter} "
            "rounds; labels are a partial fixpoint (graph diameter exceeds "
            "max_iter) — raise max_iter",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select(F.col("v").alias("vertex"), "comp")


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
