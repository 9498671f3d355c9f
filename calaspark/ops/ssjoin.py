"""Exact set-similarity join over shingle sets (SSJoin family).

The exact-near-dup contract "every document pair with shingle-set
Jaccard ≥ τ" has two classic distributed plans, both here:

- :func:`jaccard_count_join` — the inverted-index COUNT join:
  explode distinct shingles to rows, self-equi-join on the shingle,
  and the per-pair row count IS the intersection size (shingles are
  distinct within a doc). No arrays ever cross a shuffle; admission
  is pure integer arithmetic. Cost is Σ_g df(g)² join rows — the
  right plan while the df distribution is long-tailed/bounded (cap
  ubiquitous shingles first with a q68-style max_df guard if not).
- :func:`jaccard_prefix_filter` — SSJoin/PPJoin prefix filtering
  (Chaudhuri et al. ICDE'06; Bayardo et al. WWW'07): index only
  each doc's ``|A| − ⌈τ|A|⌉ + 1`` RAREST shingles (ascending-df
  order); a qualifying pair must collide there. The right plan when
  sets are large and Σ df² blows up but qualifying pairs are rare —
  candidates then scale with shared-rare-shingle structure, and
  each candidate is verified once by array intersection.

Both produce identical results (property-tested against each other
and a brute-force in ``tests/test_ops.py``).

Measured construction note (sf0.1, 5000 docs): building shingles as
per-doc ARRAYS via ``transform(sequence, slice+concat)`` costs
~3.7 s — the higher-order-function chain is interpreted per
element. :func:`shingle_rows` instead builds shingles with
``posexplode`` + ``lead`` windows — whole-stage codegen end to end —
and feeds the joins directly in row form; the count-join total went
9 s → <2 s.

Threshold is a rational ``tau_num/tau_den`` so every admission test
is integer (float-free): J ≥ p/q ⟺ (p+q)·|∩| ≥ p·(|A|+|B|).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def shingle_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Distinct ``k``-token shingles as ROWS: (id, nt, g) where
    ``nt`` is the doc's distinct-shingle count. Tokens are the
    space-split of ``text_col`` with empties removed; docs with
    fewer than ``k`` tokens drop out (they have no shingle set).

    Built with ``posexplode`` + ``lead`` windows (pure codegen) —
    see the module docstring for why not array higher-order
    functions. ``k=1`` degenerates to plain token sets (no window
    needed — exactly q33's unigram contract).
    """
    if k < 1:
        raise ValueError(f"shingle width k must be >= 1, got {k}")
    raw = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    tr = df.select(F.col(id_col).alias("_sid"), F.posexplode(raw).alias("pos", "tok"))
    if k == 1:
        sh = tr.select("_sid", F.col("tok").alias("g")).distinct()
    else:
        w = Window.partitionBy("_sid").orderBy("pos")
        leads = [F.lead("tok", j).over(w) for j in range(1, k)]
        g = F.concat_ws(" ", F.col("tok"), *leads)
        sh = (
            tr.select("_sid", g.alias("g"), leads[-1].alias("_last"))
            .filter(F.col("_last").isNotNull())
            .select("_sid", "g")
            .distinct()
        )
    nt = sh.groupBy("_sid").agg(F.count(F.lit(1)).alias("nt"))
    return sh.join(nt, "_sid").select(
        F.col("_sid").alias(id_col), "nt", "g"
    )


def _admit(n_inter, na, nb, tau_num: int, tau_den: int):
    """J ≥ p/q as integers: (p+q)·i ≥ p·(na+nb)."""
    return F.lit(tau_num + tau_den) * n_inter >= F.lit(tau_num) * (na + nb)


def _size_ratio_ok(na, nb, tau_num: int, tau_den: int):
    """Necessary size condition: J ≤ min/max ⟹ q·min ≥ p·max."""
    return F.lit(tau_den) * F.least(na, nb) >= F.lit(tau_num) * F.greatest(
        na, nb
    )


def _finish(pairs: DataFrame) -> DataFrame:
    """Attach n_union and the reported sim (ROUND(i/u, 4))."""
    return pairs.select(
        "doc_a",
        "doc_b",
        F.col("n_inter").cast("long").alias("n_inter"),
        (F.col("na") + F.col("nb") - F.col("n_inter"))
        .cast("long")
        .alias("n_union"),
    ).withColumn(
        "sim",
        F.round(
            F.col("n_inter").cast("double") / F.col("n_union").cast("double"),
            4,
        ),
    )


def verify_candidates(
    shingles: DataFrame,
    cand: DataFrame,
    tau_num: int,
    tau_den: int,
) -> DataFrame:
    """Exact-Jaccard verify of ``cand`` (doc_a, doc_b) pairs against
    the shingle rows — arrays are rebuilt ONLY for docs that appear
    in a candidate (semi-join before ``collect_list``), so the
    array build and the verify joins are candidate-bounded, never
    corpus-sized. Shared by :func:`jaccard_prefix_filter` and the
    q95 MinHash pipeline."""
    cand_ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sets_ = (
        shingles.join(cand_ids, "doc_id", "leftsemi")
        .groupBy("doc_id")
        .agg(F.collect_list("g").alias("gs"), F.max("nt").alias("nt"))
    )
    sa = sets_.select(
        F.col("doc_id").alias("doc_a"), F.col("gs").alias("ga"),
        F.col("nt").alias("na"),
    )
    sb = sets_.select(
        F.col("doc_id").alias("doc_b"), F.col("gs").alias("gb"),
        F.col("nt").alias("nb"),
    )
    inter = F.size(F.array_intersect("ga", "gb")).cast("long")
    verified = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", "na", "nb", inter.alias("n_inter"))
        .filter(_admit(F.col("n_inter"), F.col("na"), F.col("nb"), tau_num, tau_den))
    )
    return _finish(verified)


def jaccard_count_join(
    shingles: DataFrame, tau_num: int = 1, tau_den: int = 2
) -> DataFrame:
    """Exact Jaccard ≥ tau_num/tau_den pairs via the inverted-index
    count join. Input is :func:`shingle_rows` output (or any
    (doc_id, nt, g) frame with per-doc-distinct ``g``)."""
    ea = shingles.select(
        F.col("doc_id").alias("doc_a"), F.col("nt").alias("na"), "g"
    )
    eb = shingles.select(
        F.col("doc_id").alias("doc_b"), F.col("nt").alias("nb"), "g"
    )
    pc = (
        ea.join(eb, "g")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(_size_ratio_ok(F.col("na"), F.col("nb"), tau_num, tau_den))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("n_inter"))
        .filter(_admit(F.col("n_inter"), F.col("na"), F.col("nb"), tau_num, tau_den))
    )
    return _finish(pc)


def jaccard_prefix_filter(
    shingles: DataFrame, tau_num: int = 1, tau_den: int = 2
) -> DataFrame:
    """Exact Jaccard ≥ tau_num/tau_den pairs via prefix filtering.

    Prefix length for a doc with ``nt`` shingles is
    ``nt − ⌈τ·nt⌉ + 1`` (integer: ``nt − (p·nt + q − 1) div q + 1``)
    under the shared (df asc, shingle asc) total order — a
    qualifying pair (sizes within the τ ratio ⟹ overlap ≥ ⌈τ·nt⌉)
    must share a shingle inside both prefixes. Candidates from the
    prefix inverted index are verified ONCE each by exact array
    intersection (arrays rebuilt per doc with ``collect_list`` —
    intersection is order-insensitive, so collect order is
    irrelevant).
    """
    p, q = tau_num, tau_den
    dfreq = shingles.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    ranked = shingles.join(dfreq, "g").withColumn(
        "_rn",
        F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "g")),
    )
    plen = F.col("nt") - F.expr(f"({p} * nt + {q} - 1) div {q}") + F.lit(1)
    prefix = ranked.filter(F.col("_rn") <= plen).select("doc_id", "nt", "g")
    pa = prefix.select(
        F.col("doc_id").alias("doc_a"), F.col("nt").alias("na"), "g"
    )
    pb = prefix.select(
        F.col("doc_id").alias("doc_b"), F.col("nt").alias("nb"), "g"
    )
    cand = (
        pa.join(pb, "g")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(_size_ratio_ok(F.col("na"), F.col("nb"), p, q))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return verify_candidates(shingles, cand, p, q)
