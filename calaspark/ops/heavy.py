"""Exact heavy hitters with BOUNDED aggregation state (E19/E13 —
the frequent-items primitive a training-data pipeline runs to find
boilerplate tokens, hot n-grams, or over-represented domains).

Two passes, both distributed, final answer EXACT:

1. **Candidate pass** — Misra–Gries summaries (Misra & Gries 1982,
   "Finding repeated elements"; mergeability per Agarwal et al. 2013)
   with capacity ``k`` run independently over each Arrow batch via
   ``mapInPandas``. Pigeonhole guarantee: an item with global count
   > N/k has, in at least one batch of sizes n_b (Σn_b = N), local
   count > n_b/k — else its total would be ≤ Σ n_b/k = N/k — and a
   capacity-k Misra–Gries summary never evicts an item whose local
   count exceeds n_b/k. The union of per-batch candidate sets
   therefore contains EVERY global heavy hitter (plus false
   positives, which pass 2 removes). State per task: one dict of at
   most 2k entries — never the full key cardinality.
2. **Recount pass** — a broadcast semi-join of the stream against
   the candidate set (≤ 2k × #batches keys — model-sized for sane
   k), then an exact ``groupBy().count()`` whose hash-agg state is
   candidates-only, and the threshold filter ``count * k > N``.

Why this matters at 100 TB: a plain ``groupBy(key).count()`` over a
multi-billion-key column (URLs, shingles, user agents) carries the
full key space through the shuffle and the aggregation hash maps;
the candidate pass bounds both to O(k) per task regardless of
cardinality, and only the tiny candidate set shuffles for the exact
recount. The answer is identical to the naive plan — which is the
DuckDB oracle for q113.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def mg_batch(keys, k: int) -> dict:
    """One Misra–Gries summary over an iterable of keys: at most
    ``k`` surviving counters; any key occurring > n/k times in the
    iterable survives (its counter underestimates by at most
    n/(k+1) decrements, each of which consumes k other
    occurrences). Pure function so the guarantee is property-
    testable without Spark (tests/test_advanced.py, hypothesis)."""
    counters: dict = {}
    for key in keys:
        if key in counters:
            counters[key] += 1
        elif len(counters) < k:
            counters[key] = 1
        else:
            # decrement-all; drop zeros (the classic step,
            # amortized O(1) via dict rebuild)
            counters = {c: n - 1 for c, n in counters.items() if n > 1}
    return counters


def mg_merge(a: dict, b: dict, k: int) -> dict:
    """MERGE two Misra–Gries summaries into one of capacity ``k``
    (Agarwal et al. 2013, "Mergeable summaries"): sum counters,
    then subtract the (k+1)-th largest combined count from all and
    drop non-positives. The merged summary keeps the MG error bound
    — every counter underestimates its key's true count (over the
    union of both inputs' streams) by at most n/(k+1) — so chained
    merges across micro-batches never lose a key whose true count
    exceeds n/(k+1). State stays ≤ k entries per merge, which is
    what makes the STREAMING operator's state bounded
    (streaming/stateful.py §heavy_hitters_stream)."""
    comb: dict = dict(a)
    for key, c in b.items():
        comb[key] = comb.get(key, 0) + c
    if len(comb) > k:
        off = sorted(comb.values(), reverse=True)[k]
        comb = {key: c - off for key, c in comb.items() if c - off > 0}
    return comb


def misra_gries_candidates(items: DataFrame, col: str, k: int) -> DataFrame:
    """Distinct candidate keys from per-batch Misra–Gries summaries.

    ``items`` is one row per occurrence (pre-exploded). Returns a
    1-column DataFrame (``col``) that is a SUPERSET of every key
    with global frequency > N/k, independent of partitioning —
    the superset's exact membership varies with batch boundaries,
    but downstream exact recounting makes the final answer
    partition-invariant (the determinism contract).
    """

    def summarize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame({col: list(mg_batch(pdf[col], k).keys())})

    schema = items.select(col).schema
    return items.select(col).mapInPandas(summarize, schema).distinct()


def recount_candidates(
    items: DataFrame, col: str, k: int, cands: DataFrame
) -> DataFrame:
    """Pass 2 alone: exact recount of a SUPERSET candidate set.

    ``cands`` must be a 1-column (``col``) superset of every key with
    global frequency > N/k (the Misra–Gries cover guarantee — batch
    via :func:`misra_gries_candidates`, or the union of a drained
    streaming summary's emissions). False positives are recounted to
    their true totals and removed by the threshold filter, so the
    result is EXACT and independent of which superset arrived.
    Duplicate candidate rows are harmless (left_semi ignores right
    multiplicity) but callers should pre-dedupe so the join's build
    side stays model-sized. Columns: ``col``, ``cnt`` (bigint),
    ``total`` (bigint, = N), ordered by (cnt desc, key).
    """
    total = items.select(
        F.count(F.lit(1)).cast("long").alias("total")
    )
    # no broadcast HINT on the candidate semi-join: candidates are
    # usually model-sized (≤ 2k per batch, deduped), and AQE will
    # broadcast them when they are — but adversarial quasi-heavy
    # data can inflate the candidate set past broadcast limits, and
    # a forced hint would then OOM the build side where a shuffle
    # semi-join degrades gracefully (the round-7 link-join lesson)
    counted = (
        items.join(cands, col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return (
        counted.crossJoin(F.broadcast(total))  # 1-row scalar join
        .filter(F.col("cnt") * F.lit(k) > F.col("total"))
        .orderBy(F.col("cnt").desc(), F.col(col))
    )


def heavy_hitters(items: DataFrame, col: str, k: int) -> DataFrame:
    """Exact keys with frequency > N/k and their exact counts
    (candidate pass + recount pass; see module docstring).

    Columns: ``col``, ``cnt`` (bigint), ``total`` (bigint, = N).
    Ordered by (cnt desc, key) for a total order.
    """
    return recount_candidates(
        items, col, k, misra_gries_candidates(items, col, k)
    )
