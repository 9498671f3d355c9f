"""Physical-plan audit: scan every registered query's executed plan
for 100 TB red flags (SURVEY.md §7; the judge's plan-review twin).

Flags per query:

- ``cartesian``   — CartesianProduct node (unbounded pair blowup)
- ``py_row_udf``  — BatchEvalPython (row-at-a-time Python in plan);
                    ArrowEvalPython / MapInPandas are reported
                    separately as ``py_arrow`` (acceptable where
                    declared: the E20/E22 demos)
- ``bnlj``        — BroadcastNestedLoopJoin (acceptable ONLY for
                    declared pair-space ops: q33 / q38_cross)
- ``no_pushdown`` — a parquet scan whose PushedFilters is empty while
                    the query filters that table (heuristic: plan has
                    a Filter directly over the scan)
- ``single_part_exchange`` — SinglePartition exchange (global sort/
                    limit paths; acceptable for declared pagination)
- ``repeated_scans`` — more parquet scans than the query's declared
                    ceiling (default <4): branching N consumers off
                    one DataFrame re-derives its subtree N times
                    (column pruning defeats reuse) — the round-9
                    q106 forty-scan lesson

Usage: python tools/plan_audit.py [ids...]  (default: all)
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from calaspark.queries import QUERIES  # noqa: E402
from calaspark.session import get_spark  # noqa: E402

# Overridable so the audit can also run at sf0.1 (round 13): AQE and
# size-based join planning can legitimately change plan SHAPE with
# 10x the data, and a red flag that only appears at scale is exactly
# the kind this audit exists to catch.
SF = os.environ.get("CALASPARK_AUDIT_SF", "/root/testdata/sf0.01")

#: queries where a flagged pattern is the declared, documented plan
ALLOWED = {
    # exact all-pairs now rides a triangle block EQUI-join (no BNLJ);
    # the single-part exchange left is the ≤512-row token→bit
    # dictionary window in bitmask_encode
    "q33": {"single_part_exchange"},
    "q38_cross": {"bnlj"},  # cross join demo (tiny dims)
    # 9-row decile-boundary broadcast × customer-grain scan (q71's
    # declared tiny-broadcast theta pattern) + the bounded global
    # windows: the bucket-grain quantile search under a single global
    # group (≤ value_range/1024 rows) and the 10-row cumulative-share
    # window — never customer/data grain
    "q130": {"bnlj", "single_part_exchange"},
    "q34": {"bnlj"},  # 1-row broadcast probe × corpus scan (single-probe ANN)
    "q71": {"bnlj"},  # 8-row broadcast query batch × corpus scan (batch ANN)
    "q01": {"single_part_exchange"},  # global 1-row aggregate: final merge
    "q53": {"single_part_exchange"},  # global 1-row aggregate: final merge
    # 2-row variant table pivoted into the 1-row A/B readout: global
    # final merge of a tiny aggregate (q01/q53 class)
    "q131": {"single_part_exchange"},
    # expectation suite: a union of eight 1-row check summaries, each
    # a global final merge (q01/q53 class); per-check work is one
    # scan + map-side partials
    "q137": {"single_part_exchange"},
    # global 1-row aggregates; bnlj = the 1-row exact×sketch scalar
    # cross join (the split that keeps object-agg sketches out of the
    # count_distinct Expand re-aggregation)
    "approx_sketches": {"single_part_exchange", "bnlj"},
    "q04": {"single_part_exchange"},  # global offset pagination
    "q03": {"single_part_exchange"},
    # token→bit dictionary window (≤512 rows), as in q33
    "lsh_minhash_pairs": {"single_part_exchange"},
    # scalar-subquery shape: 1-row broadcast N crossJoin (BNLJ over a
    # single broadcast row) + the global count's 1-row final merge
    "tfidf_topterms": {"bnlj", "single_part_exchange"},
    "pandas_udf_quality": {"py_arrow"},
    # IVF cell assignment is a dense (batch×dim)@(dim×k) matmul —
    # the declared Arrow/BLAS boundary (built-ins = k interpreted
    # lambda folds per row); see ops/ann_ivf.py docstring
    "ann_ivf_topk": {"py_arrow"},
    "multimodal_features": {"py_arrow"},
    # two 1-row summary aggregates crossJoined (BNLJ over one row) +
    # their global final merges; Arrow workers are the demo's point
    "arrow_native": {"bnlj", "single_part_exchange", "py_arrow"},
    # pipeline funnel: three 1-row stage summaries crossJoined (1×1
    # BNLJ) + their global final merges — q34's declared tiny-row
    # pattern; the corpus-sized work is one scan + one dedup shuffle
    "q65": {"bnlj", "single_part_exchange"},
    # collision-safe insert-key offset = MAX(o_orderkey): one global
    # 1-row MAX (final merge) broadcast-crossJoined onto the small
    # insert branch (1-row BNLJ) — scalar-subquery shape, as in q65
    "q56": {"bnlj", "single_part_exchange"},
    "udtf_tokens": {"py_row_udf", "py_arrow"},  # UDTF demo is per-row by design
    # scalar-subquery shape: 1-row broadcast N (= COUNT(documents))
    # crossJoined onto the edge derivation (1-row BNLJ) + its global
    # 1-row final merge — same declared pattern as q56/tfidf
    "q80": {"bnlj", "single_part_exchange"},
    # boundary-stitch pass of ops/islands.py: global lag-window over
    # the ~2-islands-per-bucket boundary set (model-sized by
    # construction; the data-scale run detection is bucket-partitioned)
    "q83": {"single_part_exchange"},
    # skyline sweep window over the per-DATE aggregate — bounded by
    # the calendar (~2.4k rows/7 years), not the data
    "q85": {"single_part_exchange"},
    # global 1-row profiling aggregate: final merge of the fused
    # multi-COUNT(DISTINCT) scan (q01's declared pattern)
    "q90": {"single_part_exchange"},
    # q56's collision-free insert-key shape: one global 1-row MAX
    # (final merge) broadcast-crossJoined onto the small added-keys
    # branch (1-row BNLJ)
    "q99": {"bnlj", "single_part_exchange"},
    # top-1000 vocab rank runs over the DICTIONARY (vocab-sized, not
    # corpus-sized) — same declared pattern as q33's token→bit window
    "q100": {"single_part_exchange"},
    # share-of-world window sum over the 25-row nation-grain
    # aggregate (model-sized; the fact table is scanned once)
    "q103": {"single_part_exchange"},
    # scalar-subquery shape: the 1-row normalizer aggregate (global
    # final merge) broadcast-crossJoined onto the key-grain result
    # (1-row BNLJ) — q56/q80/tfidf's declared pattern
    "q104": {"bnlj", "single_part_exchange"},
    # scalar-subquery shape: the 1-row (N, Σdl) corpus-stats
    # aggregate (global final merge) broadcast-crossJoined onto the
    # (doc, term) tf grain (1-row BNLJ) — q56/q80/q104's declared
    # pattern; the data-scale work is two hash aggs + equi-joins,
    # top-20 is TakeOrderedAndProject
    "q138": {"bnlj", "single_part_exchange"},
    # the bucket-grain cumulative window (value_range/2^16 rows — a
    # domain constant, the q98/ops-quantile declared class), the
    # 1-row (n1, n2) broadcast crossJoin (q56/q80 scalar-subquery
    # shape), and the global 1-row max final merge; the per-value
    # window is bucket-partitioned, data grain never single-partition
    "q140": {"bnlj", "single_part_exchange"},
    # q138's scalar-subquery stats shape (1-row BNLJ + final merge)
    # plus the two row_number windows over the ≤50-row candidate
    # lists (model-sized by construction — the demo's docstring
    # declares them; the data-scale work is hash aggs + TakeOrdered)
    "hybrid_search": {"bnlj", "single_part_exchange"},
    # four 1-row graph summaries (vertices/edges/wedges/triangles)
    # crossJoined into the report row (1×1 BNLJ) + their global
    # final merges — q65's declared tiny-row pattern; the data-scale
    # work is equi-joins only (edge derivation, degree join,
    # oriented wedge join, semi-join closure)
    "q106": {"bnlj", "single_part_exchange"},
    # global 1-row funnel summary: final merge of the user-keyed
    # left-join ladder (q01's declared pattern)
    "q108": {"single_part_exchange"},
    # q99's snapshot-B derivation: one global 1-row MAX (final
    # merge) broadcast-crossJoined onto the small added-keys branch
    # (1-row BNLJ) — the declared collision-free insert-key shape
    "q111": {"bnlj", "single_part_exchange"},
    # Misra-Gries candidate pass IS the Arrow boundary (bounded O(k)
    # dict per batch — ops/heavy.py); the 1-row total-count scalar
    # broadcast-crossJoins onto the recount (1-row BNLJ + its global
    # final merge) — q56/q80/tfidf's declared scalar-subquery shape
    "q113": {"py_arrow", "bnlj", "single_part_exchange"},
    # q190 returns q113's recount plan (the streaming candidate pass
    # already ran to the memory sink before the audit sees the df):
    # same declared scalar-subquery shape — 1-row total broadcast-
    # crossJoined onto the candidate recount + its global final merge
    "q190": {"bnlj", "single_part_exchange"},
    # universe size (COUNT DISTINCT event_type, 1 row) broadcast-
    # crossJoined onto the per-user counts (1-row BNLJ) + the global
    # 1-row division report (final merge) — declared scalar shape
    "q117": {"bnlj", "single_part_exchange"},
    # total-token normalizer (1 row) broadcast-crossJoined onto the
    # bigram-grain lift computation (1-row BNLJ + its final merge) —
    # q104/tfidf's declared scalar-subquery shape
    "q119": {"bnlj", "single_part_exchange"},
    # basket-count normalizer (1-row COUNT DISTINCT) broadcast-
    # crossJoined onto the 25x25-bounded pair grain — declared
    # scalar-subquery shape
    "q123": {"bnlj", "single_part_exchange"},
    # attribution totals (1-row count+sum) broadcast-crossJoined onto
    # the 11-row channel grain — declared scalar-subquery shape
    "q124": {"bnlj", "single_part_exchange"},
    # signup denominator (1-row COUNT) broadcast-crossJoined onto the
    # 1-row gap-quantile aggregate (q108's global summary shape)
    "q126": {"bnlj", "single_part_exchange"},
    # the sequential-recurrence operators' Python boundary IS the
    # declared engine use-case (ops/sequential.py: non-associative
    # per-key folds no window can express). Round 8b moved them from
    # applyInPandas (one Python call per key — invisible to this
    # audit's MapInPandas probe but 3x slower) to a single
    # mapInPandas stream per partition, which the probe sees; the
    # boundary was always there and is the honest minimum
    "q134": {"py_arrow"},
    "q142": {"py_arrow"},
    # the CMS error report's global 1-row summary aggregate (final
    # merge — q01/q53 class); the sketch build itself is a bounded
    # (depth x width)-state hash agg with map-side partials
    "cms_shingle_error": {"single_part_exchange"},
    # the chi2 headline sum runs as a global window over the 25-cell
    # contingency table (bounded by the CATEGORY domain, not the
    # data) + the 1-row N crossJoin (scalar-subquery shape) — the
    # data-sized work is one hash agg with map-side partials
    "q143": {"bnlj", "single_part_exchange"},
    # q140's declared two-level prefix shape: the only global window
    # runs at BUCKET grain (value_range/2^16 rows — a domain
    # constant); the per-value window is bucket-partitioned and the
    # final (n1,n2,ra2,T) aggregate is a global 1-row final merge
    "q145": {"single_part_exchange"},
    # q80's edge derivation: 1-row N (= COUNT(documents)) broadcast-
    # crossJoined onto the mixing-edge map (1-row BNLJ + the global
    # 1-row COUNT's final merge — q80's declared scalar-subquery
    # shape); BFS itself is equi-join + anti-join rounds only
    "q147": {"bnlj", "single_part_exchange"},
    # the 5×9 scaffold: 9-digit literal range broadcast-crossJoined
    # onto the 5-row priority dim (1-row-class BNLJ over category
    # domains); every aggregate after the first fact-scan hash agg
    # runs at the 45-cell category grain
    "q148": {"bnlj"},
    # Gini best-split: the prefix/total/rank windows all run over the
    # ≤20-row fixed-threshold bucket aggregate (a domain constant —
    # q136's fixed-bin class); the fact table folds map-side into
    # that aggregate before any window
    "q155": {"single_part_exchange"},
    # k-anonymity: the risk-share window runs over the ≤125-cell
    # (segment × nation) QI aggregate (category domain, not data
    # grain); the customer scan folds map-side into it
    "q156": {"single_part_exchange"},
    # GROUPED_AGG pandas UDF + grouped-map applyInPandas demo: the
    # Arrow boundary is the demo's subject (E22 matrix completion) —
    # newly caught once the audit learned FlatMapGroupsInPandas
    "pandas_grouped_ops": {"py_arrow"},
    # PAVA isotonic fit: the applyInPandas stage IS the operator (a
    # sequential merge-stack per group over the <=50-row bin grain —
    # the declared ops/sequential.py class)
    "q165": {"py_arrow"},
    # RFM: the 1-row snapshot MAX (q56/q80 scalar-subquery shape:
    # global final merge + 1-row broadcast crossJoin) and the 1-row
    # pivoted boundary table crossJoined onto the user grain; the
    # quantile search windows run at metric-value grain (op contract)
    "q163": {"bnlj", "single_part_exchange"},
    # m-estimate ranking: the prior/rank windows run over the ≤25-row
    # brand-grain aggregate (category domain); the fact join folds
    # map-side into it before any window
    "q162": {"single_part_exchange"},
    # quantile normalization: the pooled prefix window runs at VALUE
    # grain (distinct n_chars — a domain constant, the q98/ops-
    # quantile declared class) and the 1-row N aggregate broadcast-
    # crossJoins onto the doc-grain ranks (q56/q80's scalar-subquery
    # shape); per-value row_numbers are value-partitioned and the
    # rank→value lookup is a balanced equi-join on a unique key
    "q150": {"bnlj", "single_part_exchange"},
    # scalar-subquery shape (q56/q80/tfidf's declared pattern): the
    # 1-row eligible-count aggregate (global final merge) broadcast-
    # crossJoined onto the prefix-cluster grain (1-row BNLJ)
    "q167": {"bnlj", "single_part_exchange"},
    # same shape: the 1-row (tot_docs, tot_toks) aggregate broadcast-
    # crossJoined onto the 32-row shard grain
    "q168": {"bnlj", "single_part_exchange"},
    # q143's contingency shape × 3 pairs: each pair's margins (rt,
    # ct, N) are WINDOW sums over its ≤ 240-row cell table (rollups
    # of the one materialized 1200-row cube) — the total-sum window
    # is the declared bounded-grain single-partition class
    "q171": {"single_part_exchange"},
    # day-ordered running-sum window over the CALENDAR-sized daily
    # aggregate — the declared q85/q143 tiny-global-window class
    "q174": {"single_part_exchange"},
    # multi-edge referential-integrity audit (the q137 class): each
    # of the 7 FK edges folds to THREE 1-row summaries (child stats,
    # anti-join orphan count, parent count) crossJoined into its
    # report row (1-row BNLJ + global final merges); per-edge scans
    # are independent checks by semantics
    "q176": {"bnlj", "single_part_exchange"},
    # cluster-safe split: the 1-row audit-scalar aggregate (global
    # final merge) broadcast-crossJoined onto the 3-row split report
    # (q65's declared tiny-row pattern) + components' internal 1-row
    # convergence probes; the corpus-sized work is the edge joins,
    # the star-contraction rounds and one doc-grain fold
    "q180": {"bnlj", "single_part_exchange"},
    # mix planning: the 1-row T = min(cap) aggregate (global final
    # merge) broadcast-crossJoined onto the source-grain plan rows —
    # q56/q80's declared scalar-subquery shape
    "q179": {"bnlj", "single_part_exchange"},
    # GLOBAL distributed rank: the bucket-offset prefix window runs
    # over the BUCKET-grain count table (value_range/width rows — a
    # domain constant, the q98/ops-quantile declared class) and the
    # (nn, tsum) tie summary is a 1-row aggregate broadcast-
    # crossJoined onto the 5-row group table (q56/q80's
    # scalar-subquery shape); the data-grain sort is bucket-
    # partitioned, never single-partition
    "q175": {"bnlj", "single_part_exchange"},
}


#: Repeated-scan ceiling (round-9 lesson): branching N consumers
#: off one DataFrame does NOT reuse its subtree — per-branch column
#: pruning makes each copy canonically different, so the physical
#: plan re-derives it per consumer (q106 hit FORTY lineitem scans
#: before its materialize fix). Queries whose plans legitimately
#: scan ≥SCAN_CEILING times declare themselves here with the reason.
SCAN_CEILING = 4
SCAN_ALLOWED = {
    # set-operation batteries: UNION/INTERSECT/EXCEPT (+ALL) branches
    # are separate inputs BY SEMANTICS (each side its own pruned scan)
    "q20": 6,
    "q41": 8,
    # multiway star/cycle joins: one scan PER TABLE is the plan
    "q07": 5,
    "q51": 6,
    # funnel ladder: each stage re-reads events with its own PUSHED
    # event_type filter and the previous stage's watermark — the
    # scale-correct alternative to collecting per-user event arrays
    "q108": 8,
    # two-snapshot comparisons: each snapshot derivation is its own
    # branch by construction (diff/Merkle/insert-key shapes)
    "q99": 4, "q111": 4, "q56": 4,
    # scaffold + observed + theory patterns at category grain
    "q144": 4, "q145": 4, "q148": 4, "q105": 4, "q103": 4,
    # declared pair-space / two-corpus ops (self-join over a derived
    # corpus each side)
    "q33": 4, "q91": 4, "q119": 4, "q138": 4, "q154": 4,
    "hybrid_search": 5, "embedding_neardup": 4,
    # sampled-vs-exact audit runs the join twice BY DESIGN
    "q160": 4,
    # KS two-sample prefix: the two cohort branches + bucket scaffold
    "q140": 6,
    # distributed rank: each of the two rank columns needs its
    # bucket-offset scaffold (a (g, bucket)-grain count prefix)
    # beside the row pipeline — the q140/q145 scaffold pattern, one
    # narrow pruned scan per offset table
    "q166": 4,
    # expectation suite: EIGHT independent checks, each its own table
    # + pushed-filter scan by design (multi-table audit, not reuse)
    "q137": 10,
    # FK audit: 7 edges x 4 scans (child stats, anti-join child side,
    # anti-join parent side, parent count) — independent checks by
    # semantics, q137's multi-table-audit class
    "q176": 28,
    # grid-cosine pair corpus: the materialized union still shows the
    # two cell-join sides + norms branches of the cached blocks
    "q73": 4,
    # q150/q101: window-chained but the final rank/alloc self-join
    # keeps two pruned branches of the narrow base
    "q150": 4, "q101": 4,
}


def audit_one(spark, qid: str, fn) -> dict[str, bool]:
    df = fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_scans = len(re.findall(r"Scan parquet", plan))
    return {
        "cartesian": "CartesianProduct" in plan,
        "py_row_udf": "BatchEvalPython" in plan,
        "py_arrow": ("ArrowEvalPython" in plan)
        or ("MapInPandas" in plan)
        or ("FlatMapGroupsInPandas" in plan)
        or ("PythonUDTF" in plan),
        "bnlj": "BroadcastNestedLoopJoin" in plan,
        "single_part_exchange": "Exchange SinglePartition" in plan,
        "repeated_scans": n_scans
        > SCAN_ALLOWED.get(qid, SCAN_CEILING - 1),
    }


def main() -> None:
    ids = sys.argv[1:] or list(QUERIES)
    spark = get_spark("calaspark-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    bad = 0
    for qid in ids:
        flags = audit_one(spark, qid, QUERIES[qid])
        hits = {k for k, v in flags.items() if v}
        unexpected = hits - ALLOWED.get(qid, set())
        status = "OK" if not unexpected else f"FLAG {sorted(unexpected)}"
        allowed_note = (
            f" (declared: {sorted(hits & ALLOWED.get(qid, set()))})"
            if hits & ALLOWED.get(qid, set())
            else ""
        )
        print(f"{qid:<20} {status}{allowed_note}")
        bad += bool(unexpected)
    print(f"\n{len(ids) - bad}/{len(ids)} clean")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
