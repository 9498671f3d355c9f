"""Declared contract queries Q29–Q36 — LLM-pipeline + time-window
extensions (SURVEY.md §2.5 E11/E12/E15/E17/E18/E23, §2.6).

These are the operators a large-scale training-data pipeline needs on
top of the reference's relational surface: token analytics, exact and
keyed dedup, exact Jaccard near-dup pairs, cosine top-k over
embeddings, and the batch twins of the streaming window family
(tumbling / sliding / session).

Reference anchors (SURVEY.md §0 convention): the reference has no
analytics of its own — it delegates querying to SQL consumers
(`calaccess_raw/models/base.py §CalAccessBaseModel.objects`); these
queries define the distributed equivalents a CAL-ACCESS-scale (or
100 TB) consumer would run.

Scale notes per query are inline. The general rules: everything is
built-in `pyspark.sql.functions` (whole-stage codegen, no Python in
the loop); aggregations do map-side partial aggregation; the only
intentional quadratic operator is q33's exact pair join, whose
at-scale replacement (banded MinHash LSH, no cartesian) lives in
``calaspark/ops/lsh.py`` and is registered as a rows-only query.

Determinism (SURVEY.md §2.6 rules): money/value aggregates go through
exact decimal; raw timestamps are never emitted (formatted strings or
floored epoch-second bigints); every LIMIT sits under a total order;
similarity doubles are index-order folds rounded to 4 digits.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from ..ops.windows import latest_per_key
from ..tables import load_table
from ._util import dec, money_sum, ts_str

#: Fixed pivot column set for q30 (the testdata's event_type domain,
#: enumerated once — both engines use the identical ordered list, as
#: SURVEY.md §2.6 Q30 requires).
EVENT_TYPES: tuple[str, ...] = ("click", "error", "purchase", "signup", "view")


def _clean_tokens(col: str = "text") -> Column:
    """Space-split tokens with empties removed (array<string>)."""
    return F.filter(F.split(col, " "), lambda x: x != "")


def _epoch_s(col: str = "ts") -> Column:
    """Floored epoch seconds (bigint) of a TIMESTAMP_NTZ column.

    Both engines floor: Spark `unix_timestamp` truncates sub-second,
    DuckDB oracle uses `CAST(floor(epoch(ts)) AS BIGINT)`. Window
    boundaries are integer seconds, so flooring never moves an event
    across a boundary (SURVEY.md §7 watch list).
    """
    return F.unix_timestamp(F.col(col).cast("timestamp")).alias("ep")


# ---------------------------------------------------------------- Q29


def q29_tokens_explode_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus terms: split → explode → count (E11/E19).

    100 TB: explode is a streaming generator (no materialized blowup);
    the groupBy does map-side partial aggregation so the shuffle
    carries ≤ |vocab| rows per task, not per-token rows. Top-20 via
    total order (n DESC, term ASC) lowers to TakeOrderedAndProject.
    """
    d = load_table(spark, sf_dir, "documents")
    terms = d.select(F.explode(F.split("text", " ")).alias("term")).filter(
        F.col("term") != ""
    )
    return (
        terms.groupBy("term")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("term").asc())
        .limit(20)
    )


def q29_doc_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-token count per document — pure projection, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.array_distinct(_clean_tokens())).cast("long").alias("n_distinct"),
    )


# ---------------------------------------------------------------- Q30


def q30_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-type count matrix via pivot (E12).

    The pivot value list is EXPLICIT (EVENT_TYPES): with an explicit
    list Spark skips the extra distinct-values job and the output
    schema is static — the only sane form at 100 TB, where an
    unbounded implicit pivot is a driver OOM. One shuffle (groupBy
    day), pivot columns materialize as a single-pass pivot_first agg.
    """
    e = load_table(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day")
    p = e.groupBy(day).pivot("event_type", list(EVENT_TYPES)).count()
    return p.select(
        "day",
        *[
            F.coalesce(F.col(f"`{t}`"), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in EVENT_TYPES
        ],
    )


# ---------------------------------------------------------------- Q31


def q31_sliding_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-min windows sliding every 5 min over events (E23 batch twin).

    Spark's `window(ts, '10 minutes', '5 minutes')` expands each row
    into its ⌈10/5⌉ = 2 candidate windows inline (an Expand node —
    no join, no state), then a normal partial-agg shuffle on the
    window struct. This is exactly how the streaming version
    executes per micro-batch, so the batch twin is plan-faithful.
    Output key is the window-start epoch bigint (rule 2: no raw ts).
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n"), money_sum("value", "sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start").cast("timestamp"))
            .alias("wstart"),
            "n",
            "sum_value",
        )
    )


# ---------------------------------------------------------------- Q32


def q32_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact full-row dedup: union-with-self → dropDuplicates (E15).

    The training-data exact-dedup primitive. `dropDuplicates()` on
    the full row is a hash aggregate on all columns — map-side
    partial dedup first, so at 100 TB the shuffle carries one row
    per distinct value per map task, not the duplicated volume.
    Deterministic because duplicate rows are bit-identical (the
    general keyed case with differing payloads is q32_keyed).
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        ts_str("ts", "ts_s"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    return e.unionAll(e).dropDuplicates()


def q32_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup, earliest-version-wins (E15/E16).

    Synthesizes a conflicting duplicate per key (ts shifted +1h) and
    keeps the min-ts representative via the engine's latest_per_key
    operator (row_number under a total order → WindowGroupLimit;
    single shuffle on the key). This is the CDC mirror image of
    q13_latest's latest-amendment-wins.
    """
    e = load_table(spark, sf_dir, "events")
    shifted = e.withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 HOUR"))
    u = e.unionAll(shifted)
    kept = latest_per_key(u, ["event_id"], [F.col("ts").asc()])
    return kept.select(
        "event_id", ts_str("ts", "ts_s"), "user_id", "event_type", "value", "props"
    )


# ---------------------------------------------------------------- Q33


def q33_jaccard_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard near-dup pairs, sim ≥ 0.5, a < b (E17/E19).

    The deterministic exact twin of MinHash LSH. The threshold test
    is INTEGER arithmetic (3·|A∩B| ≥ |A|+|B| ⟺ J ≥ 0.5), so no pair
    is admitted or dropped by float noise; `sim` is reported rounded
    to 4 digits on top.

    Plan: a TRIANGLE BLOCK JOIN — the distributed all-pairs shape
    that survives 100× scale (no broadcast of the corpus, no
    BroadcastNestedLoopJoin). Docs hash into B buckets; a doc in
    bucket ``b`` is emitted once per bucket-pair group it belongs to
    (left role: (b, j) for j ≥ b; right role: (i, b) for i ≤ b), and
    a plain shuffle EQUI-join on the (i, j) group key brings exactly
    the rows of buckets i and j together. Every unordered doc pair
    meets in exactly one group (same-bucket pairs de-duped by doc_id
    order), so output = the exact pair set. Cost: each side shuffles
    B copies of its (tiny: id + bitmask + count) rows; the O(n²)
    compare work splits into B(B+1)/2 independent key groups of
    (n/B)² pairs — even parallelism at any n, skew-free because
    bucket assignment is a hash. The 100 TB *near-dup* answer is
    still banded MinHash LSH (`lsh_minhash_pairs`); this is the plan
    when the declared contract is EVERY qualifying pair.

    Per-pair cost optimization: when the corpus vocabulary is small
    enough (≤ 512 terms), token sets are dictionary-encoded to
    fixed-width BITMASKS (a broadcast token→bit dim built from the
    data), so per-pair intersection is a handful of AND+popcount ops
    instead of a string hash-set build — ~15× faster at sf0.1,
    identical exact counts. Large vocabularies fall back to
    array_intersect.
    """
    from ..ops.lsh import bitmask_encode, popcount_inter

    d = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(_clean_tokens())
    t = d.select(F.col("doc_id"), toks.alias("toks"), F.size(toks).alias("nt"))
    encoded = bitmask_encode(t)
    if encoded is not None:  # small-vocab bitmask fast path
        side, n_words = encoded
        inter = popcount_inter(n_words, "a", "b")
    else:  # general path: raw token arrays
        side, n_words = t, None
        inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))

    # B(B+1)/2 = 36 key groups; replication = B rows/side. Measured at
    # sf0.1: 8 beats 16 (~20%) — halving replication outweighs the
    # coarser grouping while 36 groups still feed 32 cores. At larger
    # cluster scale raise B so groups ≥ cores (work per group shrinks
    # as B², replication only linearly).
    n_buckets = 8
    # Pin the join's partitioning EXPLICITLY (round-17, guide §2.5):
    # the bucketed sides are a few hundred KB, so AQE's byte-based
    # partition coalescing collapsed the whole B(B+1)/2-group compare
    # stage onto ONE task (measured: a single 3.15 s task computing
    # all ~12.5M popcount comparisons at sf0.1 while 31 cores idled —
    # AQE sizes by bytes and cannot see quadratic compute density).
    # An explicit repartition on the group key is user-specified
    # partitioning, which AQE never coalesces; 4× the group count
    # spreads the 36 groups nearly collision-free (guide: use more
    # partitions than distinct keys when keys are few), and empty
    # partitions cost microseconds. Pair set and values unchanged —
    # partitioning is physical only.
    n_groups = n_buckets * (n_buckets + 1) // 2
    n_parts = 4 * n_groups
    bucketed = side.withColumn(
        "_bkt", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_buckets)).cast("int")
    )
    a = (
        bucketed.withColumn(
            "_pj", F.explode(F.sequence(F.col("_bkt"), F.lit(n_buckets - 1)))
        )
        .withColumnRenamed("_bkt", "_pi")
        .repartition(n_parts, "_pi", "_pj")
        .alias("a")
    )
    b = (
        bucketed.withColumn(
            "_pi", F.explode(F.sequence(F.lit(0), F.col("_bkt")))
        )
        .withColumnRenamed("_bkt", "_pj")
        .repartition(n_parts, "_pi", "_pj")
        .alias("b")
    )
    pairs = (
        a.join(
            b,
            (F.col("a._pi") == F.col("b._pi"))
            & (F.col("a._pj") == F.col("b._pj")),
        )
        # cross-bucket groups (i<j) pair every (a,b) once; same-bucket
        # groups (i==j) contain both orientations — keep one by id
        .filter(
            (F.col("a._pi") < F.col("a._pj"))
            | (F.col("a.doc_id") < F.col("b.doc_id"))
        )
        # size prefilter: J = |∩|/|∪| ≤ min(nt)/max(nt), so pairs
        # whose set sizes differ 2× can never reach 0.5 — dropped on
        # two integers BEFORE the per-pair intersection (a necessary
        # condition only; the admitted pair set is unchanged)
        .filter(
            F.lit(2) * F.least(F.col("a.nt"), F.col("b.nt"))
            >= F.greatest(F.col("a.nt"), F.col("b.nt"))
        )
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
            inter.cast("long").alias("n_inter"),
            (F.col("a.nt") + F.col("b.nt") - inter).cast("long").alias("n_union"),
        )
        .filter(F.lit(3) * F.col("n_inter") >= F.col("n_union") + F.col("n_inter"))
    )
    return pairs.withColumn(
        "sim",
        F.round(
            F.col("n_inter").cast("double") / F.col("n_union").cast("double"), 4
        ),
    )


# ---------------------------------------------------------------- Q34


def q34_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-10 vs the vec_id=0 probe vector (E18/E20).

    Brute-force exact scan — the correct 100 TB plan for a SINGLE
    probe: broadcast the 1-row query vector, scan + TopK
    (TakeOrderedAndProject), no shuffle of the big side. k-NN JOINs
    (many probes) need LSH bucketing instead — ops/lsh.py's
    `ann_brp_topk` rows-only query.

    FP determinism (rule 5): float elements are cast to double
    BEFORE arithmetic; the dot product is an index-ordered
    sequential fold (`zip_with` + `aggregate`), matching DuckDB's
    sequential `list_dot_product` loop bit for bit; the score is
    rounded to 4 digits and the order totalized by vec_id.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    to_d = F.transform("embedding", lambda x: x.cast("double"))
    q = emb.filter(F.col("vec_id") == 0).select(to_d.alias("qe"))
    d = emb.select("vec_id", to_d.alias("e"))

    def dot(x: Column, y: Column) -> Column:
        return F.aggregate(
            F.zip_with(x, y, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    j = d.crossJoin(F.broadcast(q))
    sim = F.round(
        dot(F.col("e"), F.col("qe"))
        / (F.sqrt(dot(F.col("e"), F.col("e"))) * F.sqrt(dot(F.col("qe"), F.col("qe")))),
        4,
    )
    return (
        j.select("vec_id", sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(10)
    )


# ---------------------------------------------------------------- Q35


def q35_tumbling_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows over events (E23 batch twin).

    Tumbling = non-overlapping: `window(ts, '1 hour')` assigns each
    row exactly one window (pure projection + one partial-agg
    shuffle, identical to a date_trunc groupBy). count_if is cast to
    long explicitly (Spark BIGINT vs DuckDB HUGEINT — the q16
    lesson, SURVEY.md §7 watch list).
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n"),
            money_sum("value", "sum_value"),
            F.count_if(F.col("event_type") == "purchase")
            .cast("long")
            .alias("n_purchase"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("wstart"),
            "n",
            "sum_value",
            "n_purchase",
        )
    )


# ---------------------------------------------------------------- Q36


def q36_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-min-gap sessionization per user via gaps-and-islands (E23/E3).

    LAG(ep) → new-session flag (gap > 1800 s) → running SUM = session
    id → per-session aggregates. All arithmetic is on floored
    epoch-second BIGINTs under the total order (ep, event_id), so
    both engines compute identical sessions (SURVEY.md §7 watch
    list). Spark's native `session_window` alternative is asserted
    equivalent in tests/test_extensions.py.

    100 TB: two window passes + the final groupBy all share ONE
    shuffle on user_id (same partition key), and sessionization is
    the canonical per-key ordered scan — exactly what
    Structured Streaming's session_window does incrementally.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", _epoch_s("ts")
    )
    order = [F.col("ep").asc(), F.col("event_id").asc()]
    w = Window.partitionBy("user_id").orderBy(*order)
    prev = F.lag("ep").over(w)
    is_new = F.when(prev.isNull() | (F.col("ep") - prev > 1800), 1).otherwise(0)
    run = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = e.withColumn("session_id", F.sum(is_new).over(run).cast("long"))
    return s.groupBy("user_id", "session_id").agg(
        F.min("ep").alias("sess_start"),
        F.max("ep").alias("sess_end"),
        F.count("*").alias("n_events"),
    )


# ---------------------------------------------------------------- Q37


def q37_window_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function breadth (E3): rank/dense_rank/ntile/
    percent_rank/cume_dist/first_value/last_value + a RANGE frame.

    Two windows, ONE shuffle: both partition on o_custkey, so Spark
    plans a single exchange and two in-partition sorts. The ranked
    window orders by (o_orderpriority) — real ties, exercising the
    rank/dense_rank distinction deterministically (tie functions
    depend only on sort-key values); the frame window orders by
    o_totalprice with RANGE UNBOUNDED..CURRENT, so ties aggregate
    together (order-independent → hash-stable).
    """
    o = load_table(spark, sf_dir, "orders")
    wp = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    wt = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").cast("date"), F.col("o_orderkey")
    )
    wr = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.rank().over(wp).cast("long").alias("rnk"),
        F.dense_rank().over(wp).cast("long").alias("drnk"),
        F.ntile(4).over(wt).cast("long").alias("quartile"),
        F.percent_rank().over(wp).alias("prnk"),
        F.cume_dist().over(wp).alias("cdist"),
        F.first_value("o_orderkey").over(wt).alias("first_key"),
        F.last_value("o_orderkey").over(
            wt.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("last_key"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(12,2)")).over(wr), 2)
        .cast("double")
        .alias("range_sum"),
    )


# ---------------------------------------------------------------- Q38


def q38_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (E1 breadth): high-value vs low-value order
    counts per customer — each side misses customers the other has,
    so null-fill happens in BOTH directions. Shuffle join on the key
    with partial aggs pushed below — at scale both sides pre-shrink
    to ≤ one row per customer before the join."""
    o = load_table(spark, sf_dir, "orders")
    hi = (
        o.filter(F.col("o_totalprice") > 250000)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_hi"))
    )
    lo = (
        o.filter(F.col("o_totalprice") < 50000)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_lo"))
    )
    return (
        hi.join(lo, "o_custkey", "full_outer")
        .select(
            "o_custkey",
            F.coalesce("n_hi", F.lit(0)).alias("n_hi"),
            F.coalesce("n_lo", F.lit(0)).alias("n_lo"),
        )
    )


def q38_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join (E1 breadth): BUILDING-segment customers
    right-joined to all orders — non-BUILDING orders keep a NULL
    customer side; aggregated per orderstatus. Catalyst rewrites
    right to left with sides swapped; broadcast still applies to the
    small build side."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders")
    j = c.join(o, c["c_custkey"] == o["o_custkey"], "right")
    return j.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.count("c_custkey").alias("n_building"),
        F.count_if(F.col("c_custkey").isNull()).cast("long").alias("n_other"),
    )


def q38_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS join (E1 breadth): region × order-status grid with
    per-region revenue — the legitimate cross-join use (tiny dim ×
    tiny dim scaffold, BroadcastNestedLoop over 5×3 rows; NEVER a
    fact×fact shape)."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    s = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(money_sum("o_totalprice", "revenue"))
    )
    return r.crossJoin(F.broadcast(s)).select("r_name", "o_orderstatus", "revenue")


# ---------------------------------------------------------------- Q39


def q39_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash/fingerprint breadth (E21): md5 + sha2-256 content hashes
    over normalized part names — the content-addressing primitives of
    dedup and manifest verification. Pure projection; xxhash64 (no
    DuckDB twin) is exercised by the LSH rows-only queries."""
    p = load_table(spark, sf_dir, "part")
    norm = F.lower(F.trim("p_name"))
    return p.select(
        "p_partkey",
        F.md5(norm).alias("h_md5"),
        F.sha2(norm, 256).alias("h_sha256"),
        F.length(norm).cast("long").alias("n"),
    )


# ---------------------------------------------------------------- Q40


def q40_json_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON breadth (E10): schema-declared from_json (the scale path —
    typed once at the scan edge, no repeated string probing),
    json_tuple (multi-field single-pass extractor), and a to_json
    round-trip. get_json_object is q28's territory."""
    e = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT")
    # json_tuple is a generator expression — it must be a top-level
    # projection item, so extract first and cast in the next select.
    t = e.select(
        "event_id",
        parsed.getField("k").alias("k_typed"),
        F.json_tuple("props", "k").alias("k_raw"),
    )
    return t.select(
        "event_id",
        "k_typed",
        F.col("k_raw").cast("int").alias("k_tuple"),
        F.to_json(F.struct(F.col("k_typed").alias("k"))).alias("round_trip"),
    )


# ---------------------------------------------------------------- Q41


def q41_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set ops (E5 breadth): intersectAll / exceptAll keep
    duplicate multiplicity (both lower to aggregate+generate — one
    shuffle each side, no join explosion); unionByName realigns the
    differently-ordered branches by column name."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderpriority").startswith("1")).select("o_custkey")
    ia = a.intersectAll(b).withColumn("tag", F.lit("intersect_all"))
    ea = a.exceptAll(b).withColumn("tag", F.lit("except_all"))
    return ia.select("tag", "o_custkey").unionByName(
        ea.select("o_custkey", "tag")  # reversed order — ByName realigns
    )


# ---------------------------------------------------------------- Q42


def q42_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (custom operator — Spark lacks it, DuckDB has it
    natively, which makes the oracle exact): each purchase event
    attaches the user's most recent click at-or-before it.

    Plan (ops/asof.py union-sentinel): one shuffle on user_id + one
    in-partition sort — linear, no range-join explosion. Output
    timestamps as floored epoch seconds (rule 2).
    """
    from ..ops.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("click_ep"),
    )
    j = asof_join(
        purchases, clicks, key="user_id",
        payload=["click_id", "click_ep"], tiebreak="click_id",
    )
    return j.select(
        "event_id",
        "user_id",
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("purchase_ep"),
        "click_id",
        "click_ep",
    )


# ---------------------------------------------------------------- Q43


def q43_unpivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (E12's second half): the q30 wide day×event_type
    count matrix melted back to long form with `DataFrame.unpivot`
    (SQL `UNPIVOT` / melt). Zero-count cells survive the round-trip —
    that is the semantic difference vs a plain groupBy, and the
    oracle builds the same dense day×type grid to match.

    100 TB: unpivot is a generator projection (each input row emits
    |value columns| output rows, no shuffle); the only shuffle is the
    upstream pivot groupBy. Wide→long at scale beats re-reading the
    fact table when the wide matrix is already materialized.
    """
    wide = q30_pivot_events(spark, sf_dir).select(
        "day", *[F.col(f"n_{t}").alias(t) for t in EVENT_TYPES]
    )
    return wide.unpivot(
        ids=["day"],
        values=list(EVENT_TYPES),
        variableColumnName="event_type",
        valueColumnName="n",
    )


# ---------------------------------------------------------------- Q44


def q44_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS (E2 breadth beyond rollup/cube): exactly the
    three aggregation levels ((status), (priority), ()) — the shape
    rollup/cube can't express — plus `grouping()` flags to tag which
    level each row belongs to.

    100 TB: Spark plans grouping sets as a single Expand + one
    hash-aggregate pass (one shuffle) — but the Expand multiplies
    input rows by |sets|, so (as in q14/q15) the fact table is
    pre-aggregated to the base grain first and the Expand runs over
    ≤|groups| partial rows. Decimal partials stay unrounded so the
    re-aggregation is exact.
    """
    o = load_table(spark, sf_dir, "orders")
    base = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("pn"),
        F.sum(dec("o_totalprice")).alias("pt"),
    )
    return (
        base.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            # grouping() is only legal inside the grouping-sets agg
            (
                F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority")
            ).cast("long").alias("gid"),
            F.sum("pn").alias("n"),
            F.round(F.sum("pt"), 2).cast("double").alias("revenue"),
        )
    )


# ---------------------------------------------------------------- Q45


def q45_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order-function breadth (E11): sort/distinct/
    slice/join, `array_contains`, `arrays_overlap`, and a
    higher-order `aggregate` fold with a `transform` inside — all
    JVM-side codegen'd expressions over the documents token arrays.

    100 TB: pure projection — no shuffle, no explode blowup (the
    fold aggregates in-row), predicate-pushdown-friendly scan.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = _clean_tokens()
    stop = F.array(*[F.lit(s) for s in ("the", "a", "of")])
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_toks"),
        F.array_join(
            F.slice(F.array_sort(F.array_distinct(toks)), 1, 3), "-"
        ).alias("first3"),
        F.array_contains(toks, "the").alias("has_the"),
        F.arrays_overlap(toks, stop).alias("has_stop"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
    )


# ---------------------------------------------------------------- Q46


def q46_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-function breadth (E11 companion): build a map from a
    delimited string (`str_to_map` — the classic log/KV parse), then
    exercise `element_at` lookup, `map_keys`, `size`, and
    `map_contains_key`. The map never leaves the row (scalar
    outputs), so the oracle verifies every lookup against the same
    values derived from the source columns directly.

    100 TB: all map construction/lookup is per-row codegen'd
    expression work — no shuffle, no UDF; exactly how ad-hoc KV
    payloads should be cracked before a columnar rewrite.
    """
    e = load_table(spark, sf_dir, "events")
    kv = F.concat(
        F.lit("k="),
        F.get_json_object("props", "$.k"),
        F.lit(",type="),
        F.col("event_type"),
    )
    m = F.str_to_map(kv, F.lit(","), F.lit("="))
    return e.select(
        "event_id",
        F.element_at(m, "k").cast("int").alias("k_val"),
        F.element_at(m, "type").alias("type_val"),
        F.size(m).cast("long").alias("n_keys"),
        F.map_contains_key(m, "type").alias("has_type"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
    )


# ---------------------------------------------------------------- Q47


def q47_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram / value binning (E13 breadth): fixed-width buckets
    of o_totalprice (floor division — IEEE-identical in any engine,
    unlike a (x-lo)/(hi-lo)*n formulation whose intermediate rounding
    differs), with per-bin count and exact decimal revenue.

    100 TB: the bucket is a scalar projection, the aggregate is one
    map-side-combined groupBy on ≤ #bins keys — the cheapest possible
    shuffle (bins, not rows, cross the wire).
    """
    o = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / F.lit(30000.0)).cast("int")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(dec("o_totalprice")), 2).cast("double").alias("sum_price"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------- Q48


def q48_calendar_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series generation (the calendar-spine idiom): `sequence` +
    `explode` builds the 12 months of 1995, left-joined with monthly
    order counts so ZERO months survive — the dense-time-axis shape
    every reporting pipeline needs (a bare groupBy drops empty
    months).

    100 TB: the spine is 12 literal rows broadcast to the join; the
    fact side is one groupBy on the truncated month (low-cardinality
    keys, map-side combine), with the year filter pushed to the scan.
    """
    import datetime as _dt

    o = load_table(spark, sf_dir, "orders")
    months = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(_dt.date(1995, 1, 1)),
                F.lit(_dt.date(1995, 12, 1)),
                F.expr("interval 1 month"),
            )
        ).alias("month")
    )
    counts = (
        o.filter(
            (F.col("o_orderdate") >= F.lit(_dt.date(1995, 1, 1)))
            & (F.col("o_orderdate") < F.lit(_dt.date(1996, 1, 1)))
        )
        .groupBy(F.trunc("o_orderdate", "month").alias("month"))
        .agg(F.count("*").alias("n_orders"))
    )
    return (
        F.broadcast(months)
        .join(counts, "month", "left")
        .select(
            "month",
            F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------- Q49


def q49_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (E2 breadth): collect_set →
    array_sort → array_join per group — the deterministic Spark
    spelling of SQL's STRING_AGG(DISTINCT ... ORDER BY ...). The
    explicit sort is what makes a set-collection emission
    hash-stable across partitionings (SURVEY §2.6 determinism rule).

    100 TB: collect_set does map-side partial set union; the value
    domain (order priorities) is tiny, so state per group is bounded
    regardless of row count.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("o_orderpriority")), "|"
            ).alias("priorities"),
            F.count_distinct("o_orderpriority").cast("long").alias("n_prio"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------- Q50


def q50_bit_bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise + boolean aggregate breadth (E2): per-user bit_and /
    bit_or / bit_xor over event ids (integer-exact, order-independent
    — XOR/AND/OR are commutative so distribution cannot change the
    answer) and bool_and / bool_or predicates.

    100 TB: all five are single-value accumulators with map-side
    partials — constant state per key, one shuffle.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(
            F.bit_and("event_id").alias("b_and"),
            F.bit_or("event_id").alias("b_or"),
            F.bit_xor("event_id").alias("b_xor"),
            F.bool_and(F.col("value") > 0).alias("all_pos"),
            F.bool_or(F.col("event_type") == "purchase").alias("any_purchase"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------- Q51


def q51_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 proper — local supplier volume (E1 join-graph
    showcase): 6-table join where the local-supplier constraint
    (c_nationkey = s_nationkey) closes a CYCLE in the join graph, the
    shape that stresses join ordering. Revenue per ASIA nation for
    1995, exact decimal.

    100 TB plan: region/nation/supplier broadcast (supplier is the
    smallest fact-adjacent dim here); lineitem⋈orders⋈customer
    shuffle on their keys; the nationkey equality rides the supplier
    join as a residual equi-condition instead of a post-join filter,
    so no oversized intermediate materializes. The date range is a
    pushed scan predicate (never `year(col) ==`).
    """
    from ._util import RATE

    r = F.broadcast(load_table(spark, sf_dir, "region"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = dec("l_extendedprice") * (
        F.lit(1).cast(RATE) - dec("l_discount", RATE)
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),  # the Q5 cycle edge
        )
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .filter(
            (F.col("r_name") == "ASIA")
            & (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
        )
        .groupBy("n_name")
        .agg(
            F.round(F.sum(revenue), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


# ---------------------------------------------------------------- Q52


def q52_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-click follow-on views within 10 minutes — the interval
    (range) join family (E1), via :func:`calaspark.ops.rangejoin.
    interval_join`'s bin-bucketed plan.

    For every 'click' event: how many 'view' events the same user
    produced in the window (click_ts, click_ts + 600s], and their
    value total. Clicks with no views are kept (zero counts) by
    aggregating the inner interval join and LEFT-joining back —
    the scale-safe outer composition the operator documents.

    100 TB plan: no BNLJ anywhere — both sides shuffle once on
    (user_id, time-bin); only the small click side replicates (≤2
    bins); the join-back is a plain equi left join on click_id.
    """
    from ..ops.rangejoin import interval_join

    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts"), "user_id"
    )
    views = e.filter(F.col("event_type") == "view").select(
        F.col("ts").alias("v_ts"), "user_id", "value"
    )
    # (c_ts, c_ts+600] on integer epoch seconds == [c_ts+1, c_ts+601)
    pairs = interval_join(
        clicks,
        views,
        left_ts="c_ts",
        right_ts="v_ts",
        lower=1,
        upper=601,
        on=("user_id",),
    )
    per_click = pairs.groupBy("click_id").agg(
        F.count(F.lit(1)).alias("n_views"),
        money_sum("value", "sum_view_value"),
    )
    return clicks.join(per_click, "click_id", "left").select(
        "click_id",
        "user_id",
        ts_str("c_ts", "click_ts"),
        F.coalesce("n_views", F.lit(0)).alias("n_views"),
        F.coalesce("sum_view_value", F.lit(0.0)).alias("sum_view_value"),
    )


# ---------------------------------------------------------------- Q53


def q53_small_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — correlated scalar subquery, decorrelated
    (E2/E3): revenue from Brand#4 line items whose quantity is below
    20% of that part's average quantity.

    Spark-first decorrelation: broadcast the brand-filtered part
    keys into the lineitem scan (predicate reaches the scan as a
    runtime filter), then ONE shuffle on l_partkey computes the
    per-part sum/count as window aggregates over the same
    partitioning the filter needs — no second scan of the fact, no
    self-join. The 0.2·avg threshold is compared in exact integer
    arithmetic (qty < q_sum/(5n) ⟺ 5·qty·n < q_sum; quantities are
    integral), so both engines admit identical rows — no float
    boundary (SURVEY.md §2.6).
    """
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#4")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("bigint").alias("qty"),
        "l_extendedprice",
    )
    w = Window.partitionBy("l_partkey")
    s = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .drop("p_partkey")
        .withColumn("q_sum", F.sum("qty").over(w))
        .withColumn("n", F.count(F.lit(1)).over(w))
    )
    return s.filter(5 * F.col("qty") * F.col("n") < F.col("q_sum")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.countDistinct("l_partkey").alias("n_parts"),
        money_sum("l_extendedprice", "small_order_revenue"),
    )


# ---------------------------------------------------------------- Q54


def q54_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count statistics per document (E19): whitespace tokens
    and BPE-ish pre-tokenization counts (words / digit runs / single
    symbols — `calaspark.ops.text.BPE_ISH`), plus character length.

    The counting a training-data pipeline budgets with. All three
    are single codegen expressions over the text column — no
    Python, no shuffle (a pure projection; the scan prunes to
    (doc_id, text)).
    """
    from ..ops.text import bpe_ish_count, token_count

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        token_count("text").alias("n_ws_tokens"),
        bpe_ish_count("text").alias("n_bpe_tokens"),
    )


# ---------------------------------------------------------------- Q55


def q55_quality_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact document quality counters (E19) — the oracled
    core of `calaspark.ops.text.quality_features`: char/token
    counts, total token length, punctuation chars, digit chars,
    English stopword hits. The ratio forms (floats) stay in the
    rows-only `text_quality` demo; everything here is exact long
    arithmetic, so the hash gate is airtight (SURVEY.md §2.6).

    Plan: pure projection over (doc_id, text) — column-pruned scan,
    zero shuffles, all codegen expressions.
    """
    from ..ops.text import STOPWORDS, tokens

    c = F.col("text")
    toks = tokens("text")
    stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length(c).cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
        ).alias("sum_token_len"),
        F.length(F.regexp_replace(c, r"[^!-/:-@\[-`{-~]", ""))
        .cast("long")
        .alias("n_punct"),
        F.length(F.regexp_replace(c, r"[^0-9]", "")).cast("long").alias("n_digit"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop, F.lower(t))))
        .cast("long")
        .alias("n_stop_en"),
    )


# ---------------------------------------------------------------- Q181


def _state_partitions(
    spark: SparkSession,
    sf_dir: str,
    table: str = "events",
    est_rows: int | None = None,
) -> int:
    """Size a drain gate's streaming-state partitioning to the
    bounded backfill's volume (see drain_snapshot's state_partitions
    note for the measured rationale): parquet footer row count /
    25k rows per state partition, clamped to [2, session shuffle
    default]. The count() is footer metadata (parquet row-group
    counts — no column data read). On a production continuous stream
    the operator sizes this to expected in-horizon state instead; for
    an availableNow drain the source's total row count IS that
    bound.

    ``est_rows`` overrides the footer row count when the stateful
    exchange's row grain differs from the source table's (round-17
    advice closure): q190 explodes documents to tokens BEFORE its
    stateful groupBy, so the rows flowing through the state exchange
    outnumber documents by the avg-tokens factor — see
    :func:`_token_volume_estimate`."""
    import math

    n = (
        int(est_rows)
        if est_rows is not None
        else spark.read.parquet(f"{sf_dir}/{table}.parquet").count()
    )
    cur = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return max(2, min(cur, math.ceil(n / 25_000)))


def _token_volume_estimate(sf_dir: str, table: str = "documents") -> int | None:
    """Footer-only estimate of a text table's EXPLODED token volume,
    for sizing a token-grain stateful exchange (q190 — round-17
    advice closure). The text column's total UNCOMPRESSED byte size
    sits in the parquet column-chunk metadata (no data pages read —
    the same cost class as the footer row count); at ~6 bytes per
    whitespace token (five letters + one separator, the English
    average) bytes/6 is an order-of-magnitude row estimate — which is
    all state sizing needs, since the partition count moves in 25k-row
    steps and is clamped to the bucket-count ceiling at the call
    site. Returns ``None`` when the single-file pyarrow read fails
    (e.g. a MULTI-FILE table — exactly the shape a large corpus has):
    ``est_rows=None`` makes :func:`_state_partitions` fall back to
    the Spark footer row count, which reads multi-file directories
    natively and stays volume-proportional — a constant floor here
    would quietly collapse a big table's token-grain state onto 2
    partitions."""
    import pyarrow.parquet as pq

    path = f"{sf_dir}/{table}.parquet"
    try:
        md = pq.ParquetFile(path).metadata
        for i in range(md.num_columns):
            if md.row_group(0).column(i).path_in_schema == "text":
                tot = sum(
                    md.row_group(g).column(i).total_uncompressed_size
                    for g in range(md.num_row_groups)
                )
                return max(1, tot // 6)
        return md.num_rows
    except Exception:  # noqa: BLE001 — sizing heuristic, never fatal
        return None


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared file-source stream over the events table for the
    q181/q183/q184/q185/q187/q188 true-streaming gates: declared
    schema (footer read), event time as TIMESTAMP (LTZ — watermarks
    reject NTZ; prepare() pins the session to UTC so formatting
    matches the NTZ batch twins), ns sources truncated with
    load_table's expression."""
    from ..session import prepare

    prepare(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = spark.readStream.schema(schema).parquet(
        f"{sf_dir}/events.parque[t]"
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        return stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


#: Monotone suffix for q181's memory-sink table: bench re-runs the
#: query in one session, and each drained run must land in its own
#: temp view (complete-mode memory sinks replace content per trigger,
#: but a stale view from a prior run must never satisfy a new call).
_Q181_SEQ = iter(range(1_000_000))


def q181_stream_tumbling_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE Structured Streaming execution under the hash gate (E23).

    Round-10 verdict gap: every driver-green E23 entry so far was a
    *batch twin* — the actual ``StreamingQuery`` machinery ran only
    in pytest. This query puts a real streaming run in the oracle
    gate: a file-source stream over the events parquet, the q35
    tumbling-window aggregation with a watermark, drained to
    completion with ``trigger(availableNow=True)`` through a real
    ``writeStream`` (memory sink, complete mode), then the drained
    table is returned as a batch DataFrame. The oracle is q35's SQL
    verbatim — a drained bounded stream must equal its batch twin
    bit for bit (counts, exact-decimal sums, formatted window
    starts).

    Scale notes: the streaming agg shuffles on the same window key as
    the batch twin, and state is bounded by the watermark horizon. At
    100 TB the memory sink becomes a parquet/foreachBatch sink
    (streaming/sinks.py has the idempotent CDC variant); `availableNow`
    is exactly the backfill trigger a production pipeline uses to
    catch up a lakehouse table, so this shape IS the deployment
    shape, not a test-only approximation.

    Determinism: complete-mode output after a full drain is the full
    aggregate over all input — watermark only governs state eviction
    mid-run and drops nothing here (single bounded drain, all data
    available at start). ns→µs normalization is load_table's exact
    expression, applied to the declared-schema stream.
    """
    from ..streaming.windows import drain_snapshot

    # Stream setup (declared schema, directory glob, ns→µs, LTZ event
    # time under the UTC session) is the shared _events_stream helper
    # — one copy, so the footer-read/watermark-type rules can't drift
    # between the five streaming gates.
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n"),
            money_sum("value", "sum_value"),
            F.count_if(F.col("event_type") == "purchase")
            .cast("long")
            .alias("n_purchase"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "wstart"
            ),
            "n",
            "sum_value",
            "n_purchase",
        )
    )
    name = f"q181_drain_{next(_Q181_SEQ)}"
    return drain_snapshot(
        agg,
        name,
        output_mode="complete",
        state_partitions=_state_partitions(spark, sf_dir),
    )


# ---------------------------------------------------------------- Q183


_Q183_SEQ = iter(range(1_000_000))


def q183_stream_sliding_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming sliding-window aggregation under the hash gate
    (E23): q31's 10-min/5-min sliding count+sum as a watermarked
    streaming query, drained with ``availableNow`` through a real
    ``writeStream`` (memory sink, complete mode). Oracle = q31's SQL
    verbatim. The streaming plan is the SAME Expand → partial-agg →
    shuffle the batch twin runs per micro-batch (q31 docstring), plus
    the state store on the window key — bounded by the watermark
    horizon at any scale. See q181 for why the drained complete-mode
    result equals the batch aggregate bit for bit.
    """
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n"), money_sum("value", "sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("wstart"),
            "n",
            "sum_value",
        )
    )
    from ..streaming.windows import drain_snapshot

    name = f"q183_drain_{next(_Q183_SEQ)}"
    return drain_snapshot(
        agg,
        name,
        output_mode="complete",
        state_partitions=_state_partitions(spark, sf_dir),
    )


# ---------------------------------------------------------------- Q184


_Q184_SEQ = iter(range(1_000_000))


def q184_stream_dedup_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE STATEFUL streaming dedup under the hash gate (E15 × E23):
    ``dropDuplicatesWithinWatermark`` on (user_id, event_type) over
    the events stream, drained with ``availableNow`` through a real
    ``writeStream`` (append mode — dedup emits each surviving row
    once). The projection keeps ONLY the key columns, so "which
    duplicate survived" — nondeterministic across shuffle partitions
    — never reaches the output: the drained table is exactly the
    distinct key set, and the oracle is a two-column DISTINCT.

    State/scale contract: per-key state lives in the state store
    hash-partitioned on the dedup key and is evicted once the
    watermark passes a key's last-seen event time — bounded state at
    any throughput, unlike plain streaming ``dropDuplicates`` whose
    state grows forever. A key recurring AFTER its state expired
    would re-emit (the documented watermark trade-off); the gate
    corpus drains in one micro-batch where no state expires mid-run,
    so the append output is exactly-once per key.
    """
    stream = _events_stream(spark, sf_dir)
    deduped = (
        stream.select("ts", "user_id", "event_type")
        .withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    from ..streaming.windows import drain_snapshot

    name = f"q184_drain_{next(_Q184_SEQ)}"
    return drain_snapshot(
        deduped,
        name,
        output_mode="append",
        state_partitions=_state_partitions(spark, sf_dir),
    )


# ---------------------------------------------------------------- Q185


_EXIT_DIRS: list[str] = []


def _cleanup_at_exit(path: str) -> None:
    """Register a temp dir for end-of-process removal (q185's upsert
    target — must outlive the call, must not outlive the process).
    One atexit hook, registered lazily on first use, sweeps the
    accumulated list; ignore_errors because cleanup is hygiene, not
    correctness."""
    import atexit
    import shutil

    if not _EXIT_DIRS:
        atexit.register(
            lambda: [shutil.rmtree(p, ignore_errors=True) for p in _EXIT_DIRS]
        )
    _EXIT_DIRS.append(path)


def q185_stream_cdc_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming CDC MERGE sink under the hash gate (E16 × E23):
    the events stream drains through a real ``writeStream
    .foreachBatch`` running the idempotent generation-swap MERGE
    (streaming/sinks.merge_upsert) that maintains a latest-row-per-
    user table; the published generation is returned and checked
    against a window-rank oracle. This closes the last streaming gap
    the round-10 verdict named: q181/q183/q184 gate streaming
    *aggregation/dedup*; this gates the streaming *sink protocol*
    (within-batch latest_per_key collapse → full-outer MERGE →
    atomic generation-pointer flip).

    Determinism: the version order is (floored-epoch-second DESC,
    event_id DESC) — epoch-second flooring is identical across
    engines (the q36 rule; raw ns-vs-µs timestamps never order or
    leave the query), and event_id breaks all remaining ties, so the
    surviving row per user is data-determined. All output columns
    are stored values, no aggregation.

    Scale/restart contract: at-least-once micro-batch delivery
    (checkpoint) + the MERGE's absorbing idempotency = effectively-
    once; each batch pays one join keyed on user_id against the
    current generation (broadcast when the delta is small); a crash
    mid-merge leaves the previous generation's pointer intact.
    """
    import tempfile

    from ..streaming.sinks import foreach_batch_upsert, read_upsert_table

    stream = _events_stream(spark, sf_dir).select(
        "user_id",
        F.unix_timestamp("ts").alias("ep"),
        "event_id",
        "event_type",
        "value",
    )
    target = tempfile.mkdtemp(prefix="q185_cdc_")
    ckpt = tempfile.mkdtemp(prefix="q185_ckpt_")
    # The TARGET dir must outlive this call (the returned DataFrame
    # reads its published generation lazily) but not the process:
    # each generation holds a full copy of the upsert table, so
    # repeated bench/driver calls would otherwise accumulate dirs
    # for the host lifetime (round-17 advice closure). atexit is the
    # narrowest hook that is still after every possible read.
    _cleanup_at_exit(target)
    q = (
        stream.writeStream.foreachBatch(
            foreach_batch_upsert(
                target,
                "user_id",
                [F.col("ep").desc(), F.col("event_id").desc()],
            )
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert q.lastProgress is not None  # a StreamingQuery really ran
    # The checkpoint exists only to drive this one bounded drain —
    # delete it so repeated calls don't accumulate dirs (round-16
    # drain hygiene; the TARGET dir must outlive the call: the
    # returned DataFrame reads its published generation lazily).
    import shutil

    shutil.rmtree(ckpt, ignore_errors=True)
    out = read_upsert_table(spark, target)
    assert out is not None  # at least one generation committed
    return out.select("user_id", "ep", "event_id", "event_type", "value")


# ---------------------------------------------------------------- Q187


_Q187_SEQ = iter(range(1_000_000))


def q187_stream_session_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming SESSION-window aggregation under the hash gate
    (E23) — the round-11 verdict's missing window family: q181/q183/
    q184/q185 gate tumbling/sliding/dedup/sink, this gates native
    ``session_window`` (streaming/windows.session_counts is the
    operator; its pytest twin asserted batch≡stream, but no hash slot
    executed it). A watermarked session-window aggregation over the
    events stream, drained with ``availableNow`` through a real
    ``writeStream`` (memory sink, complete mode — append would
    withhold every session inside the final watermark horizon, q181
    docstring has the full argument).

    Oracle = q36's gaps-and-islands SQL minus the ordinal session_id
    (sessions are identified by their data-determined (user_id,
    sess_start) instead of a running index — same rows, no window
    ordinal to replay).

    Boundary semantics (the one trap): q36 defines "same session" as
    floored-second gap ≤ 1800, and native session_window merges an
    event that lands EXACTLY on the session end (inclusive boundary —
    measured: a pair exactly 1801 s apart merges under gap=1801s,
    splitting only under gap=1800s; tests pin this). Feeding the
    window FLOORED-second timestamps with gap = 1800 s therefore
    makes the two rules identical — inclusive int_gap ≤ 1800 — so
    the streaming sessions equal the batch islands exactly;
    min/max/count aggregates are then order-independent.

    Scale: session-window state is partitioned on user_id (the extra
    grouping key) and merged incrementally per micro-batch; the
    watermark bounds how long an open session can wait for late
    events — per-key bounded state at any throughput, the same
    contract as the batch twin's single user_id shuffle.
    """
    from ..streaming.windows import drain_snapshot

    stream = _events_stream(spark, sf_dir)
    ev = stream.select(
        "user_id",
        F.timestamp_seconds(F.unix_timestamp("ts")).alias("fts"),
        F.unix_timestamp("ts").alias("ep"),
    )
    agg = (
        ev.withWatermark("fts", "2 hours")
        .groupBy(
            "user_id", F.session_window("fts", "1800 seconds").alias("w")
        )
        .agg(
            F.min("ep").alias("sess_start"),
            F.max("ep").alias("sess_end"),
            F.count("*").alias("n_events"),
        )
        .select("user_id", "sess_start", "sess_end", "n_events")
    )
    name = f"q187_drain_{next(_Q187_SEQ)}"
    return drain_snapshot(
        agg,
        name,
        output_mode="complete",
        state_partitions=_state_partitions(spark, sf_dir),
    )


# ---------------------------------------------------------------- Q188


_Q188_SEQ = iter(range(1_000_000))


def q188_stream_stream_join_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE STREAM-STREAM interval join under the hash gate (E1 × E23)
    — the last E23 family outside the oracle (round-11 verdict gap 4):
    streaming/windows.interval_join_stream ran only in pytest. Two
    independent file-source streams over the events table (clicks ⋈
    views), joined on user_id + the half-open event-time window
    (click_ts, click_ts + 24 h] — the attribution horizon; q52's
    10-minute window yields single-digit pairs at the gate scale, a
    vacuous check — drained with ``availableNow`` through a real
    ``writeStream`` (append mode — Spark's stream-stream inner-join
    contract emits each matched pair exactly once, so append IS the
    complete answer; no watermark-withheld tail exists for inner
    joins).

    Oracle = the q52-family interval-join SQL, kept at PAIR grain
    (q52's batch form aggregates per click; the streaming contract is
    append-only pairs, so the gate checks the join itself).

    Determinism: the join window is evaluated on FLOORED-second
    timestamps — ``[c+1, c+86401)`` on integer seconds in both
    engines (q52's exact bound rule at the 24 h horizon) — and every
    output column is a stored value, so the pair set is
    data-determined regardless of micro-batch interleaving.

    Scale: both sides' state is hash-partitioned on user_id; the
    watermarks plus the two-sided time bound let the engine prove a
    click row dead once the view watermark passes click_ts + 24 h
    and evict it — state bounded by (window span + watermark) of
    throughput at any scale, which is exactly why
    interval_join_stream refuses an unbounded condition.
    """
    from ..streaming.windows import drain_snapshot, interval_join_stream

    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.timestamp_seconds(F.unix_timestamp("ts")).alias("c_ts"),
        )
    )
    views = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.timestamp_seconds(F.unix_timestamp("ts")).alias("v_ts"),
            "value",
        )
    )
    pairs = interval_join_stream(
        clicks,
        views,
        left_ts="c_ts",
        right_ts="v_ts",
        lower=1,
        upper=86401,
        on=(("c_user", "v_user"),),
        watermark="2 hours",
    )
    out = pairs.select(
        "click_id",
        F.col("c_user").alias("user_id"),
        F.unix_timestamp("c_ts").alias("click_ep"),
        "view_id",
        F.unix_timestamp("v_ts").alias("view_ep"),
        "value",
    )
    name = f"q188_drain_{next(_Q188_SEQ)}"
    return drain_snapshot(
        out,
        name,
        output_mode="append",
        state_partitions=_state_partitions(spark, sf_dir),
    )


# ---------------------------------------------------------------- Q190


_Q190_SEQ = iter(range(1_000_000))


def q190_stream_heavy_hitters_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE ``applyInPandasWithState`` streaming under the hash gate
    (E22 × E23) — the round-12 verdict's last streaming gap: the
    arbitrary-state family (streaming/stateful.py) ran only in
    pytest; every other E23 family already drains under the oracle
    (q181 tumbling, q183 sliding, q184 dedup, q185 foreachBatch CDC,
    q187 session, q188 stream-stream join).

    Two stages, one answer — q113's exact heavy hitters:

    1. **Streaming candidate pass** — a file-source stream over the
       documents parquet, tokens exploded, then
       ``streaming.stateful.heavy_hitters_stream``: per-bucket
       mergeable Misra-Gries summaries held as ``GroupState`` across
       micro-batches (capacity K=32, 8 hash buckets), drained with
       ``trigger(availableNow)`` through a real ``writeStream``
       (memory sink, update mode — each micro-batch emits the
       touched buckets' current summaries; the drained table's tok
       union therefore contains the final state's keys).
    2. **Batch recount** — ``ops.heavy.recount_candidates`` over the
       distinct drained candidates at threshold k=30: exact counts
       for candidates only, threshold filter ``cnt*30 > N``.

    Determinism despite stateful streaming: the candidate SET varies
    with micro-batch/Arrow-chunk boundaries, but it is always a
    SUPERSET of the true heavy hitters — a token with global count
    > N/30 has, in its own bucket, count > n_bucket/30 > n_bucket/33
    = n_bucket/(K+1), and the merged MG summary's error bound
    (Agarwal et al., mergeable summaries) keeps its counter positive
    in the final state, whose keys the last touching micro-batch
    emitted. The recount replaces estimates with exact counts and
    drops false positives, so the output equals the naive full
    groupBy — which is the DuckDB oracle (q113's SQL verbatim).

    Scale: stream state is O(K × buckets) FOREVER — independent of
    stream length and key cardinality (the whole point vs a
    streaming groupBy(tok).count() whose state is the vocabulary);
    the recount is one batch scan + candidate semi-join. The memory
    sink holds only candidate summaries (≤ K × buckets rows per
    micro-batch) — model-sized by construction, unlike a data-grain
    complete-mode aggregate.
    """
    from ..ops.heavy import recount_candidates
    from ..ops.text import tokens
    from ..session import prepare
    from ..streaming.stateful import heavy_hitters_stream
    from ..streaming.windows import drain_snapshot

    prepare(spark)
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    tok_stream = (
        spark.readStream.schema(schema)
        .parquet(f"{sf_dir}/documents.parque[t]")
        .select(F.explode(tokens("text")).alias("tok"))
    )
    name = f"q190_drain_{next(_Q190_SEQ)}"
    # State sizing (round-17 advice closure): this gate's stateful
    # exchange carries one row per EXPLODED token — orders of
    # magnitude more than the documents row count the other gates
    # size by — so the volume estimate is the text column's footer
    # byte size / 6 (see _token_volume_estimate). The ceiling is the
    # Misra-Gries BUCKET count: the stateful groupBy keys on the
    # 8-way hash bucket, so partitions beyond 8 are empty by
    # construction no matter the token volume.
    sink = drain_snapshot(
        heavy_hitters_stream(tok_stream),
        name,
        output_mode="update",
        state_partitions=min(
            8,
            _state_partitions(
                spark,
                sf_dir,
                "documents",
                est_rows=_token_volume_estimate(sf_dir),
            ),
        ),
    )
    cands = sink.select("tok").distinct()
    items = load_table(spark, sf_dir, "documents").select(
        F.explode(tokens("text")).alias("tok")
    )
    return recount_candidates(items, "tok", 30, cands)


# ---------------------------------------------------------------- Q191


def q191_prefix_match_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-prefix-match join (E1 family — round-13 verdict ask 5;
    ops/lpm.py carries the scale design): a dial-plan-style route
    table matched against a lookup key space, LONGEST prefix wins,
    then a per-route rollup with an explicit unmatched bucket.

    The synthetic tables carry no phone/IP column, so the code space
    is derived deterministically: ``reverse(lpad(key, 12, '0'))`` —
    reversal makes the LEADING characters high-entropy (the last
    digits of the key), giving a uniform hierarchical namespace in
    which prefix density is controlled exactly. Routes come from
    supplier keys at three lengths/densities (plen 1 from even
    suppliers, plen 3 from s%3=0, plen 5 from all), lookups are the
    customer keys — so longest-wins, mixed-density fallback AND the
    unmatched bucket are all exercised at every SF.

    100 TB: the ONLY driver-side collect is the distinct prefix
    LENGTH set (≤ max prefix length by construction — model-sized,
    like q71's query batch); the lookup side explodes ×3 bounded
    arms and hash-joins on (prefix, plen) — AQE broadcasts the small
    route table here, and a billion-route table degrades to a
    shuffle equi-join, never a nested loop. Longest-wins is a
    row_number→WindowGroupLimit keyed on c_custkey (parallelism
    scales with customers, not routes). Left semantics ride the SAME
    pass (ops/lpm.py ``how="left"``): no anti-join, no second
    customer scan, no 1-row global aggregate for the unmatched
    bucket — it is just another group. The route table reads
    supplier ONCE (conditional-arm explode instead of a 3-way
    union). The oracle spells the same semantics as a lateral-style
    theta join + window, so the driver hash proves the
    expand-on-length decomposition exact.
    """
    from ..ops.lpm import prefix_match_join

    d = F.reverse(F.lpad(F.col("s_suppkey").cast("string"), 12, "0"))
    routes = (
        load_table(spark, sf_dir, "supplier")
        .select(
            F.explode(
                F.array(
                    F.when(F.col("s_suppkey") % 2 == 0, F.substring(d, 1, 1)),
                    F.when(F.col("s_suppkey") % 3 == 0, F.substring(d, 1, 3)),
                    F.substring(d, 1, 5),
                )
            ).alias("prefix")
        )
        .filter(F.col("prefix").isNotNull())
        .distinct()
    )
    lk = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.reverse(F.lpad(F.col("c_custkey").cast("string"), 12, "0")).alias(
            "k"
        ),
    )
    best = prefix_match_join(
        lk,
        routes,
        key_col="k",
        row_key="c_custkey",
        prefix_col="prefix",
        how="left",
    )
    return (
        best.groupBy(
            F.coalesce(F.col("matched_prefix"), F.lit("(none)")).alias(
                "matched_prefix"
            ),
            F.col("match_len").cast("long").alias("match_len"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("c_custkey").cast("long").alias("min_custkey"),
            F.max("c_custkey").cast("long").alias("max_custkey"),
        )
        .orderBy(F.desc("match_len"), F.asc("matched_prefix"))
    )
