"""Round-5/6 breadth queries (SURVEY.md §2.6): CDC merge-upsert,
time-series gap fill, LLM-pipeline document ops (chunking, repetition
quality, PII redaction, dataset split, sequence packing, mixture
sampling, substring decontamination), error-tolerant typing
(`try_*`), exact-sum statistical moments, and outer explode.

Reference anchor: the reference's own surface stops at load + ORM SQL
(SURVEY.md §2.3/§2.4); everything here is either a relational-surface
completion (q56, q61, q62, q63 — what its users run on the loaded
tables) or a north-star LLM-pipeline extension (q57–q60). Every query
follows the §2.6 determinism rules — exact decimal/integer arithmetic
wherever a value feeds the hash gate, deterministic total orders
before any LIMIT, no raw timestamps.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..tables import load_table
from ._util import dec

#: Redaction patterns (q60). Kept to syntax valid in BOTH Java regex
#: (Spark) and RE2 (DuckDB): no lookaround, no backrefs.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+1-555-[0-9]{4}"
CARD_RE = r"\b[0-9]{16}\b"


# ---------------------------------------------------------------- Q56


def q56_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE / SCD-1 upsert (E16 completion): apply a change set
    (updates + inserts) to the `orders` table in one pass — the
    Spark-first expression of ``MERGE INTO`` on an engine without
    transactional tables: FULL OUTER join on the key, `coalesce`
    picks source-over-target, an action tag shows what happened.

    Change set (synthesized deterministically from the target):
    every 10th order gets status 'U' and +10.00 on the price; keys
    ``o_orderkey % 1000 == 7`` arrive shifted past ``max(o_orderkey)``
    as brand-new rows — the offset is derived from the data (one
    map-side-combined MAX, broadcast to the insert branch), so insert
    keys can never collide with real keys at ANY scale factor (a
    fixed +10M constant collided once max key exceeded it, silently
    reclassifying inserts as updates at sf ≳ 1.67).

    100 TB shape: one shuffle join on the merge key; when the change
    set is small (the usual CDC case) Catalyst broadcasts it and the
    target is never shuffled at all. The MAX scalar is one extra
    single-column scan-and-reduce, broadcast as a 1-row dim. No
    driver-side state.
    """
    t = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        dec("o_totalprice").alias("price"),
    )
    upd = t.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.lit("U").alias("s_status"),
        (F.col("price") + F.lit(10.00).cast("decimal(12,2)")).alias("s_price"),
    )
    mx = t.agg(F.max("o_orderkey").alias("_maxkey"))
    ins = (
        t.filter(F.col("o_orderkey") % 1000 == 7)
        .crossJoin(F.broadcast(mx))
        .select(
            (F.col("o_orderkey") + F.col("_maxkey")).alias("o_orderkey"),
            F.lit("N").alias("s_status"),
            F.col("price").alias("s_price"),
        )
    )
    src = upd.unionByName(ins)
    m = t.join(src, "o_orderkey", "full_outer")
    return m.select(
        "o_orderkey",
        F.coalesce("s_status", "o_orderstatus").alias("status"),
        F.round(F.coalesce("s_price", "price"), 2)
        .cast("double")
        .alias("price"),
        F.when(F.col("o_orderstatus").isNull(), "insert")
        .when(F.col("s_status").isNotNull(), "update")
        .otherwise("keep")
        .alias("action"),
    )


# ---------------------------------------------------------------- Q57


def q57_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill (E7/E11/E3 composition): per-user hourly
    spine between each user's first and last event hour, LEFT-joined
    with the actual hourly aggregates, missing hours carried forward
    (LOCF) with `last(..., ignorenulls=True)` over an ordered window.

    The spine is integer epoch arithmetic (`sequence` with step
    3600) so both engines generate identical rows; the filled value
    stays exact decimal until the final round/cast (§2.6 rule 1).

    100 TB shape: the hourly pre-aggregation shrinks the fact before
    everything else and is MATERIALIZED (localCheckpoint) because two
    consumers need it — the spine bounds and the join probe side;
    without the cut, Spark recomputes the lineage per consumer and
    the 100 TB fact is scanned twice for a KB-sized aggregate
    (verified: the unmaterialized plan shows two FileScans). Spine
    explode is linear in hours-per-user; the LOCF window shuffles
    once on user_id.
    """
    from ..ops.materialize import materialize

    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 8)
    hourly = e.groupBy(
        "user_id",
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("h_ep"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value", "decimal(14,2)")).alias("sum_value"),
    )
    hourly = materialize(hourly)
    spine = (
        hourly.groupBy("user_id")
        .agg(F.min("h_ep").alias("h0"), F.max("h_ep").alias("h1"))
        .select(
            "user_id",
            F.explode(F.sequence("h0", "h1", F.lit(3600))).alias("h_ep"),
        )
    )
    j = spine.join(hourly, ["user_id", "h_ep"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("h_ep")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        "h_ep",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.round(F.last("sum_value", ignorenulls=True).over(w), 2)
        .cast("double")
        .alias("locf_sum_value"),
    )


# ---------------------------------------------------------------- Q192


def q192_gap_fill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill with LINEAR interpolation (E3/E7 — the
    resample completion of q57's LOCF: LOCF answers "what was the
    last known state", interpolation answers "what was the level
    mid-gap", the form a feature pipeline wants for slowly-varying
    signals).

    Same per-user hourly spine as q57 (integer epoch `sequence`, so
    both engines generate identical rows). Each missing hour takes
    the exact rational interpolation between its bracketing
    observations::

        v(h) = (v_prev·(h_next − h) + v_next·(h − h_prev))
               / (h_next − h_prev)

    Determinism (§2.6): v_prev/v_next are exact DECIMAL(14,2) hourly
    sums; the second gaps are BIGINTs cast to DECIMAL(18,0) so both
    products are exact decimals (unscaled ≤ 10^13 here — far inside
    both engines' wide-decimal paths and double's 2^53 exact-integer
    range); ONE double division per row in identical written order,
    emitted RAW with no rounding step (the q152/q153 convention —
    identical operands give a bit-identical IEEE quotient, while
    ROUND's tie handling diverges between engines exactly on the
    x.xxxx5 values this rational produces; a ROUND(.,4) variant
    hash-flaked on 18.27125 at sf0.01). One dependency this buys:
    the hash now pins the exact bit pattern of a decimal→double cast
    followed by one division, so a future Spark/DuckDB change to
    decimal→double cast rounding would flake it — acceptable because
    both operands are exact decimals ≤ 10^13, inside double's 2^53
    exact-integer range, where the cast is value-exact in any
    rounding mode. Observed rows short-circuit
    on the integer test h_next = h_prev (both brackets are the row
    itself) and emit the stored decimal exactly — no division
    touches them. The spine is
    bounded by each user's min/max observed hour, so every gap row
    has both brackets by construction (no extrapolation semantics to
    declare).

    100 TB shape: identical to q57 — the hourly pre-aggregation
    shrinks the fact first and is MATERIALIZED for its two consumers
    (spine bounds + probe side); the bracket search is two window
    passes (last/first ignorenulls, preceding + following frames)
    over ONE user_id shuffle — Spark evaluates both frames in a
    single WindowExec, and no per-gap join or explode ever touches
    data grain.
    """
    from ..ops.materialize import materialize

    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 8)
    hourly = e.groupBy(
        "user_id",
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("h_ep"),
    ).agg(F.sum(dec("value", "decimal(14,2)")).alias("sum_value"))
    hourly = materialize(hourly)
    spine = (
        hourly.groupBy("user_id")
        .agg(F.min("h_ep").alias("h0"), F.max("h_ep").alias("h1"))
        .select(
            "user_id",
            F.explode(F.sequence("h0", "h1", F.lit(3600))).alias("h_ep"),
        )
    )
    j = spine.join(hourly, ["user_id", "h_ep"], "left")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("h_ep")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("h_ep")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_h = F.when(F.col("sum_value").isNotNull(), F.col("h_ep"))
    pv = F.last("sum_value", ignorenulls=True).over(w_prev)
    ph = F.last(obs_h, ignorenulls=True).over(w_prev)
    nv = F.first("sum_value", ignorenulls=True).over(w_next)
    nh = F.first(obs_h, ignorenulls=True).over(w_next)
    d18 = "decimal(18,0)"
    num = pv * (nh - F.col("h_ep")).cast(d18) + nv * (
        F.col("h_ep") - ph
    ).cast(d18)
    lin = F.when(nh == ph, pv.cast("double")).otherwise(
        num.cast("double") / (nh - ph).cast("double")
    )
    return j.select(
        "user_id",
        "h_ep",
        F.col("sum_value").isNotNull().cast("int").alias("observed"),
        lin.cast("double").alias("lin_sum_value"),
    )


# ---------------------------------------------------------------- Q193


def q193_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive NEGATIVE SAMPLING (E13/E19 pipeline
    op — the random-negatives stage of contrastive/embedding
    training: per anchor document, K pseudo-uniform negatives drawn
    from the corpus, reproducible across reruns, repartitioning, and
    engines — never ``rand()``, the q67/q107/q131 md5-fold law).

    Draw function: ``f2 = md5-fold(doc_id ':' slot)`` (the 8-hex
    32-bit fold of ops/split.py); the negative is addressed in two
    decorrelated slices of f2 — target bucket ``f2 % B`` and
    within-bucket rank ``(f2 div B) % count(bucket)`` — against a
    bucket-local index of the corpus (md5 bucket of the CANDIDATE's
    doc_id, ``row_number`` within bucket). Declared semantics: draws
    are with-replacement (two slots of one anchor may repeat a
    negative); self-hits are DROPPED (an anchor drawing itself —
    expected K/N rows — is filtered, not remapped); and a slot whose
    target bucket holds NO corpus docs is likewise DROPPED — the
    probe's inner join against the B-row bucket-count dim has no
    matching row, so the slot silently vanishes rather than being
    remapped via a second fold (possible only when the corpus is
    small relative to B; at B=64 an sf0.001 corpus already fills
    every bucket, and at scale B grows with the corpus so empties
    never occur).  The output is therefore a pure deterministic
    function of the corpus.

    100 TB shape: no global order anywhere — the corpus index is a
    bucket-PARTITIONED ``row_number`` (one shuffle on the md5 bucket;
    B scales with the corpus so a bucket's sort stays executor-sized
    — B=64 feeds 32 local cores, a 1000-executor corpus would set
    B ≈ corpus/256 MB), the bucket-count dim is B rows (BROADCAST —
    model-sized by construction), and the probe is a plain hash
    equi-join on (bucket, rank). Anchor fan-out is a bounded ×K
    explode. Everything is integer/md5 codegen — zero Python, zero
    libm, hash-gate exact.
    """
    from ..ops.split import hash_bucket
    from ..ops.text import token_count

    K, B = 4, 64
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").alias("n_tokens")
    )
    w = Window.partitionBy("bkt").orderBy("doc_id")
    idx = (
        d.withColumn("bkt", hash_bucket(F.col("doc_id"), B))
        .withColumn("rn", F.row_number().over(w) - 1)
        .select(
            F.col("bkt"),
            F.col("rn").cast("bigint").alias("rn"),
            F.col("doc_id").alias("neg_doc_id"),
            F.col("n_tokens").alias("neg_n_tokens"),
        )
    )
    cnt = idx.groupBy("bkt").agg(F.count(F.lit(1)).alias("c"))
    f2 = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("slot").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    anchors = (
        d.select("doc_id")
        .withColumn("slot", F.explode(F.sequence(F.lit(0), F.lit(K - 1))))
        .withColumn("f2", f2)
        .withColumn("tbkt", F.col("f2") % B)
    )
    probe = anchors.join(
        F.broadcast(cnt), anchors["tbkt"] == cnt["bkt"]
    ).select(
        "doc_id",
        "slot",
        "tbkt",
        (F.expr(f"f2 div {B}") % F.col("c")).alias("li"),
    )
    return (
        probe.join(
            idx,
            (probe["tbkt"] == idx["bkt"]) & (probe["li"] == idx["rn"]),
        )
        .filter(F.col("neg_doc_id") != F.col("doc_id"))
        .select(
            "doc_id",
            F.col("slot").cast("int").alias("slot"),
            "neg_doc_id",
            "neg_n_tokens",
        )
    )


# ---------------------------------------------------------------- Q58


def q58_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking for LLM context windows (E19, pipeline op):
    split each document into overlapping token windows (size 50,
    stride 40 → 10-token overlap), emitting per-chunk token counts
    and a content fingerprint — the exact shape a pretraining
    tokenize-and-pack stage needs.

    Pure array arithmetic: `sequence` generates chunk starts,
    `slice` cuts the windows — one projection + one explode, no
    shuffle, no Python. At 100 TB this is embarrassingly parallel
    and the explode's fan-out (≈ n_tokens/stride per doc) is bounded
    and known in advance.
    """
    from ..ops.text import tokens

    size, stride = 50, 40
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    d = d.filter(F.size("toks") > 0).select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(0), F.size("toks") - 1, F.lit(stride))
        ).alias("start_tok"),
    )
    chunk = F.slice("toks", F.col("start_tok") + 1, size)
    return d.select(
        "doc_id",
        (F.col("start_tok") / stride).cast("int").alias("chunk_idx"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


# ---------------------------------------------------------------- Q59


def q59_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality counters (E19, pipeline op): the
    Gopher/C4-style duplicate-fraction filters, in exact integers —
    per document: token count, distinct tokens, 2-gram count,
    distinct 2-grams, and the highest single-2-gram frequency.
    High duplicate-token / duplicate-2-gram counts mark the
    boilerplate and looping-generation documents a training-data
    pipeline drops first.

    2-grams come from `zip_with(slice(toks,1,n-1), slice(toks,2,n-1))`
    — pure codegen. SINGLE corpus pass: the per-doc token counters
    (constants per doc) ride the gram explode as narrow columns and
    are re-collected with `min` through the two aggregations —
    cheaper at 100 TB than a second scan-and-tokenize plus a join
    (the first formulation; its plan showed two FileScans and a
    third shuffle). Both shuffles hash on doc_id-derived keys (no
    skew: grams are per-doc).
    """
    from ..ops.text import tokens
    from ..tables import spread

    # spread() BEFORE the tokenize/gram projection (round-17): the
    # single-row-group documents file scans as one split, so the
    # whole tokenize + array_distinct + 2-gram explode + partial agg
    # chain ran on ONE task (measured: a single 1.9 s task writing
    # the 5 MB gram shuffle while the other cores idled). One cheap
    # round-robin exchange of the raw (doc_id, text) rows fans the
    # expensive projection across every core — the documented
    # tables.spread hazard/remedy.
    d = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", tokens("text").alias("toks")
    )
    d = d.filter(F.size("toks") > 1)
    grams = d.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct_tokens"),
        F.explode(
            F.zip_with(
                F.slice("toks", 1, F.size("toks") - 1),
                F.slice("toks", 2, F.size("toks") - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("gram"),
    )
    return (
        grams.groupBy("doc_id", "gram")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("n_tokens").alias("n_tokens"),
            F.min("n_distinct_tokens").alias("n_distinct_tokens"),
        )
        .groupBy("doc_id")
        .agg(
            F.min("n_tokens").alias("n_tokens"),
            F.min("n_distinct_tokens").alias("n_distinct_tokens"),
            F.sum("cnt").alias("n_2grams"),
            F.count(F.lit(1)).alias("n_distinct_2grams"),
            F.max("cnt").alias("top_2gram_cnt"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct_tokens",
            "n_2grams",
            "n_distinct_2grams",
            "top_2gram_cnt",
        )
    )


# ---------------------------------------------------------------- Q60


def q60_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction (E19/C4, pipeline op): scrub
    emails, phone numbers, and 16-digit card numbers from text —
    the standard compliance pass before training data leaves the
    pipeline. The dirty input is synthesized deterministically from
    doc_id (the corpus itself is clean), so detection counts and
    the redacted-text fingerprint are exact.

    Patterns are restricted to the Java-regex ∩ RE2 common subset
    (no lookaround/backrefs) so Spark and the oracle see identical
    matches. One codegen projection — no shuffle, no Python; at
    100 TB this runs at scan speed.
    """
    d = load_table(spark, sf_dir, "documents")
    dirty = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10_000).cast("string"), 4, "0"),
        F.lit(" card 4111111111111"),
        F.lpad((F.col("doc_id") % 1_000).cast("string"), 3, "0"),
    )
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(dirty, EMAIL_RE, "<EMAIL>"),
            PHONE_RE,
            "<PHONE>",
        ),
        CARD_RE,
        "<CARD>",
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(dirty, F.lit(EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(dirty, F.lit(PHONE_RE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.size(F.regexp_extract_all(dirty, F.lit(CARD_RE), F.lit(0)))
        .cast("long")
        .alias("n_cards"),
        F.length(red).cast("long").alias("redacted_len"),
        F.md5(red).alias("redacted_md5"),
    )


# ---------------------------------------------------------------- Q61


def q61_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-tolerant typing (T1–T3 hardening): the `try_*` family —
    `try_cast` to INT and DECIMAL over a deterministic dirty-string
    mix ('', garbage, valid, signed), `try_to_timestamp` with the
    reference's 'M/d/yyyy' format over valid and impossible dates,
    and `try_divide` where the denominator is DATA-dependent — zero
    for odd groups, nonzero for even ones — so both the NULL branch
    and the value branch are oracle-checked. This is
    the modern form of the reference's quarantine-on-parse-failure
    contract (`fields.py §copy_template` CASE WHEN guards): bad
    values become NULL, the pipeline keeps moving, the counts say
    how bad the feed was.

    One projection + one small aggregation; NULL-counting is
    codegen `count_if`.
    """
    p = load_table(spark, sf_dir, "part")
    grp = (F.col("p_partkey") % 4).cast("int").alias("grp")
    raw_int = (
        F.when(F.col("p_partkey") % 5 == 0, F.lit(""))
        .when(F.col("p_partkey") % 5 == 1, F.lit("n/a"))
        .when(F.col("p_partkey") % 5 == 2, F.concat(F.lit("-"), F.col("p_size").cast("string")))
        .otherwise(F.col("p_size").cast("string"))
    )
    raw_dec = (
        F.when(F.col("p_partkey") % 3 == 0, F.lit("oops"))
        .otherwise(F.col("p_retailprice").cast("decimal(12,2)").cast("string"))
    )
    raw_date = (
        F.when(F.col("p_partkey") % 7 == 0, F.lit("13/45/2020"))
        .otherwise(F.lit("2/3/1996"))
    )
    t = p.select(
        grp,
        raw_int.try_cast("int").alias("v_int"),
        raw_dec.try_cast("decimal(12,2)").alias("v_dec"),
        F.try_to_timestamp(raw_date, F.lit("M/d/yyyy")).alias("v_ts"),
    )
    return (
        t.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("v_int").alias("n_int_ok"),
            F.sum("v_int").cast("long").alias("sum_int"),
            F.count("v_dec").alias("n_dec_ok"),
            F.round(F.sum("v_dec"), 2).cast("double").alias("sum_dec"),
            F.count("v_ts").alias("n_ts_ok"),
            # try_divide: denominator = #unparsed ints in EVEN groups
            # only — zero for odd groups (NULL branch), nonzero for
            # even groups (value branch); both paths data-exercised.
            F.try_divide(
                F.sum("v_int").cast("double"),
                F.count_if(
                    F.col("v_int").isNull() & (F.col("grp") % 2 == 0)
                ).cast("double"),
            ).alias("try_div"),
        )
        .orderBy("grp")
    )


# ---------------------------------------------------------------- Q62


def q62_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical moments with hash-stable arithmetic (E13 made
    oracle-checkable): per `l_returnflag` — sample stddev of
    quantity and price, their sample covariance and Pearson
    correlation. Engine-native `stddev/corr` accumulate doubles in
    partition order (non-associative → hash-flaky), so both engines
    compute the SAME closed forms from EXACT power sums: integer
    sums for quantity, decimal sums for price, every sum cast to
    double once, then one identical IEEE expression per statistic
    (§2.6 rule 1 taken to second moments).

    One map-side-combined aggregation; the moment arithmetic is
    constant-time per group.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("bigint").alias("x"),
        dec("l_extendedprice").alias("y"),
    )
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy_d"),
        F.sum(F.col("y") * F.col("y")).alias("syy_d"),
        F.sum(F.col("x") * F.col("y")).alias("sxy_d"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    sy = F.col("sy_d").cast("double")
    syy = F.col("syy_d").cast("double")
    sxy = F.col("sxy_d").cast("double")
    var_x = (n * sxx - sx * sx) / (n * (n - F.lit(1.0)))
    var_y = (n * syy - sy * sy) / (n * (n - F.lit(1.0)))
    cov = (n * sxy - sx * sy) / (n * (n - F.lit(1.0)))
    corr = (n * sxy - sx * sy) / F.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    return s.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        F.round(F.sqrt(var_x), 6).alias("stddev_qty"),
        F.round(F.sqrt(var_y), 6).alias("stddev_price"),
        F.round(cov, 4).alias("covar_qty_price"),
        F.round(corr, 6).alias("corr_qty_price"),
    )


# ---------------------------------------------------------------- Q63


def q63_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer explode over arrays of structs (E11 completion):
    `posexplode_outer` keeps a NULL-extended row for documents whose
    array is empty — the LEFT-JOIN-LATERAL shape `explode` silently
    drops. The array holds (token, length) structs built from the
    first 5 tokens; every 7th document gets an empty array on
    purpose.

    One Generate node (outer=true) over a pruned 2-column scan; no
    shuffle.
    """
    from ..ops.text import tokens

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    structs = F.transform(
        F.slice(tokens("text"), 1, 5),
        lambda t: F.struct(t.alias("tok"), F.length(t).cast("int").alias("tlen")),
    )
    arr = F.when(
        F.col("doc_id") % 7 == 0,
        F.array().cast("array<struct<tok:string,tlen:int>>"),
    ).otherwise(structs)
    e = d.select("doc_id", F.posexplode_outer(arr).alias("pos", "s"))
    return e.select(
        "doc_id",
        F.col("pos").cast("int").alias("pos"),
        F.col("s.tok").alias("tok"),
        F.col("s.tlen").alias("tlen"),
    )


# ---------------------------------------------------------------- Q64


def q64_substring_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication detection (E17, pipeline op): the
    exact-substring sibling of set-based near-dup — document pairs
    sharing at least one exact 8-token window, with the count of
    shared distinct windows. This is the signal behind
    train-set decontamination and boilerplate removal: documents can
    be set-dissimilar overall yet share verbatim passages that
    set-Jaccard (q33) never sees.

    Delegates to :func:`calaspark.ops.pairs.substring_dup_pairs`
    with ``max_df=None`` — the exact uncapped contract (every shared
    window counts). The at-scale form with the document-frequency
    guard is q68.
    """
    from ..ops.pairs import substring_dup_pairs

    return substring_dup_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", window=8
    )


# ---------------------------------------------------------------- Q68


def q68_substring_dup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q64's substring-dup pairs with the document-frequency guard a
    100 TB decontamination pass needs (E17 scale path): windows
    appearing in more than ``max_df=2`` documents are dropped BEFORE
    the self-join. A boilerplate window shared by f docs emits f²
    join rows through one hot key — the cap bounds per-key fan-out at
    max_df² and removes exactly the windows that are boilerplate, not
    duplication signal.

    Plan: one extra groupBy(wh) + equi-join against the kept-window
    set; everything stays a pure equi-join (pytest asserts bounded
    fan-out on a synthetic 50-doc boilerplate corpus).
    """
    from ..ops.pairs import substring_dup_pairs

    return substring_dup_pairs(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        window=8,
        max_df=2,
    )


# ---------------------------------------------------------------- Q65


def q65_pipeline_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data pipeline accounting (E15+E19
    composition, oracled): the whole funnel in one lazy plan —

    1. quality gate (integer-exact counters: ≥10 tokens, ≥50 chars,
       ≥1 English stopword, digits < 20% of chars — the q55/q59
       filters applied, not just computed);
    2. exact-dup collapse on the md5 of whitespace-normalized
       lowercase text (the hash-groupBy dedup);
    3. chunk/token budgeting of the surviving corpus (q58's size-50
       stride-40 arithmetic, closed form).

    Returns ONE summary row: docs in → past quality → unique →
    total chunks → total tokens. Every stage is codegen expressions
    + two hash aggregations; no Python, no window, no join — the
    funnel a 100 TB corpus pays exactly one scan plus one
    dedup-keyed shuffle for.

    The explicit repartition ABOVE the counter projection is the
    subtree-reuse lever: three summary branches hang off `d`, and
    without an exchange each one re-scans the table and re-runs the
    interpreted stopword lambda (3 scans of a 100 TB corpus; a 3×
    serial stage at bench SF). With it the scan + projection +
    exchange subtree is canonical-identical under every branch, so
    the plan computes it ONCE (ReusedExchange) and the shuffle
    carries ~50-byte counter rows, never the text.
    """
    from ..ops.text import STOPWORDS, tokens

    c = F.col("text")
    toks = tokens("text")
    stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.length(c).cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop, F.lower(t))))
        .cast("long")
        .alias("n_stop_en"),
        F.length(F.regexp_replace(c, r"[^0-9]", "")).cast("long").alias("n_digit"),
        # ops.text.WS, not \s: Java's \s matches \x0B, RE2's doesn't
        F.md5(
            F.lower(F.regexp_replace(F.trim(c), "[\t\n\f\r ]+", " "))
        ).alias("content_key"),
    ).repartition(spark.sparkContext.defaultParallelism, "doc_id")
    q = d.filter(
        (F.col("n_tokens") >= 10)
        & (F.col("n_chars") >= 50)
        & (F.col("n_stop_en") >= 1)
        & (F.col("n_digit") * 5 < F.col("n_chars"))
    )
    uniq = q.groupBy("content_key").agg(
        F.min("doc_id").alias("doc_id"),
        F.min("n_tokens").alias("n_tokens"),
    )
    return (
        d.agg(F.count(F.lit(1)).alias("n_docs_in")).crossJoin(
            q.agg(F.count(F.lit(1)).alias("n_docs_quality"))
        )
        .crossJoin(
            uniq.agg(
                F.count(F.lit(1)).alias("n_docs_unique"),
                F.sum(
                    F.floor((F.col("n_tokens") - 1) / 40) + 1
                ).alias("n_chunks_total"),
                F.sum("n_tokens").alias("n_tokens_total"),
            )
        )
    )


# ---------------------------------------------------------------- Q66


def q66_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal media-contract metadata (E20, oracled core): run
    documents through the REAL media table contract
    (`ops.multimodal.as_media_table` — binary payload + typed meta
    struct; payload = utf-8 bytes of the text, the deterministic
    stand-in for image/audio bytes) and read back the metadata a
    catalog query needs: format, byte size, payload content hash.

    This oracles the schema/plumbing half of E20 (the codec half is
    the documented plug point): Spark hashes the BINARY payload,
    DuckDB hashes the VARCHAR — identical utf-8 bytes, identical
    digest. Pure projection; binary never leaves the executors
    (only the 32-char digest comes back).
    """
    from ..ops.multimodal import as_media_table

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload_bytes")
    )
    m = as_media_table(d, "doc_id", "payload_bytes", fmt="text/plain")
    return m.select(
        "media_id",
        F.col("meta.format").alias("format"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


# ---------------------------------------------------------------- Q67


def q67_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test splitting (E13/E19, pipeline op):
    every reproducible data pipeline splits by a HASH of a stable
    key, never by `rand()` — the assignment survives reruns, joins,
    and engine changes. Bucket = the first 8 hex chars of
    md5(doc_id) parsed as a 32-bit integer, mod 100: 2^32 uniform
    residues, so each bucket's mass is within 2^-25 of 1/100 (an
    earlier 2-hex-char fold had only 256 non-uniform residues and
    delivered 87.1/6.6/6.3 — property-tested against now). Buckets
    0-89 train, 90-94 val, 95-99 test (a true 90/5/5 split).

    Output: per-split doc count, token sum, char sum — the numbers a
    training run budgets against. One projection + one map-side-
    combined aggregation; the split column is pure codegen, so at
    100 TB assignment costs nothing beyond the scan.
    """
    from ..ops.split import split_label
    from ..ops.text import token_count

    d = load_table(spark, sf_dir, "documents").select(
        split_label(F.col("doc_id"), 90, 5).alias("split"),
        token_count("text").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )
    return (
        d.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("n_chars").alias("n_chars"),
        )
        .orderBy("split")
    )


# ---------------------------------------------------------------- Q69


def q69_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining (E19/E3, pipeline op): assign
    q58's document chunks to fixed token-budget context windows
    ("packs") by a running cumulative token count — the
    tokenize-chunk-PACK stage that turns a corpus into training
    sequences. A chunk goes to pack ``floor(tokens_before / budget)``
    (budget 2048), the standard streaming first-fit.

    Scale shape: packing is per SHARD (``pmod(doc_id, 8)``), not
    global — a single global cumsum would serialize the corpus
    through one window partition; sharded packing keeps every core
    busy and is how a distributed packer actually ships (each shard
    emits its own pack sequence). One explode + one windowed cumsum
    (shuffle on shard) + one hash aggregate.
    """
    from ..ops.text import tokens

    size, stride, budget = 50, 40, 2048
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    d = d.filter(F.size("toks") > 0).select(
        "doc_id",
        F.size("toks").alias("n_toks"),
        F.explode(
            F.sequence(F.lit(0), F.size("toks") - 1, F.lit(stride))
        ).alias("start_tok"),
    )
    chunk_toks = F.least(F.lit(size), F.col("n_toks") - F.col("start_tok"))
    c = d.select(
        "doc_id",
        "start_tok",
        F.pmod(F.col("doc_id"), F.lit(8)).cast("int").alias("shard"),
        chunk_toks.cast("long").alias("chunk_toks"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id", "start_tok")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = c.select(
        "shard",
        "chunk_toks",
        F.floor(
            (F.sum("chunk_toks").over(w) - F.col("chunk_toks"))
            / F.lit(budget)
        )
        .cast("long")
        .alias("pack_id"),
    )
    return (
        packed.groupBy("shard", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("chunk_toks").alias("n_tokens"),
        )
        .orderBy("shard", "pack_id")
    )


# ---------------------------------------------------------------- Q70


def q70_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixture sampling (E13/E19, pipeline op): down/up-weight
    sub-corpora to target mixture rates — the data-mixing stage of
    every pretraining run — with DETERMINISTIC hash-rate sampling:
    keep a doc iff ``hash_bucket(salted key, 10000) < rate·10000``.
    Same contract as q67's split: assignment is a pure function of
    the key (never `rand()`), so the sampled mixture is reproducible
    across reruns, engines, and partitionings, and a different salt
    draws an independent sample.

    Sub-corpus = ``doc_id % 3`` (the deterministic stand-in for a
    source column); rates web 0.5 / books 0.8 / code 0.25. One
    codegen projection + one map-side-combined aggregate — at 100 TB
    the mixture costs nothing beyond the scan.
    """
    from ..ops.split import hash_bucket
    from ..ops.text import token_count

    corpus = (
        F.when(F.col("doc_id") % 3 == 0, "web")
        .when(F.col("doc_id") % 3 == 1, "books")
        .otherwise("code")
    )
    rate = (
        F.when(F.col("corpus") == "web", F.lit(5000))
        .when(F.col("corpus") == "books", F.lit(8000))
        .otherwise(F.lit(2500))
    )
    b = hash_bucket(
        F.concat(F.lit("mix:"), F.col("doc_id").cast("string")), 10_000
    )
    d = load_table(spark, sf_dir, "documents").select(
        corpus.alias("corpus"),
        token_count("text").alias("n_tokens"),
        b.alias("bucket"),
    )
    return (
        d.groupBy("corpus")
        .agg(
            F.count(F.lit(1)).alias("n_docs_in"),
            F.count_if(F.col("bucket") < rate).alias("n_docs_kept"),
            F.sum(
                F.when(F.col("bucket") < rate, F.col("n_tokens")).otherwise(
                    F.lit(0)
                )
            ).alias("n_tokens_kept"),
        )
        .orderBy("corpus")
    )


# ---------------------------------------------------------------- Q71


def q71_ann_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact BATCHED k-NN (E18 oracled batch shape): top-3 cosine
    neighbors for EACH of 8 query vectors in one plan — q34 is the
    single-probe scan; this is the query-batch form an embedding
    service actually runs.

    Plan: broadcast the 8-row query batch against one corpus scan
    (no shuffle of the big side), per-query TopK via
    `row_number()` over (query_id) — Spark 3.5+/4.x rewrites
    rn ≤ k to WindowGroupLimit, so no query group materializes its
    full sorted neighbor list. At 100 TB with LARGE query batches
    the right plan becomes IVF/LSH bucketing (`ops/ann_ivf.py`,
    `ann_ivf_topk`); broadcast-batch brute force is correct up to
    ~thousands of probes.

    FP determinism (§2.6 rule 5): doubles before arithmetic,
    index-ordered sequential fold ≡ DuckDB `list_dot_product`,
    ROUND(4), total order (sim desc, vec_id).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    to_d = F.transform("embedding", lambda x: x.cast("double"))
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), to_d.alias("qe")
    )
    d = emb.filter(F.col("vec_id") >= 8).select("vec_id", to_d.alias("e"))

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    sim = F.round(
        dot(F.col("e"), F.col("qe"))
        / (
            F.sqrt(dot(F.col("e"), F.col("e")))
            * F.sqrt(dot(F.col("qe"), F.col("qe")))
        ),
        4,
    )
    j = d.crossJoin(F.broadcast(q)).select(
        "query_id", "vec_id", sim.alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    return (
        j.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("query_id", F.col("rnk").cast("int").alias("rnk"), "vec_id", "sim")
    )


# ---------------------------------------------------------------- Q72


def q72_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy record linkage (E17/E19, the canonical CAL-ACCESS
    analytics need): near-identical NAME pairs — the
    contributor/payee dedup every consumer of RCPT_CD/EXPN_CD runs
    (`calaccess_raw` leaves it to its users) — found as DISTINCT
    part-name pairs within Levenshtein distance 1–3, each carrying
    its exact-duplicate multiplicity.

    Plan, in the canonical linkage order:

    1. EXACT collapse first — identical names form d=0 cliques that
       explode the pair space quadratically (4.7M pairs at sf0.1
       before this stage, 16 after); one groupBy elects a
       representative id and counts the multiplicity. Exact dups
       are q32's job, not fuzzy matching's.
    2. BLOCKED self-equi-join on the first name token (the standard
       record-linkage blocking key; swap in phonetic keys or q-gram
       LSH by changing one expression).
    3. Length-difference prefilter: |len_a − len_b| ≤ 3 is a
       necessary condition for lev ≤ 3 — two integers instead of an
       O(n·m) DP per candidate.
    4. Exact `levenshtein` on the survivors only.

    At 100 TB: one groupBy + one equi-join, no cartesian; skewed
    blocks → AQE skew-join. Output is scale-stable (distinct-name
    space), with per-name multiplicities as the cluster weights.
    """
    u = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(
            F.min("p_partkey").alias("rep_id"),
            F.count(F.lit(1)).alias("n_dup"),
        )
        .select(
            "rep_id",
            "p_name",
            "n_dup",
            F.split("p_name", " ").getItem(0).alias("blk"),
            F.length("p_name").alias("len"),
        )
    )
    a, b = u.alias("a"), u.alias("b")
    cand = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.rep_id") < F.col("b.rep_id"))
        & (F.abs(F.col("a.len") - F.col("b.len")) <= 3),
    )
    d = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return cand.select(
        F.col("a.rep_id").alias("id_a"),
        F.col("b.rep_id").alias("id_b"),
        d.cast("int").alias("dist"),
        F.col("a.n_dup").alias("n_dup_a"),
        F.col("b.n_dup").alias("n_dup_b"),
    ).filter((F.col("dist") >= 1) & (F.col("dist") <= 3))


# ---------------------------------------------------------------- Q73


def q73_embedding_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT embedding-cosine near-dup pairs (E17×E18 oracled): every
    pair with cosine ≥ 0.95, found WITHOUT an all-pairs compare via
    :func:`calaspark.ops.pairs.grid_cosine_pairs` — guaranteed-recall
    grid blocking on the first 3 normalized coordinates (a qualifying
    pair's cells can differ by at most 1 per axis, by the triangle
    bound ‖â−b̂‖ ≤ √(2−2τ)), exact cosine verify on candidates only.
    The rows-only `embedding_neardup` demo runs the SimHash variant
    whose recall < 1; this is the exact contract the oracle can
    check against a brute-force all-pairs twin.

    The corpus synthesizes its near-dups exactly like
    `embedding_neardup` (the raw testdata vectors are near-random,
    max natural cosine ≈ 0.51): each vector is unioned with a
    deterministically perturbed copy (2% rotated-component bleed,
    cosine ≈ 0.999, id + 100000). Both engines build the SAME
    perturbed corpus in double arithmetic, so the candidate sims are
    bit-identical index-ordered folds (§2.6 rule 5; q34 precedent).

    100 TB: one 27× explode of the narrow (id, vec, norm) projection,
    one shuffle equi-join on the cell key, fold-based verify — no
    cartesian, no broadcast of the corpus.
    """
    from ..ops.materialize import materialize

    from ..ops.pairs import grid_cosine_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    rot = F.concat(F.slice("e", 2, 63), F.slice("e", 1, 1))
    pert = F.zip_with("e", rot, lambda a, b: a + F.lit(0.02) * b)
    dup = e.select((F.col("vec_id") + 100000).alias("vec_id"), pert.alias("e"))
    # block_dims derives from the corpus size (2x the footer row
    # count — the perturbed-twin union): 3 at every gate SF (plan
    # unchanged there), one more dimension per ~64x growth past 8k
    # rows, where denser cells make the extra 3x replication win
    # (round-17 scale probes: 40 s -> 26 s at a 64k corpus). The
    # count() below is parquet footer metadata, not a scan.
    n_corpus = 2 * spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    pairs = grid_cosine_pairs(
        materialize(e.unionAll(dup)),
        id_col="vec_id",
        vec_col="e",
        threshold=0.95,
        block_dims=None,
        n_rows=n_corpus,
    )
    return pairs.select(
        "id_a", "id_b", F.round("sim", 4).alias("sim")
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------- Q74


def q74_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-stage aggregation + salted broadcast-free join,
    ORACLE-CHECKED (E24 made hash-verifiable; until now the salting
    toolbox was pytest/plan-proven only). Semantics are plain
    "revenue and order count per customer market segment over
    open ('O') orders" — the salting must be output-invisible, and
    the oracle proves it: the DuckDB twin is the ordinary JOIN +
    GROUP BY with no salt anywhere.

    Spark plan: (1) `salted_join` scatters each hot join key across
    8 (key, salt) subkeys — the small side (customer, projected to 2
    columns) is exploded 8×, the fact side sprays deterministically;
    (2) the aggregation runs in two stages, partial sums per
    (segment, salt) then final per segment — the standard hot-group
    fix when one group would otherwise land on one reducer. Exact
    decimal partials are associative (§2.6 rule 1), so regrouping
    cannot change the answer — which is exactly what the hash gate
    verifies.

    At 100 TB this is the plan you force when AQE's runtime skew
    splitting can't see the skew (e.g. pre-shuffled input); cost is
    8× replication of the dim side and one extra (tiny) final
    shuffle of 8·|groups| partial rows.
    """
    from ..ops.skew import salted_join

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "O"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    j = salted_join(
        orders.select("o_custkey", dec("o_totalprice").alias("p")).withColumnRenamed(
            "o_custkey", "c_custkey"
        ),
        cust,
        key="c_custkey",
        n_salts=8,
    )
    agg_salt = F.pmod(F.xxhash64("c_custkey"), F.lit(8)).cast("int")
    partial = (
        j.withColumn("_asalt", agg_salt)
        .groupBy("c_mktsegment", "_asalt")
        .agg(F.sum("p").alias("ps"), F.count(F.lit(1)).alias("pn"))
    )
    return (
        partial.groupBy("c_mktsegment")
        .agg(
            F.round(F.sum("ps"), 2).cast("double").alias("revenue"),
            F.sum("pn").alias("n_orders"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------- Q75


def q75_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher statistical moments from EXACT power sums (E13
    completion; q62 stops at second moments): per `l_linestatus` —
    sample skewness (g1 with the bias correction) and excess
    kurtosis (g2) of `l_quantity`. Engine-native `skewness/kurtosis`
    accumulate doubles in partition order AND disagree on the
    population/sample correction across engines, so both engines
    compute identical closed forms from exact integer power sums
    Σx..Σx⁴ (quantity ≤ 50 ⇒ Σx⁴ ≤ n·6.25e6 < 2^53 far beyond these
    scale factors — every sum is exactly representable), each cast
    to double once, one shared IEEE expression per statistic.

    One map-side-combined aggregation, constant-time finishing
    arithmetic per group.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_linestatus", F.col("l_quantity").cast("bigint").alias("x")
    )
    s = li.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
        F.sum(F.col("x") * F.col("x") * F.col("x")).alias("s3"),
        F.sum(F.col("x") * F.col("x") * F.col("x") * F.col("x")).alias("s4"),
    )
    n = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    s3 = F.col("s3").cast("double")
    s4 = F.col("s4").cast("double")
    m = s1 / n
    # Central moments from raw power sums (identical expansion order
    # in both engines; see the oracle twin).
    m2 = s2 / n - m * m
    m3 = s3 / n - F.lit(3.0) * m * (s2 / n) + F.lit(2.0) * m * m * m
    m4 = (
        s4 / n
        - F.lit(4.0) * m * (s3 / n)
        + F.lit(6.0) * m * m * (s2 / n)
        - F.lit(3.0) * m * m * m * m
    )
    g1 = (
        F.sqrt(n * (n - F.lit(1.0)))
        / (n - F.lit(2.0))
        * (m3 / F.pow(m2, F.lit(1.5)))
    )
    g2 = m4 / (m2 * m2) - F.lit(3.0)
    return s.select(
        "l_linestatus",
        F.col("n").cast("long").alias("n"),
        F.round(g1, 6).alias("skew_qty"),
        F.round(g2, 6).alias("kurt_qty"),
    ).orderBy("l_linestatus")


# ---------------------------------------------------------------- Q76


def q76_decontaminate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination REPORT (E17/E19 — the audit pass a
    training-data pipeline runs before release): for every train
    document, how many of its distinct 8-token windows appear
    anywhere in the held-out eval set. q64 finds train↔train
    duplication; this is the train↔EVAL direction — benchmark
    leakage — plus the per-doc contamination flag a filter stage
    would key on.

    Eval set = docs with ``doc_id % 50 == 0``. To guarantee the
    detector has real signal, the corpus synthesizes a leak the way
    q32/q73 synthesize dups: every eval doc re-enters as a "train"
    doc under ``doc_id + 200001`` with VERBATIM text (the offset
    shifts the id mod 50, so a leak is never classified eval). Those
    rows must come back 100 % contaminated; organic window overlap
    adds the sparse tail.

    Plan: one window-fingerprint projection (md5 of each 8-token
    window, `array_distinct` per doc), materialized once for its
    three consumers (eval dictionary, hit join, per-doc totals);
    the hit count is a fingerprint equi-join against the DISTINCT
    eval windows (inverted-index shape, no pair blowup), LEFT-joined
    back so clean docs keep 0. At 100 TB the eval dictionary is
    benchmark-sized → broadcast; the corpus is scanned once.
    """
    from ..ops.materialize import materialize
    from ..ops.text import tokens

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    leak = d.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 200001).alias("doc_id"), "text"
    )
    corpus = d.unionAll(leak)
    toks = corpus.select("doc_id", tokens("text").alias("toks")).filter(
        F.size("toks") >= 8
    )
    wins = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 7),
            lambda i: F.md5(F.array_join(F.slice("toks", i, 8), " ")),
        )
    )
    w = materialize(toks.select("doc_id", wins.alias("ws")))
    is_eval = F.col("doc_id") % 50 == 0
    eval_wh = (
        w.filter(is_eval).select(F.explode("ws").alias("wh")).distinct()
    )
    train = w.filter(~is_eval)
    hits = (
        train.select("doc_id", F.explode("ws").alias("wh"))
        .join(eval_wh, "wh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        train.select("doc_id", F.size("ws").alias("n_windows"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_windows",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).cast("int").alias("contaminated"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------- Q77


def q77_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE vocabulary induction, step one (E19 — tokenizer training
    prep at corpus scale): global frequency of every adjacent
    CHARACTER PAIR inside word tokens — exactly the statistic the
    first byte-pair-encoding merge maximizes. Top-30 pairs under a
    total deterministic order (count desc, pair asc).

    Plan: tokenize (shared `\\S+` contract with the oracle), explode
    tokens, explode each token's `len−1` adjacent 2-grams via
    `sequence`+`substr` (pure codegen, no Python), one
    map-side-combined count. The pair space is bounded (alphabet²),
    so the final agg is dictionary-sized no matter the corpus — the
    exact shape of a distributed tokenizer-training counter at
    100 TB (the real trainer iterates this with a merge table;
    the per-iteration counter is this query).
    """
    from ..ops.text import tokens

    d = load_table(spark, sf_dir, "documents")
    tok = (
        d.select(F.explode(tokens("text")).alias("t"))
        .filter(F.length("t") >= 2)
    )
    pairs = tok.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("t") - 1),
                lambda i: F.col("t").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(30)
    )


# ---------------------------------------------------------------- Q78


def q78_tree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy flattening + per-level rollup, ORACLE-CHECKED — the
    org-chart/category-tree query SQL engines answer with
    ``WITH RECURSIVE`` and Spark has no native recursion for. The
    DuckDB twin IS a recursive CTE; Spark computes the identical
    depths via :func:`calaspark.ops.components.pointer_jump_depths`
    — pointer jumping (path doubling), log(depth) self-joins instead
    of one join per level — so the green hash proves the iterative
    plan equals the declarative recursion. (Connected components
    next door is the same iterative family but not SQL-expressible;
    this query is the family's oracled representative.)

    The hierarchy is derived deterministically from the corpus:
    node = doc_id, parent = doc_id DIV 3 (a ternary tree rooted at
    0 — depth ≲ log₃ N at every scale factor, so the fixed 6
    doublings cover any corpus below 3⁶⁴ docs). Output: per depth
    level — node count and exact total characters (the "rollup
    metrics by org level" shape).
    """
    from ..ops.components import pointer_jump_depths

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    nodes = d.select(
        "doc_id", F.expr("doc_id DIV 3").alias("parent"), "n_chars"
    )
    depths = pointer_jump_depths(
        nodes.select("doc_id", "parent"), id_col="doc_id", parent_col="parent"
    )
    return (
        depths.join(d, depths["id"] == d["doc_id"])
        .groupBy("depth")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("depth")
    )
