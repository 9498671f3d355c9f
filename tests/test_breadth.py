"""Round-5 breadth query invariants (calaspark/queries/breadth.py).

Correctness vs the DuckDB oracle is the driver's job (and
tools/verify_local.py's); these tests pin the SEMANTIC invariants the
hash gate can't express — merge action accounting, chunk coverage,
redaction completeness, outer-explode null extension.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F

from calaspark.queries import breadth
from calaspark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_merge_upsert_accounting(spark):
    orders = load_table(spark, SF, "orders")
    n_target = orders.count()
    n_upd = orders.filter(F.col("o_orderkey") % 10 == 0).count()
    n_ins = orders.filter(F.col("o_orderkey") % 1000 == 7).count()

    m = breadth.q56_merge_upsert(spark, SF)
    by_action = {r["action"]: r["n"] for r in m.groupBy("action").agg(F.count("*").alias("n")).collect()}
    assert by_action.get("insert", 0) == n_ins
    assert by_action.get("update", 0) == n_upd
    assert by_action.get("keep", 0) == n_target - n_upd
    # updates carry the +10.00; joined check against the target
    upd = (
        m.filter(F.col("action") == "update")
        .join(orders, "o_orderkey")
        .select((F.col("price") - F.col("o_totalprice")).alias("d"))
    )
    deltas = {round(r["d"], 2) for r in upd.collect()}
    assert deltas == {10.0}


def test_chunking_covers_every_token(spark):
    """Chunks tile each document: chunk starts step by the stride
    from 0 and the last chunk reaches the final token."""
    from calaspark.ops.text import token_count

    chunks = breadth.q58_doc_chunking(spark, SF)
    per_doc = chunks.groupBy("doc_id").agg(
        F.min("start_tok").alias("first_start"),
        F.max(F.col("start_tok") + F.col("n_tokens")).alias("covered"),
        F.count("*").alias("n_chunks"),
        F.max("start_tok").alias("last_start"),
    )
    docs = load_table(spark, SF, "documents").select(
        "doc_id", token_count("text").alias("n_toks")
    )
    j = per_doc.join(docs, "doc_id")
    bad = j.filter(
        (F.col("first_start") != 0)
        | (F.col("covered") != F.col("n_toks"))
        | (F.col("last_start") != (F.col("n_chunks") - 1) * 40)
    )
    assert bad.count() == 0
    assert chunks.filter(F.col("n_tokens") > 50).count() == 0


def test_pii_redact_finds_injected_pii(spark):
    r = breadth.q60_pii_redact(spark, SF)
    # every row got exactly one injected phone + card; ≥1 email
    assert r.filter(F.col("n_phones") != 1).count() == 0
    assert r.filter(F.col("n_cards") != 1).count() == 0
    assert r.filter(F.col("n_emails") < 1).count() == 0


def test_explode_outer_keeps_empty_array_docs(spark):
    e = breadth.q63_explode_outer(spark, SF)
    empties = e.filter(F.col("doc_id") % 7 == 0)
    # one NULL-extended row per empty-array doc, nothing else
    assert empties.count() == empties.select("doc_id").distinct().count()
    assert empties.filter(F.col("pos").isNotNull()).count() == 0
    others = e.filter((F.col("doc_id") % 7 != 0) & F.col("pos").isNull())
    assert others.count() == 0


def test_gap_fill_spine_is_dense_and_filled(spark):
    g = breadth.q57_gap_fill_locf(spark, SF)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("h_ep")
    step = g.select(
        "user_id", (F.col("h_ep") - F.lag("h_ep").over(w)).alias("step")
    )
    assert step.filter(F.col("step").isNotNull() & (F.col("step") != 3600)).count() == 0
    # LOCF: after the first observed hour (spine starts at each user's
    # min observed hour, which has data) the filled value is never null
    assert g.filter(F.col("locf_sum_value").isNull()).count() == 0


def test_sequence_packing_invariants(spark):
    """Packs never exceed budget + one chunk's overhang (a chunk that
    straddles the boundary opens the next pack), pack ids are
    contiguous from 0 per shard, and chunk accounting matches q58."""
    budget, size = 2048, 50
    packs = breadth.q69_sequence_packing(spark, SF).collect()
    by_shard = {}
    for r in packs:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        ids = [r["pack_id"] for r in sorted(rows, key=lambda r: r["pack_id"])]
        assert ids == list(range(len(ids)))
        # every pack except possibly the last is filled past budget
        # minus one chunk; none exceeds budget + chunk overhang
        for r in rows:
            assert r["n_tokens"] < budget + size
    total_chunks = sum(r["n_chunks"] for r in packs)
    assert total_chunks == breadth.q58_doc_chunking(spark, SF).count()


def test_mixture_sample_rates(spark):
    """Kept fractions track the declared mixture rates within a 4-sigma
    binomial bound at this corpus size, and are deterministic across
    runs."""
    rows = {r["corpus"]: r for r in breadth.q70_mixture_sample(spark, SF).collect()}
    rates = {"web": 0.5, "books": 0.8, "code": 0.25}
    for corpus, rate in rates.items():
        r = rows[corpus]
        bound = 4 * (rate * (1 - rate) / r["n_docs_in"]) ** 0.5
        assert abs(r["n_docs_kept"] / r["n_docs_in"] - rate) < bound, (corpus, r)
    again = {r["corpus"]: r for r in breadth.q70_mixture_sample(spark, SF).collect()}
    assert {k: (v["n_docs_kept"], v["n_tokens_kept"]) for k, v in rows.items()} == {
        k: (v["n_docs_kept"], v["n_tokens_kept"]) for k, v in again.items()
    }


def test_gap_fill_linear_brackets_and_endpoints(spark):
    """q192 invariants the hash gate can't express: the spine is
    dense, each user's endpoints are observed rows, observed rows
    reproduce the exact hourly decimal sum, and every interpolated
    value lies within its bracketing observations (linearity bound —
    a convex combination can never leave [min, max] of the
    brackets)."""
    from pyspark.sql import Window

    g = breadth.q192_gap_fill_linear(spark, SF)
    w = Window.partitionBy("user_id").orderBy("h_ep")
    step = g.select(
        "user_id", (F.col("h_ep") - F.lag("h_ep").over(w)).alias("step")
    )
    assert (
        step.filter(F.col("step").isNotNull() & (F.col("step") != 3600)).count()
        == 0
    )
    ends = g.groupBy("user_id").agg(
        F.min("h_ep").alias("h0"), F.max("h_ep").alias("h1")
    )
    end_rows = g.join(
        ends,
        (g["user_id"] == ends["user_id"])
        & ((g["h_ep"] == ends["h0"]) | (g["h_ep"] == ends["h1"])),
    )
    assert end_rows.filter(F.col("observed") != 1).count() == 0
    # bracket bound on every gap row, via LOCF/NOCB of observed values
    wp = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wn = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    obs_v = F.when(F.col("observed") == 1, F.col("lin_sum_value"))
    b = g.select(
        "observed",
        "lin_sum_value",
        F.last(obs_v, ignorenulls=True).over(wp).alias("pv"),
        F.first(obs_v, ignorenulls=True).over(wn).alias("nv"),
    ).filter(F.col("observed") == 0)
    out_of_band = b.filter(
        (F.col("lin_sum_value") < F.least("pv", "nv") - 1e-9)
        | (F.col("lin_sum_value") > F.greatest("pv", "nv") + 1e-9)
    )
    assert out_of_band.count() == 0
    # observed rows carry the exact hourly decimal sum
    hourly = (
        load_table(spark, SF, "events")
        .filter(F.col("user_id") < 8)
        .groupBy(
            "user_id",
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("h_ep"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(14,2)"))
            .cast("double")
            .alias("v")
        )
    )
    j = g.filter(F.col("observed") == 1).join(hourly, ["user_id", "h_ep"])
    assert j.filter(F.col("lin_sum_value") != F.col("v")).count() == 0


def test_negative_sampling_is_the_pure_md5_function(spark):
    """q193 cross-checked against a from-scratch Python recomputation
    of the declared draw function (bucket index + two-slice address),
    plus the contract invariants: no self-hits, exactly K rows per
    anchor minus dropped self-draws, deterministic across runs."""
    import hashlib

    K, B = 4, 64
    got = {
        (r["doc_id"], r["slot"]): (r["neg_doc_id"], r["neg_n_tokens"])
        for r in breadth.q193_negative_sampling(spark, SF).collect()
    }

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF, "documents")
        .select("doc_id", "text")
        .collect()
    }

    def fold(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    buckets: dict[int, list[int]] = {}
    for did in sorted(docs):
        buckets.setdefault(fold(str(did)) % B, []).append(did)
    expected = {}
    n_dropped = 0
    for did in docs:
        for slot in range(K):
            f2 = fold(f"{did}:{slot}")
            # Declared contract: a slot addressing an EMPTY bucket is
            # dropped (the engine's inner join against the bucket-count
            # dim), exactly like a self-hit — reproduce, don't KeyError.
            members = buckets.get(f2 % B)
            if not members:
                n_dropped += 1
                continue
            neg = members[(f2 // B) % len(members)]
            if neg == did:
                n_dropped += 1
                continue
            # The engine/oracle tokenizer is the explicit [\t\n\f\r ]
            # class (ops/text.py's \x0b hazard note) — str.split() also
            # splits on \x0b/\x1c-\x1f/unicode spaces and would diverge
            # on such a fixture document.
            ntok = len(re.findall(r"[^\t\n\f\r ]+", docs[neg]))
            expected[(did, slot)] = (neg, ntok)
    assert got == expected
    assert len(got) == K * len(docs) - n_dropped
    assert all(k[0] != v[0] for k, v in got.items())
    again = {
        (r["doc_id"], r["slot"]): (r["neg_doc_id"], r["neg_n_tokens"])
        for r in breadth.q193_negative_sampling(spark, SF).collect()
    }
    assert again == got


def test_negative_sampling_invariant_to_shuffle_partitioning(spark):
    """q193's docstring claims reproducibility across REPARTITIONING,
    not just reruns: the corpus index is a bucket-partitioned
    row_number ordered by the unique doc_id (a total order within
    every bucket), so the draw must be a pure function of the data
    no matter how many shuffle partitions the planner uses. Prove it
    by re-running under a deliberately mismatched shuffle-partition
    count and comparing the full result map."""
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    base = {
        (r["doc_id"], r["slot"]): (r["neg_doc_id"], r["neg_n_tokens"])
        for r in breadth.q193_negative_sampling(spark, SF).collect()
    }
    try:
        spark.conf.set(key, "7")
        alt = {
            (r["doc_id"], r["slot"]): (r["neg_doc_id"], r["neg_n_tokens"])
            for r in breadth.q193_negative_sampling(spark, SF).collect()
        }
    finally:
        spark.conf.set(key, before)
    assert alt == base
