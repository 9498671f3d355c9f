"""Round-5 breadth query invariants (calaspark/queries/breadth.py).

Correctness vs the DuckDB oracle is the driver's job (and
tools/verify_local.py's); these tests pin the SEMANTIC invariants the
hash gate can't express — merge action accounting, chunk coverage,
redaction completeness, outer-explode null extension.
"""

from __future__ import annotations

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
