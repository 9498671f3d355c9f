"""Reference-shaped queries over the ACTUAL CAL-ACCESS tables
(SURVEY.md §2.4 R9/R10 exercised on the reference's own schemas, not
the generic testdata twins).

The reference's consumers run two idioms against every amendable
table (`calaccess_raw/models/base.py §UNIQUE_KEY` encodes the
convention; the reference delegates the SQL to its users):

- **latest-amendment-wins** (R10): an amendment REPLACES the whole
  filing, so the live itemization is "all lines of the max AMEND_ID
  per FILING_ID" — note this is per-FILING max-and-keep-lines, not
  per-line latest (amendments may add or drop lines);
- **filer↔filing navigation** (R9): FILER_FILINGS_CD links
  FILING_ID → FILER_ID (with published duplicate rows — the
  reference declares no unique key for it), so per-filer rollups are
  a dedup + equi-join away.

Both run on the TYPED lake tables produced by
:mod:`calaspark.ingest` (decimal amounts, int amendment ids), so the
money math is exact.

100 TB shape: the latest-amendment filter is one window max over
FILING_ID (shuffle on the partition key — the natural layout key for
an amendable filing table, so in a bucketed lake it's shuffle-free);
the navigation join deduplicates the link table and joins it on the
filing key WITHOUT a broadcast hint (one link row per filing — the
table scales with the fact side; AQE broadcasts it only when it is
actually small); the rollup is a map-side-combined hash aggregate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def latest_filing_lines(
    df: DataFrame,
    filing_col: str = "FILING_ID",
    amend_col: str = "AMEND_ID",
) -> DataFrame:
    """All lines of each filing's highest amendment (R10).

    Window max + filter — no join, one shuffle on ``filing_col``;
    amendments with fewer/more lines than the original are handled
    correctly because selection is per filing, not per line.
    """
    w = Window.partitionBy(filing_col)
    return (
        df.withColumn("_max_amend", F.max(amend_col).over(w))
        .filter(F.col(amend_col) == F.col("_max_amend"))
        .drop("_max_amend")
    )


def filer_receipt_totals(
    rcpt: DataFrame,
    filer_filings: DataFrame,
    amount_col: str = "AMOUNT",
) -> DataFrame:
    """Per-filer receipt totals over live (latest-amendment) lines
    (R9 + R10 + R3 composed on the reference's own tables).

    ``filer_filings`` may contain duplicate link rows (CAL-ACCESS
    publishes them; the reference model declares no unique key) —
    they are collapsed before the join so amounts are never double
    counted. No broadcast hint: the link table has one row per
    filing, so it scales with the fact side — AQE broadcasts it when
    it is actually small. Totals stay exact decimal until the final
    round/cast.
    """
    live = latest_filing_lines(rcpt)
    links = filer_filings.select("FILER_ID", "FILING_ID").distinct()
    return (
        live.join(links, "FILING_ID")
        .groupBy("FILER_ID")
        .agg(
            F.countDistinct("FILING_ID").alias("n_filings"),
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(amount_col), 2).cast("double").alias("total_amount"),
        )
        .orderBy("FILER_ID")
    )


def employer_payment_totals(
    lpay: DataFrame,
    fee_col: str = "FEES_AMT",
    reimb_col: str = "REIMB_AMT",
    total_col: str = "PER_TOTAL",
) -> DataFrame:
    """Per-employer lobbying payment totals over live lines (the
    lobbying-side twin of :func:`filer_receipt_totals` — R10 + R3 on
    `LPAY_CD`, the F625/F635 payment itemization).

    Same latest-amendment-wins discipline; grouped by the employer
    identity pair (EMPLR_ID when present, else the normalized name),
    with exact decimal fee/reimbursement/period sums. The reported-
    total reconciliation column (`Σ fees+reimb − Σ PER_TOTAL`) is the
    data-quality check the reference's consumers run — CAL-ACCESS
    period totals are self-reported and drift from the itemized sum.
    """
    live = latest_filing_lines(lpay)
    key = F.coalesce(
        F.col("EMPLR_ID"), F.upper(F.trim(F.col("EMPLR_NAML")))
    ).alias("employer_key")
    return (
        live.select(
            key,
            F.col(fee_col).alias("_fees"),
            F.col(reimb_col).alias("_reimb"),
            F.col(total_col).alias("_per"),
            "FILING_ID",
        )
        .groupBy("employer_key")
        .agg(
            F.countDistinct("FILING_ID").alias("n_filings"),
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("_fees"), 2).cast("double").alias("total_fees"),
            F.round(F.sum("_reimb"), 2).cast("double").alias("total_reimb"),
            F.round(
                F.sum(F.coalesce("_fees", F.lit(0).cast("decimal(14,2)")))
                + F.sum(F.coalesce("_reimb", F.lit(0).cast("decimal(14,2)")))
                - F.sum(F.coalesce("_per", F.lit(0).cast("decimal(14,2)"))),
                2,
            )
            .cast("double")
            .alias("itemized_minus_reported"),
        )
        .orderBy("employer_key")
    )


def q105_calaccess_latest(spark, sf_dir: str):
    """Latest-amendment-wins + filer navigation, HASH-GATED (the
    round-6 verdict's ask: the R9/R10 CAL-ACCESS semantics above
    were pytest-only; this registers the same two idioms as an
    oracled driver query by deriving an amendable filing itemization
    deterministically from the generic testdata — same derivation in
    the DuckDB twin, so candidate generation AND the latest-wins
    filter are value-checked end to end).

    Derivation (both engines): each `orders` row is a FILING with
    ``o_orderkey % 3`` amendments beyond the original; amendment
    ``a`` of a filing re-files the order's lineitems, DROPPING lines
    where ``(l_linenumber + a) % 7 == 0`` (amendments add/drop lines
    — the reason latest-wins must be per-filing, not per-line) and
    bumping each amount by ``a`` cents. The FILER_FILINGS link table
    carries published duplicate rows (every ``%5 == 0`` key twice),
    collapsed before the join exactly as
    :func:`filer_receipt_totals` does.

    Plan: one explode (≤3× fan-out), one filing-keyed equi-join to
    lineitem, :func:`latest_filing_lines`'s single window max on the
    filing key, the deduped link join, and one map-side-combined
    hash aggregate — at 100 TB everything partitions on FILING_ID
    except the final filer rollup. The link join carries NO
    broadcast hint on purpose: a filing→filer link table has one
    row per filing, i.e. it SCALES WITH the fact side — hinting it
    broadcast would ship a data-sized table to every executor at
    100×. It joins shuffle-on-filing_id (the key the latest-
    amendment window just partitioned by), and AQE still picks a
    broadcast at small scale on its own. Amounts stay exact decimal
    until the final round→double (rule 1).
    """
    from ..tables import load_table

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    amend = o.select(
        F.col("o_orderkey").alias("filing_id"),
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("o_orderkey") % 3)
        ).alias("amend_id"),
    )
    lines = (
        amend.join(li, amend["filing_id"] == li["l_orderkey"])
        .filter((F.col("l_linenumber") + F.col("amend_id")) % 7 != 0)
        .select(
            "filing_id",
            "amend_id",
            (
                F.col("l_extendedprice").cast("decimal(12,2)")
                + F.col("amend_id").cast("decimal(12,2)")
                * F.lit("0.01").cast("decimal(12,2)")
            ).alias("amount"),
        )
    )
    live = latest_filing_lines(lines, "filing_id", "amend_id")
    links = (
        o.select(
            F.col("o_orderkey").alias("filing_id"),
            F.col("o_custkey").alias("filer_id"),
        )
        .unionAll(
            o.filter(F.col("o_orderkey") % 5 == 0).select(
                F.col("o_orderkey").alias("filing_id"),
                F.col("o_custkey").alias("filer_id"),
            )
        )
        .distinct()
    )
    return (
        live.join(links, "filing_id")
        .groupBy("filer_id")
        .agg(
            F.countDistinct("filing_id").alias("n_filings"),
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("amount"), 2).cast("double").alias("total_amount"),
        )
        .orderBy("filer_id")
    )


def q112_amendment_deltas(spark, sf_dir: str):
    """Amendment AUDIT TRAIL (R10's other half — q105 answers "what
    is live now?", this answers "what did each amendment CHANGE?"):
    per (filing, amendment), the line count and exact-decimal total
    of the re-filed itemization, with lag deltas against the
    previous amendment of the same filing, rolled up per amendment
    generation — the report a compliance reviewer reads to see how
    much restatement each amendment wave carried.

    Same deterministic derivation as q105 (o_orderkey%3 amendments,
    (line+a)%7 drops, +a-cent bumps). Plan: one explode + one
    filing-keyed join, one (filing, amend) hash aggregate, one
    filing-partitioned LAG window (amendment counts per filing ≤ 3
    — bounded partitions), one small rollup. Money stays decimal
    until the final round→double.
    """
    from ..tables import load_table

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    amend = o.select(
        F.col("o_orderkey").alias("filing_id"),
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("o_orderkey") % 3)
        ).alias("amend_id"),
    )
    lines = (
        amend.join(li, amend["filing_id"] == li["l_orderkey"])
        .filter((F.col("l_linenumber") + F.col("amend_id")) % 7 != 0)
        .select(
            "filing_id",
            "amend_id",
            (
                F.col("l_extendedprice").cast("decimal(12,2)")
                + F.col("amend_id").cast("decimal(12,2)")
                * F.lit("0.01").cast("decimal(12,2)")
            ).alias("amount"),
        )
    )
    per = lines.groupBy("filing_id", "amend_id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("amount").alias("total"),
    )
    w = Window.partitionBy("filing_id").orderBy("amend_id")
    d = per.select(
        "filing_id",
        "amend_id",
        "n_lines",
        "total",
        (F.col("n_lines") - F.lag("n_lines").over(w)).alias("d_lines"),
        (F.col("total") - F.lag("total").over(w)).alias("d_total"),
    )
    return (
        d.filter(F.col("amend_id") > 0)
        .groupBy("amend_id")
        .agg(
            F.count(F.lit(1)).alias("n_filings_amended"),
            F.sum(F.abs(F.col("d_lines")).cast("long")).alias("abs_line_churn"),
            F.round(F.sum(F.abs(F.col("d_total"))), 2)
            .cast("double")
            .alias("abs_amount_churn"),
            F.round(F.sum("d_total"), 2).cast("double").alias("net_amount_delta"),
        )
        .orderBy("amend_id")
    )
