"""Reference-shaped query family over loaded CAL-ACCESS fixtures
(SURVEY.md §2.4 R9/R10 on the actual reference schemas): the fixture
TSVs run through the REAL ingest path (split/clean/type), then
latest-amendment-wins and filer navigation are checked against a
hand-computed result.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from calaspark.ingest.clean import split_clean, type_table
from calaspark.ingest.schemas import RCPT_CD, SCHEMAS
from calaspark.queries.calaccess import filer_receipt_totals, latest_filing_lines

FILER_FILINGS_CD = SCHEMAS["FILER_FILINGS_CD"]


def _tsv(path, schema, rows):
    """rows: list of dicts keyed by column; missing columns -> ''."""
    header = "\t".join(schema)
    lines = ["\t".join(r.get(c, "") for c in schema) for r in rows]
    path.write_text("\n".join([header, *lines]) + "\n")
    return str(path)


@pytest.fixture(scope="module")
def calaccess_tables(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("calaccess")

    def rcpt(filing, amend, line, amount):
        return {
            "FILING_ID": str(filing),
            "AMEND_ID": str(amend),
            "LINE_ITEM": str(line),
            "REC_TYPE": "RCPT",
            "FORM_TYPE": "A",
            "AMOUNT": amount,
            "RCPT_DATE": "3/5/2001",
        }

    rcpt_rows = [
        # filing 100: amend 0 has lines 10.00 + 20.00; amend 1
        # REPLACES it with 15.00 + 25.00 (same line count)
        rcpt(100, 0, 1, "10.00"),
        rcpt(100, 0, 2, "20.00"),
        rcpt(100, 1, 1, "15.00"),
        rcpt(100, 1, 2, "25.00"),
        # filing 200: original only
        rcpt(200, 0, 1, "100.00"),
        # filing 300: amend 2 (non-contiguous) REPLACES amend 0 and
        # DROPS a line (2 lines -> 1)
        rcpt(300, 0, 1, "7.00"),
        rcpt(300, 0, 2, "3.00"),
        rcpt(300, 2, 1, "9.00"),
    ]
    link_rows = [
        {"FILER_ID": "11", "FILING_ID": "100"},
        {"FILER_ID": "11", "FILING_ID": "100"},  # published duplicate
        {"FILER_ID": "11", "FILING_ID": "200"},
        {"FILER_ID": "22", "FILING_ID": "300"},
        {"FILER_ID": "33", "FILING_ID": "400"},  # filing with no receipts
    ]

    rcpt_res = split_clean(
        spark, _tsv(d / "RCPT_CD.TSV", RCPT_CD, rcpt_rows), list(RCPT_CD)
    )
    assert rcpt_res.quarantine.count() == 0
    typed_rcpt = type_table(rcpt_res.good, RCPT_CD)

    link_res = split_clean(
        spark,
        _tsv(d / "FILER_FILINGS_CD.TSV", FILER_FILINGS_CD, link_rows),
        list(FILER_FILINGS_CD),
    )
    assert link_res.quarantine.count() == 0
    typed_links = type_table(link_res.good, FILER_FILINGS_CD)
    return typed_rcpt, typed_links


def test_latest_amendment_replaces_whole_filing(calaccess_tables):
    typed_rcpt, _ = calaccess_tables
    live = latest_filing_lines(typed_rcpt)
    got = {
        (r["FILING_ID"], r["AMEND_ID"], r["LINE_ITEM"]): float(r["AMOUNT"])
        for r in live.collect()
    }
    # hand-computed: filing 100 -> amend 1's two lines; 200 -> its
    # original; 300 -> amend 2's SINGLE line (dropped line stays gone)
    assert got == {
        (100, 1, 1): 15.00,
        (100, 1, 2): 25.00,
        (200, 0, 1): 100.00,
        (300, 2, 1): 9.00,
    }


def test_filer_totals_navigate_and_dedupe_links(calaccess_tables):
    typed_rcpt, typed_links = calaccess_tables
    rows = filer_receipt_totals(typed_rcpt, typed_links).collect()
    got = {
        r["FILER_ID"]: (r["n_filings"], r["n_lines"], r["total_amount"])
        for r in rows
    }
    # hand-computed: filer 11 = filing 100 (15+25) + filing 200 (100)
    # over 3 live lines; filer 22 = filing 300's amended 9.00; filer
    # 33 has no receipt lines -> absent (inner navigation join);
    # the duplicate (11, 100) link row must NOT double-count.
    assert got == {
        11: (2, 3, 140.00),
        22: (1, 1, 9.00),
    }


def test_amount_is_exact_decimal(calaccess_tables):
    typed_rcpt, _ = calaccess_tables
    assert dict(typed_rcpt.dtypes)["AMOUNT"].startswith("decimal")
    # typed decimal sums are exact: 0.10-style cents survive
    s = (
        latest_filing_lines(typed_rcpt)
        .agg(F.sum("AMOUNT").alias("s"))
        .collect()[0]["s"]
    )
    assert float(s) == 149.00


@pytest.fixture(scope="module")
def lpay_table(spark, tmp_path_factory):
    from calaspark.ingest.schemas import SCHEMAS

    LPAY_CD = SCHEMAS["LPAY_CD"]
    d = tmp_path_factory.mktemp("calaccess_lpay")

    def lpay(filing, amend, line, emplr_id, naml, fees, reimb, per):
        return {
            "FILING_ID": str(filing),
            "AMEND_ID": str(amend),
            "LINE_ITEM": str(line),
            "REC_TYPE": "LPAY",
            "FORM_TYPE": "F625P2",
            "EMPLR_ID": emplr_id,
            "EMPLR_NAML": naml,
            "FEES_AMT": fees,
            "REIMB_AMT": reimb,
            "PER_TOTAL": per,
        }

    rows = [
        # filing 500: amend 1 replaces amend 0 (fees 100 -> 120)
        lpay(500, 0, 1, "E1", "Acme", "100.00", "10.00", "110.00"),
        lpay(500, 1, 1, "E1", "Acme", "120.00", "10.00", "130.00"),
        # filing 600: no EMPLR_ID -> normalized-name key; reported
        # total drifts from the itemized sum by 0.50
        lpay(600, 0, 1, "", "  beta corp ", "50.00", "0.00", "49.50"),
        # second employer line on the same filing
        lpay(600, 0, 2, "E1", "Acme", "5.00", "0.00", "5.00"),
    ]
    res = split_clean(
        spark, _tsv(d / "LPAY_CD.TSV", LPAY_CD, rows), list(LPAY_CD)
    )
    assert res.quarantine.count() == 0
    from calaspark.ingest.clean import type_table as _tt

    return _tt(res.good, LPAY_CD)


def test_employer_payment_totals_lobbying(lpay_table):
    from calaspark.queries.calaccess import employer_payment_totals

    out = {
        r["employer_key"]: (
            r["n_filings"],
            r["n_lines"],
            r["total_fees"],
            r["total_reimb"],
            r["itemized_minus_reported"],
        )
        for r in employer_payment_totals(lpay_table).collect()
    }
    # E1: live lines = filing 500 amend 1 (120+10) + filing 600 line 2
    # (5+0); reported totals 130 + 5 -> drift 0.00
    assert out["E1"] == (2, 2, 125.0, 10.0, 0.0)
    # beta corp: name-normalized key, reported total short by 0.50
    assert out["BETA CORP"] == (1, 1, 50.0, 0.0, 0.5)
    assert len(out) == 2
