"""Shared test fixtures: one small local SparkSession + dirty-TSV
fixtures reproducing the reference's test-data pathologies
(FIXTURES.md §2; SURVEY.md §5.1 — the reference ships sampled state
TSVs with real-world damage and asserts the clean/load pipeline
accounts for every line)."""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Small session for tests — set BEFORE get_spark reads the env.
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("CALASPARK_DRIVER_MEM", "2g")

from calaspark.ingest.schemas import RCPT_CD  # noqa: E402
from calaspark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("calaspark-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


# ------------------------------------------------------------ fixtures

#: A fully valid RCPT_CD row (keyed by column, FIXTURES.md §2.1).
GOOD_ROW: dict[str, str] = {
    "FILING_ID": "1774444",
    "AMEND_ID": "0",
    "LINE_ITEM": "1",
    "REC_TYPE": "RCPT",
    "FORM_TYPE": "A",
    "TRAN_ID": "INC12345",
    "ENTITY_CD": "IND",
    "CTRIB_NAML": "SMITH",
    "CTRIB_NAMF": "JANE",
    "CTRIB_CITY": "SACRAMENTO",
    "CTRIB_ST": "CA",
    "CTRIB_ZIP4": "95814",
    "CTRIB_EMP": "ACME CORP",
    "CTRIB_OCC": "ENGINEER",
    "RCPT_DATE": "3/5/2001",
    "AMOUNT": "1234.56",
    "CUM_YTD": "5000.00",
    "MEMO_CODE": "Y",
    "MEMO_REFNO": "",
    "CMTE_ID": "C00123",
}


def _row(**overrides: str) -> str:
    d = dict(GOOD_ROW)
    d.update(overrides)
    # Columns beyond the curated GOOD_ROW subset default to "" —
    # CAL-ACCESS publishes empty strings pervasively and T1 types
    # them to NULL, so the fixture stays valid at full table width.
    return "\t".join(d.get(c, "") for c in RCPT_CD)


@pytest.fixture(scope="session")
def dirty_tsv(tmp_path_factory) -> dict:
    """RCPT_CD.TSV with the reference's pathologies:

    - CRLF line endings on some rows (C3)
    - embedded control chars (C4)
    - short row / long row → quarantine (C1)
    - empty strings, bad date, bad amount, bad flag (T1–T3 targets)
    """
    raw_dir = tmp_path_factory.mktemp("raw")
    header = "\t".join(RCPT_CD)
    good = [
        _row(),
        _row(FILING_ID="1774445", AMEND_ID="2", MEMO_CODE="N"),
        # CRLF ending (repaired in cleaning, still good)
        _row(FILING_ID="1774446", CTRIB_NAML="O'BRIEN") + "\r",
        # control char inside a field (stripped, still good)
        _row(FILING_ID="1774447", CTRIB_EMP="BAD\x01CTRL\x07CO"),
        # empty date + empty amount (typed to NULL, still good)
        _row(FILING_ID="1774448", RCPT_DATE="", AMOUNT="", MEMO_CODE=""),
        # unparseable date/amount/flag (typed to NULL, still good)
        _row(
            FILING_ID="1774449",
            RCPT_DATE="13/45/20XX",
            AMOUNT="12,34",
            MEMO_CODE="X",
        ),
        # C2: BOM + Windows-1252 curly quotes / en-dash / NBSP
        "﻿" + _row(FILING_ID="1774450", CTRIB_NAML="“O’HARA–SMITH” JR"),
    ]
    bad = [
        "ONLY\tTHREE\tFIELDS",  # short row
        _row() + "\tEXTRA_FIELD",  # long row
    ]
    path = raw_dir / "RCPT_CD.TSV"
    path.write_text("\n".join([header, *good, *bad]) + "\n")
    return {
        "raw_dir": str(raw_dir),
        "path": str(path),
        "n_good": len(good),
        "n_bad": len(bad),
    }
