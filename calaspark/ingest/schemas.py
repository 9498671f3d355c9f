"""Declarative raw-table schemas (FIXTURES.md §2; SURVEY.md §2.1 S3, §2.2 T1–T3).

The reference declares ~80 fixed table schemas as Django models
(`calaccess_raw/models/*.py`) whose fields carry their own typing
templates (`calaccess_raw/fields.py §DateField.copy_template` etc.).
Here a schema is a plain ordered mapping column → logical kind; the
kinds drive the distributed typing transforms in
:mod:`calaspark.ingest.clean`.

Kinds:

- ``string``          — trimmed, empty→NULL (T1)
- ``int`` / ``long``  — try_cast, invalid→NULL (T3)
- ``decimal(p,s)``    — try_cast to exact decimal (T3)
- ``date_mdy``        — ``M/d/yyyy`` → DATE (T2)
- ``ts_mdy12``        — ``M/d/yyyy h:mm:ss a`` → TIMESTAMP_NTZ (T2)
- ``yn``              — ``'Y'/'N'/''`` → nullable INT 1/0 (T3)

All raw columns arrive as strings from the TSV (the reference's COPY
semantics); every kind maps to a single whole-stage-codegen
expression — no Python in the loop at any scale.
"""

from __future__ import annotations

#: Representative subset of `calaccess_raw/models/campaign.py §RcptCd`
#: (receipts — the big fact table).
RCPT_CD: dict[str, str] = {
    "FILING_ID": "long",
    "AMEND_ID": "int",
    "LINE_ITEM": "int",
    "REC_TYPE": "string",
    "FORM_TYPE": "string",
    "TRAN_ID": "string",
    "ENTITY_CD": "string",
    "CTRIB_NAML": "string",
    "CTRIB_NAMF": "string",
    "CTRIB_CITY": "string",
    "CTRIB_ST": "string",
    "CTRIB_ZIP4": "string",
    "CTRIB_EMP": "string",
    "CTRIB_OCC": "string",
    "RCPT_DATE": "date_mdy",
    "AMOUNT": "decimal(14,2)",
    "CUM_YTD": "decimal(14,2)",
    "MEMO_CODE": "yn",
    "MEMO_REFNO": "string",
    "CMTE_ID": "string",
}

#: `calaccess_raw/models/campaign.py §ExpnCd` (expenditures).
EXPN_CD: dict[str, str] = {
    "FILING_ID": "long",
    "AMEND_ID": "int",
    "LINE_ITEM": "int",
    "REC_TYPE": "string",
    "FORM_TYPE": "string",
    "TRAN_ID": "string",
    "ENTITY_CD": "string",
    "PAYEE_NAML": "string",
    "PAYEE_NAMF": "string",
    "PAYEE_CITY": "string",
    "PAYEE_ST": "string",
    "PAYEE_ZIP4": "string",
    "EXPN_DATE": "date_mdy",
    "AMOUNT": "decimal(14,2)",
    "CUM_YTD": "decimal(14,2)",
    "EXPN_CHKNO": "string",
    "EXPN_CODE": "string",
    "EXPN_DSCR": "string",
    "MEMO_CODE": "yn",
    "MEMO_REFNO": "string",
    "BAKREF_TID": "string",
}

#: `calaccess_raw/models/campaign.py §CvrCampaignDisclosureCd`
#: (cover sheet; representative subset, incl. timestamp + Y/N pairs).
CVR_CAMPAIGN_DISCLOSURE_CD: dict[str, str] = {
    "FILING_ID": "long",
    "AMEND_ID": "int",
    "REC_TYPE": "string",
    "FORM_TYPE": "string",
    "FILER_ID": "string",
    "FILER_NAML": "string",
    "FILER_NAMF": "string",
    "RPT_DATE": "date_mdy",
    "FROM_DATE": "date_mdy",
    "THRU_DATE": "date_mdy",
    "ELECT_DATE": "date_mdy",
    "RPT_DATE_TS": "ts_mdy12",
    "STMT_TYPE": "string",
    "AMENDEXP_1": "string",
    "CONTROL_YN": "yn",
    "SPONSOR_YN": "yn",
    "FILER_CITY": "string",
    "FILER_ST": "string",
    "FILER_ZIP4": "string",
}

SCHEMAS: dict[str, dict[str, str]] = {
    "RCPT_CD": RCPT_CD,
    "EXPN_CD": EXPN_CD,
    "CVR_CAMPAIGN_DISCLOSURE_CD": CVR_CAMPAIGN_DISCLOSURE_CD,
}
