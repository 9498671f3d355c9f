"""Declarative raw-table schema REGISTRY with documentation metadata
(FIXTURES.md §2; SURVEY.md §1.1/§1.2, §2.1 S3, §2.2 T1–T3, §5.1).

The reference declares ~80 fixed table schemas as Django models
(`calaccess_raw/models/{campaign,lobbying,common,other,inactive}.py`)
whose fields carry their own typing templates
(`calaccess_raw/fields.py §DateField.copy_template` etc.) AND their
own documentation: every field has ``help_text``, every model carries
``DOCUMENTCLOUD_PAGES`` (pointers into scanned state docs) and
``FILING_FORMS`` (which official forms feed the table), and the test
suite enforces completeness (`models/base.py`, SURVEY §5.1).

The Spark twin here:

- each table is a :class:`Table` — ordered ``column → Col(kind,
  help)`` plus group (source module), ``unique_key`` (the reference's
  ``UNIQUE_KEY`` class attr; ``None`` = CAL-ACCESS itself has dupes),
  ``forms`` (FILING_FORMS twin) and ``docs`` (documentation pointer
  twin);
- :func:`to_struct_type` projects a table into a typed
  ``StructType`` whose ``StructField.metadata`` carries the help
  text — the idiomatic Spark home for column docs (survives writes
  to parquet field metadata, readable via ``df.schema``);
- ``tests/test_ingest.py`` enforces the same completeness golden
  rule: every registered table documented, every column annotated.

Kinds (each maps to ONE whole-stage-codegen expression in
:mod:`calaspark.ingest.clean` — no Python in the loop at any scale):

- ``string``          — trimmed, empty→NULL (T1)
- ``int`` / ``long``  — try_cast, invalid→NULL (T3)
- ``decimal(p,s)``    — try_cast to exact decimal (T3)
- ``date_mdy``        — ``M/d/yyyy`` → DATE (T2)
- ``ts_mdy12``        — ``M/d/yyyy h:mm:ss a`` → TIMESTAMP_NTZ (T2)
- ``yn``              — ``'Y'/'N'/''`` → nullable INT 1/0 (T3)

The headline tables — RCPT_CD (63 cols), EXPN_CD (53),
CVR_CAMPAIGN_DISCLOSURE_CD (~86), LOAN_CD (49), SMRY_CD (12 = its
entire public width), and (round 5) DEBT_CD (33), S497_CD (40),
LEXP_CD (25), LCCM_CD (29), LPAY_CD (26), LOTH_CD (21),
FILER_FILINGS_CD (16) — carry their FULL public CAL-ACCESS column
sets; S401_CD (37) likewise carries the full public S401Cd field
list; CVR_REGISTRATION_CD (70) and CVR_LOBBY_DISCLOSURE_CD (57)
carry the full public cover blocks of the F601–F604 registration
and F615–F645 disclosure forms (filer/address/classification/
authorization/checkbox/signature groups per the public CAL-ACCESS
format specification); round 6 adds the full public widths of
CVR_SO_CD (~53: committee classification/bank/treasurer/82013
blocks), CVR2_CAMPAIGN_DISCLOSURE_CD (~42), CVR2_SO_CD (~42) and
LOBBY_AMENDMENTS_CD (~38: the three add/delete amendment blocks).
The remaining tables are either full-width already (most narrow
lookup/junction tables ARE this narrow in CAL-ACCESS) or
representative column subsets (enough to exercise every kind per
table family).
The typing machinery is fully general, so widening a table is one
dict entry per column.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.types import (
    DataType,
    DateType,
    DecimalType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)


@dataclass(frozen=True)
class Col:
    """One declared column: logical typing kind + help_text twin."""

    kind: str
    help: str


@dataclass(frozen=True)
class Table:
    """One declared table: the model-class twin.

    ``group``      — source module in the reference (campaign /
                     lobbying / common / other / inactive).
    ``unique_key`` — the reference's UNIQUE_KEY class attr; ``None``
                     means CAL-ACCESS publishes duplicate rows for
                     this table (the reference uses ``False``).
    ``forms``      — FILING_FORMS twin: official form IDs feeding it.
    ``docs``       — one-line DOCUMENTCLOUD_PAGES twin (what the
                     table holds, per the state's documentation).
    """

    group: str
    unique_key: tuple[str, ...] | None
    forms: tuple[str, ...]
    docs: str
    columns: dict[str, Col]


# Shared column stubs — the filing-identity prefix nearly every
# transactional CAL-ACCESS table starts with.
def _filing_cols(line_item: bool = True) -> dict[str, Col]:
    out = {
        "FILING_ID": Col("long", "Unique filing identification number"),
        "AMEND_ID": Col("int", "Amendment number; 0 is the original filing"),
    }
    if line_item:
        out["LINE_ITEM"] = Col("int", "Line item number of this record")
    out["REC_TYPE"] = Col("string", "Record type of the transaction")
    out["FORM_TYPE"] = Col("string", "Schedule or form on which reported")
    return out


REGISTRY: dict[str, Table] = {
    # ------------------------------------------------ campaign.py
    "RCPT_CD": Table(
        group="campaign",
        unique_key=("FILING_ID", "AMEND_ID", "LINE_ITEM", "REC_TYPE", "FORM_TYPE"),
        forms=("F460", "F401", "F496"),
        docs="Itemized campaign contributions received (Schedule A receipts)",
        # Full public column set (reference
        # calaccess_raw/models/campaign.py §RcptCd — 63 fields).
        columns={
            **_filing_cols(),
            "TRAN_ID": Col("string", "Permanent transaction ID"),
            "ENTITY_CD": Col("string", "Contributor entity type code"),
            "CTRIB_NAML": Col("string", "Contributor last name or business name"),
            "CTRIB_NAMF": Col("string", "Contributor first name"),
            "CTRIB_NAMT": Col("string", "Contributor name title or prefix"),
            "CTRIB_NAMS": Col("string", "Contributor name suffix"),
            "CTRIB_CITY": Col("string", "Contributor city"),
            "CTRIB_ST": Col("string", "Contributor state"),
            "CTRIB_ZIP4": Col("string", "Contributor ZIP+4"),
            "CTRIB_EMP": Col("string", "Contributor employer"),
            "CTRIB_OCC": Col("string", "Contributor occupation"),
            "CTRIB_SELF": Col("yn", "Contributor self-employed checkbox"),
            "TRAN_TYPE": Col("string", "Transaction type code (T, R, I, X...)"),
            "RCPT_DATE": Col("date_mdy", "Date the contribution was received"),
            "DATE_THRU": Col("date_mdy", "End of a date range the receipt spans"),
            "AMOUNT": Col("decimal(14,2)", "Amount received in the period"),
            "CUM_YTD": Col("decimal(14,2)", "Cumulative year-to-date amount"),
            "CUM_OTH": Col("decimal(14,2)", "Cumulative other (e.g. primary) amount"),
            "CTRIB_DSCR": Col("string", "Description of a non-monetary contribution"),
            "CMTE_ID": Col("string", "Committee ID of recipient committee"),
            "TRES_NAML": Col("string", "Treasurer last name"),
            "TRES_NAMF": Col("string", "Treasurer first name"),
            "TRES_NAMT": Col("string", "Treasurer name title or prefix"),
            "TRES_NAMS": Col("string", "Treasurer name suffix"),
            "TRES_CITY": Col("string", "Treasurer city"),
            "TRES_ST": Col("string", "Treasurer state"),
            "TRES_ZIP4": Col("string", "Treasurer ZIP+4"),
            "INTR_NAML": Col("string", "Intermediary last name or business name"),
            "INTR_NAMF": Col("string", "Intermediary first name"),
            "INTR_NAMT": Col("string", "Intermediary name title or prefix"),
            "INTR_NAMS": Col("string", "Intermediary name suffix"),
            "INTR_CITY": Col("string", "Intermediary city"),
            "INTR_ST": Col("string", "Intermediary state"),
            "INTR_ZIP4": Col("string", "Intermediary ZIP+4"),
            "INTR_EMP": Col("string", "Intermediary employer"),
            "INTR_OCC": Col("string", "Intermediary occupation"),
            "INTR_SELF": Col("yn", "Intermediary self-employed checkbox"),
            "CAND_NAML": Col("string", "Supported/opposed candidate last name"),
            "CAND_NAMF": Col("string", "Supported/opposed candidate first name"),
            "CAND_NAMT": Col("string", "Candidate name title or prefix"),
            "CAND_NAMS": Col("string", "Candidate name suffix"),
            "OFFICE_CD": Col("string", "Office sought or held, coded"),
            "OFFIC_DSCR": Col("string", "Office sought or held, described"),
            "JURIS_CD": Col("string", "Office jurisdiction code"),
            "JURIS_DSCR": Col("string", "Office jurisdiction description"),
            "DIST_NO": Col("string", "District number of the office"),
            "OFF_S_H_CD": Col("string", "Office sought (S) or held (H) code"),
            "BAL_NAME": Col("string", "Ballot measure name"),
            "BAL_NUM": Col("string", "Ballot measure number or letter"),
            "BAL_JURIS": Col("string", "Ballot measure jurisdiction"),
            "SUP_OPP_CD": Col("string", "Support (S) or opposition (O) code"),
            "MEMO_CODE": Col("yn", "Memo amount flag (not totaled)"),
            "MEMO_REFNO": Col("string", "Reference to accompanying text memo"),
            "BAKREF_TID": Col("string", "Back-reference to a parent transaction"),
            "XREF_SCHNM": Col("string", "Related schedule for the cross-reference"),
            "XREF_MATCH": Col("string", "Related-item cross-reference checkbox (X)"),
            "INT_RATE": Col("string", "Interest rate (loan-receipt forms)"),
            "INTR_CMTEID": Col("string", "Intermediary committee ID"),
        },
    ),
    "EXPN_CD": Table(
        group="campaign",
        unique_key=("FILING_ID", "AMEND_ID", "LINE_ITEM", "REC_TYPE", "FORM_TYPE"),
        forms=("F460", "F450", "F461"),
        docs="Itemized campaign expenditures made (Schedule E payments)",
        # Full public column set (reference
        # calaccess_raw/models/campaign.py §ExpnCd — 53 fields).
        columns={
            **_filing_cols(),
            "TRAN_ID": Col("string", "Permanent transaction ID"),
            "ENTITY_CD": Col("string", "Payee entity type code"),
            "PAYEE_NAML": Col("string", "Payee last name or business name"),
            "PAYEE_NAMF": Col("string", "Payee first name"),
            "PAYEE_NAMT": Col("string", "Payee name title or prefix"),
            "PAYEE_NAMS": Col("string", "Payee name suffix"),
            "PAYEE_CITY": Col("string", "Payee city"),
            "PAYEE_ST": Col("string", "Payee state"),
            "PAYEE_ZIP4": Col("string", "Payee ZIP+4"),
            "EXPN_DATE": Col("date_mdy", "Date of the expenditure"),
            "AMOUNT": Col("decimal(14,2)", "Amount paid in the period"),
            "CUM_YTD": Col("decimal(14,2)", "Cumulative year-to-date amount"),
            "CUM_OTH": Col("decimal(14,2)", "Cumulative other (e.g. primary) amount"),
            "EXPN_CHKNO": Col("string", "Check number of the payment"),
            "EXPN_CODE": Col("string", "Expense classification code"),
            "EXPN_DSCR": Col("string", "Description of the expenditure"),
            "AGENT_NAML": Col("string", "Agent or independent contractor last name"),
            "AGENT_NAMF": Col("string", "Agent or independent contractor first name"),
            "AGENT_NAMT": Col("string", "Agent name title or prefix"),
            "AGENT_NAMS": Col("string", "Agent name suffix"),
            "CMTE_ID": Col("string", "Committee ID of a committee payee"),
            "TRES_NAML": Col("string", "Treasurer last name"),
            "TRES_NAMF": Col("string", "Treasurer first name"),
            "TRES_NAMT": Col("string", "Treasurer name title or prefix"),
            "TRES_NAMS": Col("string", "Treasurer name suffix"),
            "TRES_CITY": Col("string", "Treasurer city"),
            "TRES_ST": Col("string", "Treasurer state"),
            "TRES_ZIP4": Col("string", "Treasurer ZIP+4"),
            "CAND_NAML": Col("string", "Supported/opposed candidate last name"),
            "CAND_NAMF": Col("string", "Supported/opposed candidate first name"),
            "CAND_NAMT": Col("string", "Candidate name title or prefix"),
            "CAND_NAMS": Col("string", "Candidate name suffix"),
            "OFFICE_CD": Col("string", "Office sought or held, coded"),
            "OFFIC_DSCR": Col("string", "Office sought or held, described"),
            "JURIS_CD": Col("string", "Office jurisdiction code"),
            "JURIS_DSCR": Col("string", "Office jurisdiction description"),
            "DIST_NO": Col("string", "District number of the office"),
            "OFF_S_H_CD": Col("string", "Office sought (S) or held (H) code"),
            "BAL_NAME": Col("string", "Ballot measure name"),
            "BAL_NUM": Col("string", "Ballot measure number or letter"),
            "BAL_JURIS": Col("string", "Ballot measure jurisdiction"),
            "SUP_OPP_CD": Col("string", "Support (S) or opposition (O) code"),
            "MEMO_CODE": Col("yn", "Memo amount flag (not totaled)"),
            "MEMO_REFNO": Col("string", "Reference to accompanying text memo"),
            "BAKREF_TID": Col("string", "Back-reference to a parent transaction"),
            "G_FROM_E_F": Col("string", "Schedule G payment from Schedule E or F"),
            "XREF_SCHNM": Col("string", "Related schedule for the cross-reference"),
            "XREF_MATCH": Col("string", "Related-item cross-reference checkbox (X)"),
        },
    ),
    "CVR_CAMPAIGN_DISCLOSURE_CD": Table(
        group="campaign",
        unique_key=("FILING_ID", "AMEND_ID"),
        forms=("F460", "F450", "F425", "F461", "F465", "F496", "F497", "F498"),
        docs="Cover page of campaign disclosure statements",
        # Full public column set (reference calaccess_raw/models/
        # campaign.py §CvrCampaignDisclosureCd — the widest cover
        # table, ~86 fields). RPT_DATE_TS is this engine's typed
        # ts_mdy12 demo column carried alongside the public set.
        columns={
            **_filing_cols(line_item=False),
            "FILER_ID": Col("string", "Filer identification number"),
            "ENTITY_CD": Col("string", "Filer entity type code"),
            "FILER_NAML": Col("string", "Filer last name or committee name"),
            "FILER_NAMF": Col("string", "Filer first name"),
            "FILER_NAMT": Col("string", "Filer name title or prefix"),
            "FILER_NAMS": Col("string", "Filer name suffix"),
            "FILER_CITY": Col("string", "Filer city"),
            "FILER_ST": Col("string", "Filer state"),
            "FILER_ZIP4": Col("string", "Filer ZIP+4"),
            "FILER_PHON": Col("string", "Filer phone number"),
            "FILER_FAX": Col("string", "Filer fax number"),
            "FILE_EMAIL": Col("string", "Filer email address"),
            "MAIL_CITY": Col("string", "Filer mailing address city"),
            "MAIL_ST": Col("string", "Filer mailing address state"),
            "MAIL_ZIP4": Col("string", "Filer mailing address ZIP+4"),
            "REPORT_NUM": Col("string", "Report number; 000 is the original"),
            "REPORTNAME": Col("string", "Name of the attached report"),
            "RPT_DATE": Col("date_mdy", "Date the report was filed"),
            "FROM_DATE": Col("date_mdy", "Reporting period start date"),
            "THRU_DATE": Col("date_mdy", "Reporting period end date"),
            "ELECT_DATE": Col("date_mdy", "Date of the related election"),
            "RPTFROMDT": Col("date_mdy", "Attached report period start date"),
            "RPTTHRUDT": Col("date_mdy", "Attached report period end date"),
            "RPT_DATE_TS": Col("ts_mdy12", "Filing timestamp of the report"),
            "STMT_TYPE": Col("string", "Statement type code"),
            "AMENDEXP_1": Col("string", "Amendment explanation, line 1"),
            "AMENDEXP_2": Col("string", "Amendment explanation, line 2"),
            "AMENDEXP_3": Col("string", "Amendment explanation, line 3"),
            "CMTTE_TYPE": Col("string", "Committee type code"),
            "CMTTE_ID": Col("string", "Committee ID of the committee filing"),
            "CONTROL_YN": Col("yn", "Controlled-committee flag"),
            "SPONSOR_YN": Col("yn", "Sponsored-committee flag"),
            "PRIMFRM_YN": Col("yn", "Primarily-formed committee flag"),
            "BRDBASE_YN": Col("yn", "Broad-based committee flag"),
            "RPT_ATT_CB": Col("string", "Report-attached checkbox (X)"),
            "LATE_RPTNO": Col("string", "Identifying number of a late report"),
            "CAND_ID": Col("string", "Candidate identification number"),
            "CAND_NAML": Col("string", "Candidate last name"),
            "CAND_NAMF": Col("string", "Candidate first name"),
            "CAND_NAMT": Col("string", "Candidate name title or prefix"),
            "CAND_NAMS": Col("string", "Candidate name suffix"),
            "CAND_ADR1": Col("string", "Candidate street address, line 1"),
            "CAND_ADR2": Col("string", "Candidate street address, line 2"),
            "CAND_CITY": Col("string", "Candidate city"),
            "CAND_ST": Col("string", "Candidate state"),
            "CAND_ZIP4": Col("string", "Candidate ZIP+4"),
            "CAND_PHON": Col("string", "Candidate phone number"),
            "CAND_FAX": Col("string", "Candidate fax number"),
            "CAND_EMAIL": Col("string", "Candidate email address"),
            "OFFICE_CD": Col("string", "Office sought or held, coded"),
            "OFFIC_DSCR": Col("string", "Office sought or held, described"),
            "JURIS_CD": Col("string", "Office jurisdiction code"),
            "JURIS_DSCR": Col("string", "Office jurisdiction description"),
            "DIST_NO": Col("string", "District number of the office"),
            "OFF_S_H_CD": Col("string", "Office sought (S) or held (H) code"),
            "BAL_ID": Col("string", "Ballot measure identification number"),
            "BAL_NAME": Col("string", "Ballot measure name"),
            "BAL_NUM": Col("string", "Ballot measure number or letter"),
            "BAL_JURIS": Col("string", "Ballot measure jurisdiction"),
            "SUP_OPP_CD": Col("string", "Support (S) or opposition (O) code"),
            "TRES_NAML": Col("string", "Treasurer last name"),
            "TRES_NAMF": Col("string", "Treasurer first name"),
            "TRES_NAMT": Col("string", "Treasurer name title or prefix"),
            "TRES_NAMS": Col("string", "Treasurer name suffix"),
            "TRES_ADR1": Col("string", "Treasurer street address, line 1"),
            "TRES_ADR2": Col("string", "Treasurer street address, line 2"),
            "TRES_CITY": Col("string", "Treasurer city"),
            "TRES_ST": Col("string", "Treasurer state"),
            "TRES_ZIP4": Col("string", "Treasurer ZIP+4"),
            "TRES_PHON": Col("string", "Treasurer phone number"),
            "TRES_FAX": Col("string", "Treasurer fax number"),
            "TRES_EMAIL": Col("string", "Treasurer email address"),
            "BUS_NAME": Col("string", "Employer or business name (F461 filers)"),
            "BUS_ADR1": Col("string", "Business street address, line 1"),
            "BUS_ADR2": Col("string", "Business street address, line 2"),
            "BUS_CITY": Col("string", "Business city"),
            "BUS_ST": Col("string", "Business state"),
            "BUS_ZIP4": Col("string", "Business ZIP+4"),
            "BUS_INTER": Col("string", "Business interests description"),
            "BUSACT_CB": Col("string", "Business-activity checkbox (X)"),
            "BUSACTVITY": Col("string", "Description of the business activity"),
            "ASSOC_CB": Col("string", "Association-interests checkbox (X)"),
            "ASSOC_INT": Col("string", "Description of association interests"),
            "EMPLBUS_CB": Col("string", "Employer/business checkbox (X)"),
            "EMPLOYER": Col("string", "Filer's employer (individual filers)"),
            "OCCUPATION": Col("string", "Filer's occupation (individual filers)"),
            "SELFEMP_CB": Col("string", "Self-employed checkbox (X)"),
            "OTHER_CB": Col("string", "Other-interests checkbox (X)"),
            "OTHER_INT": Col("string", "Description of other interests"),
        },
    ),
    "CVR_SO_CD": Table(
        group="campaign",
        unique_key=("FILING_ID", "AMEND_ID"),
        forms=("F400", "F402", "F410"),
        docs="Cover page of statements of organization (committee registration)",
        # Full public column set (reference
        # calaccess_raw/models/campaign.py §CvrSoCd): filer identity,
        # committee classification checkboxes (F410 part 3), bank,
        # treasurer, mailing and §82013 blocks.
        columns={
            **_filing_cols(line_item=False),
            "FILER_ID": Col("string", "Filer identification number"),
            "ENTITY_CD": Col("string", "Filer entity type code"),
            "FILER_NAML": Col("string", "Committee name or filer last name"),
            "FILER_NAMF": Col("string", "Filer first name"),
            "FILER_NAMT": Col("string", "Filer name title or prefix"),
            "FILER_NAMS": Col("string", "Filer name suffix"),
            "CITY": Col("string", "Committee street address city"),
            "ST": Col("string", "Committee street address state"),
            "ZIP4": Col("string", "Committee street address ZIP+4"),
            "COUNTY_RES": Col("string", "County of residence or domicile"),
            "COUNTY_ACT": Col("string", "County of principal activity"),
            "PHONE": Col("string", "Committee phone number"),
            "CMTE_FAX": Col("string", "Committee fax number"),
            "CMTE_EMAIL": Col("string", "Committee e-mail address"),
            "MAIL_CITY": Col("string", "Mailing address city"),
            "MAIL_ST": Col("string", "Mailing address state"),
            "MAIL_ZIP4": Col("string", "Mailing address ZIP+4"),
            "CMTE_ID": Col("string", "Committee identification number"),
            "QUALFY_DT": Col("date_mdy", "Date the committee qualified"),
            "QUAL_CB": Col("string", "Qualified-committee checkbox (X)"),
            "SMCONT_QUALDT": Col(
                "date_mdy", "Date qualified as a small-contributor committee"
            ),
            "GENPURP_CB": Col("string", "General-purpose committee checkbox (X)"),
            "GPC_DESCR": Col("string", "General-purpose committee description"),
            "PRIMFC_CB": Col(
                "string", "Primarily-formed candidate committee checkbox (X)"
            ),
            "BRDBASE_CB": Col("string", "Broad-based committee checkbox (X)"),
            "SPONSOR_CB": Col("string", "Sponsored committee checkbox (X)"),
            "CONTROL_CB": Col("string", "Controlled committee checkbox (X)"),
            "BANK_NAM": Col("string", "Depository bank name"),
            "BANK_ADR1": Col("string", "Depository bank street address line 1"),
            "BANK_ADR2": Col("string", "Depository bank street address line 2"),
            "BANK_CITY": Col("string", "Depository bank city"),
            "BANK_ST": Col("string", "Depository bank state"),
            "BANK_ZIP4": Col("string", "Depository bank ZIP+4"),
            "BANK_PHON": Col("string", "Depository bank phone number"),
            "ACCT_OPENDT": Col("date_mdy", "Date the bank account was opened"),
            "TRES_NAML": Col("string", "Treasurer last name"),
            "TRES_NAMF": Col("string", "Treasurer first name"),
            "TRES_NAMT": Col("string", "Treasurer name title or prefix"),
            "TRES_NAMS": Col("string", "Treasurer name suffix"),
            "TRES_CITY": Col("string", "Treasurer city"),
            "TRES_ST": Col("string", "Treasurer state"),
            "TRES_ZIP4": Col("string", "Treasurer ZIP+4"),
            "TRES_PHON": Col("string", "Treasurer phone number"),
            "COM82013ID": Col("string", "Committee ID under section 82013"),
            "COM82013NM": Col("string", "Name of the section 82013 committee"),
            "COM82013YN": Col("yn", "Section 82013 committee flag"),
            "REPORT_NUM": Col("string", "Report number (amendments)"),
            "RPT_DATE": Col("date_mdy", "Date the statement was filed"),
            "EFFECT_DT": Col("date_mdy", "Effective date of the statement"),
            "TERM_DATE": Col("date_mdy", "Date the committee terminated"),
            "SURPLUSDSP": Col("string", "Disposition of surplus funds"),
            "ACTIVITY_LVL": Col("string", "Level of activity code"),
        },
    ),
    "LOAN_CD": Table(
        group="campaign",
        unique_key=("FILING_ID", "AMEND_ID", "LINE_ITEM", "REC_TYPE", "FORM_TYPE"),
        forms=("F460",),
        docs="Itemized campaign loans received and made (Schedule B)",
        # Full public column set (reference
        # calaccess_raw/models/campaign.py §LoanCd — 49 fields).
        columns={
            **_filing_cols(),
            "TRAN_ID": Col("string", "Permanent transaction ID"),
            "LOAN_TYPE": Col("string", "Loan transaction type code"),
            "ENTITY_CD": Col("string", "Lender entity type code"),
            "LNDR_NAML": Col("string", "Lender last name or business name"),
            "LNDR_NAMF": Col("string", "Lender first name"),
            "LNDR_NAMT": Col("string", "Lender name title or prefix"),
            "LNDR_NAMS": Col("string", "Lender name suffix"),
            "LOAN_CITY": Col("string", "Lender city"),
            "LOAN_ST": Col("string", "Lender state"),
            "LOAN_ZIP4": Col("string", "Lender ZIP+4"),
            "LOAN_EMP": Col("string", "Lender employer"),
            "LOAN_OCC": Col("string", "Lender occupation"),
            "LOAN_SELF": Col("yn", "Lender self-employed checkbox"),
            "LOAN_DATE1": Col("date_mdy", "Date the loan was received or made"),
            "LOAN_DATE2": Col("date_mdy", "Date the loan is due or was repaid"),
            "LOAN_AMT1": Col("decimal(14,2)", "Amount of loan this period"),
            "LOAN_AMT2": Col("decimal(14,2)", "Outstanding balance"),
            "LOAN_AMT3": Col("decimal(14,2)", "Cumulative amount to date"),
            "LOAN_AMT4": Col("decimal(14,2)", "Outstanding balance beginning period"),
            "LOAN_AMT5": Col("decimal(14,2)", "Amount paid this period"),
            "LOAN_AMT6": Col("decimal(14,2)", "Amount forgiven this period"),
            "LOAN_AMT7": Col("decimal(14,2)", "Amount of interest paid this period"),
            "LOAN_AMT8": Col("decimal(14,2)", "Original amount of the loan"),
            "LOAN_RATE": Col("string", "Interest rate of the loan"),
            "CMTE_ID": Col("string", "Committee ID of a committee lender"),
            "TRES_NAML": Col("string", "Treasurer last name"),
            "TRES_NAMF": Col("string", "Treasurer first name"),
            "TRES_NAMT": Col("string", "Treasurer name title or prefix"),
            "TRES_NAMS": Col("string", "Treasurer name suffix"),
            "TRES_CITY": Col("string", "Treasurer city"),
            "TRES_ST": Col("string", "Treasurer state"),
            "TRES_ZIP4": Col("string", "Treasurer ZIP+4"),
            "INTR_NAML": Col("string", "Guarantor/intermediary last name"),
            "INTR_NAMF": Col("string", "Guarantor/intermediary first name"),
            "INTR_NAMT": Col("string", "Guarantor/intermediary name title"),
            "INTR_NAMS": Col("string", "Guarantor/intermediary name suffix"),
            "INTR_CITY": Col("string", "Guarantor/intermediary city"),
            "INTR_ST": Col("string", "Guarantor/intermediary state"),
            "INTR_ZIP4": Col("string", "Guarantor/intermediary ZIP+4"),
            "MEMO_CODE": Col("yn", "Memo amount flag (not totaled)"),
            "MEMO_REFNO": Col("string", "Reference to accompanying text memo"),
            "BAKREF_TID": Col("string", "Back-reference to a parent transaction"),
            "XREF_SCHNM": Col("string", "Related schedule for the cross-reference"),
            "XREF_MATCH": Col("string", "Related-item cross-reference checkbox (X)"),
        },
    ),
    "DEBT_CD": Table(
        group="campaign",
        unique_key=("FILING_ID", "AMEND_ID", "LINE_ITEM", "REC_TYPE", "FORM_TYPE"),
        forms=("F460",),
        docs="Accrued expenses / unpaid bills (Schedule F debts)",
        # Full public column set (reference
        # calaccess_raw/models/campaign.py §DebtCd — 33 fields).
        columns={
            **_filing_cols(),
            "TRAN_ID": Col("string", "Permanent transaction ID"),
            "ENTITY_CD": Col("string", "Creditor entity type code"),
            "PAYEE_NAML": Col("string", "Creditor last name or business name"),
            "PAYEE_NAMF": Col("string", "Creditor first name"),
            "PAYEE_NAMT": Col("string", "Creditor name title or prefix"),
            "PAYEE_NAMS": Col("string", "Creditor name suffix"),
            "PAYEE_CITY": Col("string", "Creditor city"),
            "PAYEE_ST": Col("string", "Creditor state"),
            "PAYEE_ZIP4": Col("string", "Creditor ZIP+4"),
            "BEG_BAL": Col("decimal(14,2)", "Outstanding balance at period start"),
            "AMT_INCUR": Col("decimal(14,2)", "Amount incurred this period"),
            "AMT_PAID": Col("decimal(14,2)", "Amount paid this period"),
            "END_BAL": Col("decimal(14,2)", "Outstanding balance at period end"),
            "EXPN_CODE": Col("string", "Expense classification code"),
            "EXPN_DSCR": Col("string", "Description of the obligation"),
            "CMTE_ID": Col("string", "Committee ID, if the creditor is a committee"),
            "TRES_NAML": Col("string", "Treasurer last name"),
            "TRES_NAMF": Col("string", "Treasurer first name"),
            "TRES_NAMT": Col("string", "Treasurer name title or prefix"),
            "TRES_NAMS": Col("string", "Treasurer name suffix"),
            "TRES_CITY": Col("string", "Treasurer city"),
            "TRES_ST": Col("string", "Treasurer state"),
            "TRES_ZIP4": Col("string", "Treasurer ZIP+4"),
            "MEMO_CODE": Col("yn", "Memo amount flag (not totaled)"),
            "MEMO_REFNO": Col("string", "Reference to accompanying text memo"),
            "BAKREF_TID": Col("string", "Back-reference to a parent transaction"),
            "XREF_SCHNM": Col("string", "Related schedule for the cross-reference"),
            "XREF_MATCH": Col("string", "Related-item cross-reference checkbox (X)"),
        },
    ),
    "CVR2_CAMPAIGN_DISCLOSURE_CD": Table(
        group="campaign",
        unique_key=("FILING_ID", "AMEND_ID", "LINE_ITEM", "REC_TYPE", "FORM_TYPE"),
        forms=("F460", "F450", "F425", "F465"),
        docs="Cover page continuation lines (additional committee/officer names)",
        # Full public column set (reference
        # calaccess_raw/models/campaign.py §Cvr2CampaignDisclosureCd):
        # listed entity identity/contact, controlled-committee and
        # ballot-measure blocks, treasurer block.
        columns={
            **_filing_cols(),
            "TRAN_ID": Col("string", "Permanent transaction ID"),
            "ENTITY_CD": Col("string", "Entity type of the listed party"),
            "ENTY_NAML": Col("string", "Listed entity last name or business name"),
            "ENTY_NAMF": Col("string", "Listed entity first name"),
            "ENTY_NAMT": Col("string", "Listed entity name title or prefix"),
            "ENTY_NAMS": Col("string", "Listed entity name suffix"),
            "ENTY_CITY": Col("string", "Listed entity city"),
            "ENTY_ST": Col("string", "Listed entity state"),
            "ENTY_ZIP4": Col("string", "Listed entity ZIP+4"),
            "ENTY_PHON": Col("string", "Listed entity phone number"),
            "ENTY_FAX": Col("string", "Listed entity fax number"),
            "ENTY_EMAIL": Col("string", "Listed entity e-mail address"),
            "F460_PART": Col("string", "Part of Form 460 the line relates to"),
            "TITLE": Col("string", "Title of the listed officer"),
            "MAIL_CITY": Col("string", "Mailing address city"),
            "MAIL_ST": Col("string", "Mailing address state"),
            "MAIL_ZIP4": Col("string", "Mailing address ZIP+4"),
            "CMTE_ID": Col("string", "Committee ID, if the entity is a committee"),
            "CONTROL_YN": Col("yn", "Controlled-committee flag"),
            "OFFICE_CD": Col("string", "Office sought or held code"),
            "OFFIC_DSCR": Col("string", "Office sought or held description"),
            "JURIS_CD": Col("string", "Office jurisdiction code"),
            "JURIS_DSCR": Col("string", "Office jurisdiction description"),
            "DIST_NO": Col("string", "Office district number"),
            "OFF_S_H_CD": Col("string", "Office sought/held code (S or H)"),
            "SEEK_OFFICE": Col("string", "Office sought, if checked"),
            "BAL_NAME": Col("string", "Ballot measure name"),
            "BAL_NUM": Col("string", "Ballot measure number or letter"),
            "BAL_JURIS": Col("string", "Ballot measure jurisdiction"),
            "SUP_OPP_CD": Col("string", "Support or opposition code"),
            "TRES_NAML": Col("string", "Treasurer last name"),
            "TRES_NAMF": Col("string", "Treasurer first name"),
            "TRES_NAMT": Col("string", "Treasurer name title or prefix"),
            "TRES_NAMS": Col("string", "Treasurer name suffix"),
            "TRES_CITY": Col("string", "Treasurer city"),
            "TRES_ST": Col("string", "Treasurer state"),
            "TRES_ZIP4": Col("string", "Treasurer ZIP+4"),
        },
    ),
    "CVR2_SO_CD": Table(
        group="campaign",
        unique_key=("FILING_ID", "AMEND_ID", "LINE_ITEM", "REC_TYPE", "FORM_TYPE"),
        forms=("F400", "F410"),
        docs="Statement-of-organization continuation lines",
        # Full public column set (reference
        # calaccess_raw/models/campaign.py §Cvr2SoCd): listed entity
        # identity/contact, office/party/ballot blocks of F410 part 4.
        columns={
            **_filing_cols(),
            "TRAN_ID": Col("string", "Permanent transaction ID"),
            "ENTITY_CD": Col("string", "Entity type of the listed party"),
            "ENTY_NAML": Col("string", "Listed entity last name or business name"),
            "ENTY_NAMF": Col("string", "Listed entity first name"),
            "ENTY_NAMT": Col("string", "Listed entity name title or prefix"),
            "ENTY_NAMS": Col("string", "Listed entity name suffix"),
            "ITEM_CD": Col("string", "Section of the form the line belongs to"),
            "ENTY_CITY": Col("string", "Listed entity city"),
            "ENTY_ST": Col("string", "Listed entity state"),
            "ENTY_ZIP4": Col("string", "Listed entity ZIP+4"),
            "ENTY_PHON": Col("string", "Listed entity phone number"),
            "ENTY_FAX": Col("string", "Listed entity fax number"),
            "ENTY_EMAIL": Col("string", "Listed entity e-mail address"),
            "MAIL_CITY": Col("string", "Mailing address city"),
            "MAIL_ST": Col("string", "Mailing address state"),
            "MAIL_ZIP4": Col("string", "Mailing address ZIP+4"),
            "DAY_PHONE": Col("string", "Daytime phone number"),
            "FAX_PHONE": Col("string", "Fax number"),
            "EMAIL_ADR": Col("string", "E-mail address"),
            "CITY": Col("string", "Street address city"),
            "ST": Col("string", "Street address state"),
            "ZIP4": Col("string", "Street address ZIP+4"),
            "F460_PART": Col("string", "Part of Form 460 the line relates to"),
            "OFFICE_CD": Col("string", "Office sought or held code"),
            "OFFIC_DSCR": Col("string", "Office sought or held description"),
            "JURIS_CD": Col("string", "Office jurisdiction code"),
            "JURIS_DSCR": Col("string", "Office jurisdiction description"),
            "DIST_NO": Col("string", "Office district number"),
            "OFF_S_H_CD": Col("string", "Office sought/held code (S or H)"),
            "SEEK_OFFICE": Col("string", "Office sought, if checked"),
            "NON_PTY_CB": Col("string", "Non-partisan checkbox (X)"),
            "PARTY_CB": Col("string", "Partisan checkbox (X)"),
            "OTH_PTY_CB": Col("string", "Other-party checkbox (X)"),
            "PARTY_CD": Col("string", "Political party code"),
            "PARTY_NAME": Col("string", "Political party name"),
            "EFFECT_DT": Col("date_mdy", "Effective date of the line"),
        },
    ),
    "CVR3_VERIFICATION_INFO_CD": Table(
        group="campaign",
        unique_key=("FILING_ID", "AMEND_ID", "LINE_ITEM", "REC_TYPE", "FORM_TYPE"),
        forms=("F460", "F450", "F401"),
        docs="Verification/signature lines of campaign statements",
        columns={
            **_filing_cols(),
            "TRAN_ID": Col("string", "Permanent transaction ID"),
            "ENTITY_CD": Col("string", "Signer entity type code"),
            "SIG_DATE": Col("date_mdy", "Date the statement was signed"),
            "SIG_LOC": Col("string", "Place the statement was executed"),
            "SIG_NAML": Col("string", "Signer last name"),
            "SIG_NAMF": Col("string", "Signer first name"),
        },
    ),
    "S401_CD": Table(
        group="campaign",
        unique_key=("FILING_ID", "AMEND_ID", "LINE_ITEM", "REC_TYPE", "FORM_TYPE"),
        forms=("F401",),
        docs="Slate mailer payments and contributions (Form 401 schedules)",
        columns={
            **_filing_cols(),
            "TRAN_ID": Col("string", "Permanent transaction ID"),
            "AGENT_NAML": Col("string", "Agent or independent contractor name"),
            "AGENT_NAMF": Col("string", "Agent first name"),
            "AGENT_NAMT": Col("string", "Agent name title or prefix"),
            "AGENT_NAMS": Col("string", "Agent name suffix"),
            "PAYEE_NAML": Col("string", "Payee last name or business name"),
            "PAYEE_NAMF": Col("string", "Payee first name"),
            "PAYEE_NAMT": Col("string", "Payee name title or prefix"),
            "PAYEE_NAMS": Col("string", "Payee name suffix"),
            "PAYEE_CITY": Col("string", "Payee city"),
            "PAYEE_ST": Col("string", "Payee state"),
            "PAYEE_ZIP4": Col("string", "Payee ZIP+4"),
            "AMOUNT": Col("decimal(14,2)", "Amount paid or received"),
            "AGGREGATE": Col("decimal(14,2)", "Cumulative amount to date"),
            "EXPN_DSCR": Col("string", "Description of the payment"),
            "CAND_NAML": Col("string", "Candidate last name supported/opposed"),
            "CAND_NAMF": Col("string", "Candidate first name"),
            "CAND_NAMT": Col("string", "Candidate name title or prefix"),
            "CAND_NAMS": Col("string", "Candidate name suffix"),
            "OFFICE_CD": Col("string", "Office sought code"),
            "OFFIC_DSCR": Col("string", "Office sought, described"),
            "JURIS_CD": Col("string", "Office jurisdiction code"),
            "JURIS_DSCR": Col("string", "Office jurisdiction description"),
            "DIST_NO": Col("string", "District number of the office"),
            "OFF_S_H_CD": Col("string", "Office sought (S) or held (H) code"),
            "BAL_NAME": Col("string", "Ballot measure name"),
            "BAL_NUM": Col("string", "Ballot measure number or letter"),
            "BAL_JURIS": Col("string", "Ballot measure jurisdiction"),
            "SUP_OPP_CD": Col("string", "Support or oppose code"),
            "MEMO_CODE": Col("yn", "Memo amount flag (not totaled)"),
            "MEMO_REFNO": Col("string", "Reference to accompanying text memo"),
            "BAKREF_TID": Col("string", "Back-reference to a parent transaction"),
        },
    ),
    "S498_CD": Table(
        group="campaign",
        unique_key=("FILING_ID", "AMEND_ID", "LINE_ITEM", "REC_TYPE", "FORM_TYPE"),
        forms=("F498",),
        docs="Slate mailer late payment reports (Form 498)",
        columns={
            **_filing_cols(),
            "TRAN_ID": Col("string", "Permanent transaction ID"),
            "ENTITY_CD": Col("string", "Payor entity type code"),
            "PAYOR_NAML": Col("string", "Payor last name or business name"),
            "PAYOR_NAMF": Col("string", "Payor first name"),
            "PAYOR_CITY": Col("string", "Payor city"),
            "PAYOR_ST": Col("string", "Payor state"),
            "PAYOR_ZIP4": Col("string", "Payor ZIP+4"),
            "DATE_RCVD": Col("date_mdy", "Date the payment was received"),
            "AMT_RCVD": Col("decimal(14,2)", "Amount received"),
            "CAND_NAML": Col("string", "Candidate last name supported/opposed"),
            "OFFICE_CD": Col("string", "Office sought code"),
            "JURIS_CD": Col("string", "Office jurisdiction code"),
            "SUP_OPP_CD": Col("string", "Support or oppose code"),
            "MEMO_CODE": Col("yn", "Memo amount flag (not totaled)"),
            "MEMO_REFNO": Col("string", "Reference to accompanying text memo"),
        },
    ),
    "SPLT_CD": Table(
        group="campaign",
        unique_key=("FILING_ID", "AMEND_ID", "LINE_ITEM", "REC_TYPE"),
        forms=("F460",),
        docs="Split transaction allocations across elections/periods",
        columns={
            "FILING_ID": Col("long", "Unique filing identification number"),
            "AMEND_ID": Col("int", "Amendment number; 0 is the original filing"),
            "LINE_ITEM": Col("int", "Line item number of this record"),
            "REC_TYPE": Col("string", "Record type of the transaction"),
            "PFORM_TYPE": Col("string", "Parent schedule of the split line"),
            "PTRAN_ID": Col("string", "Parent transaction ID being split"),
            "ELEC_DATE": Col("date_mdy", "Election the allocation applies to"),
            "ELEC_AMOUNT": Col("decimal(14,2)", "Amount allocated to the election"),
        },
    ),
    "F495P2_CD": Table(
        group="campaign",
        unique_key=("FILING_ID", "AMEND_ID", "LINE_ITEM", "REC_TYPE", "FORM_TYPE"),
        forms=("F495",),
        docs="Supplemental pre-election statement period totals (Form 495)",
        columns={
            **_filing_cols(),
            "ELECT_DATE": Col("date_mdy", "Date of the related election"),
            "ELECTJUR": Col("string", "Jurisdiction of the election"),
            "CONTRIBAMT": Col("decimal(14,2)", "Contributions in the supplemental period"),
        },
    ),
    "S496_CD": Table(
        group="campaign",
        unique_key=("FILING_ID", "AMEND_ID", "LINE_ITEM", "REC_TYPE", "FORM_TYPE"),
        forms=("F496",),
        docs="Late independent expenditure reports (Form 496)",
        columns={
            **_filing_cols(),
            "TRAN_ID": Col("string", "Permanent transaction ID"),
            "AMOUNT": Col("decimal(14,2)", "Amount of the late expenditure"),
            "EXP_DATE": Col("date_mdy", "Date of the expenditure"),
            "DATE_THRU": Col("date_mdy", "End of period the amount covers"),
            "EXPN_DSCR": Col("string", "Description of the expenditure"),
            "MEMO_CODE": Col("yn", "Memo amount flag (not totaled)"),
            "MEMO_REFNO": Col("string", "Reference to accompanying text memo"),
        },
    ),
    "S497_CD": Table(
        group="campaign",
        unique_key=("FILING_ID", "AMEND_ID", "LINE_ITEM", "REC_TYPE", "FORM_TYPE"),
        forms=("F497",),
        docs="Late contribution reports (Form 497, 24-hour reports)",
        # Full public column set (reference
        # calaccess_raw/models/campaign.py §S497Cd).
        columns={
            **_filing_cols(),
            "TRAN_ID": Col("string", "Permanent transaction ID"),
            "ENTITY_CD": Col("string", "Contributor or recipient entity type"),
            "ENTY_NAML": Col("string", "Entity last name or business name"),
            "ENTY_NAMF": Col("string", "Entity first name"),
            "ENTY_NAMT": Col("string", "Entity name title or prefix"),
            "ENTY_NAMS": Col("string", "Entity name suffix"),
            "ENTY_CITY": Col("string", "Entity city"),
            "ENTY_ST": Col("string", "Entity state"),
            "ENTY_ZIP4": Col("string", "Entity ZIP+4"),
            "CTRIB_EMP": Col("string", "Contributor employer"),
            "CTRIB_OCC": Col("string", "Contributor occupation"),
            "CTRIB_SELF": Col("yn", "Contributor self-employed checkbox"),
            "ELEC_DATE": Col("date_mdy", "Date of the related election"),
            "CTRIB_DATE": Col("date_mdy", "Date the contribution was made"),
            "DATE_THRU": Col("date_mdy", "End of period the amount covers"),
            "AMOUNT": Col("decimal(14,2)", "Amount of the late contribution"),
            "CMTE_ID": Col("string", "Committee ID of the recipient"),
            "CAND_ID": Col("string", "Candidate ID, if candidate-linked"),
            "CAND_NAML": Col("string", "Candidate last name, if candidate-linked"),
            "CAND_NAMF": Col("string", "Candidate first name"),
            "CAND_NAMT": Col("string", "Candidate name title or prefix"),
            "CAND_NAMS": Col("string", "Candidate name suffix"),
            "OFFICE_CD": Col("string", "Office sought code"),
            "OFFIC_DSCR": Col("string", "Office sought, described"),
            "JURIS_CD": Col("string", "Office jurisdiction code"),
            "JURIS_DSCR": Col("string", "Office jurisdiction description"),
            "DIST_NO": Col("string", "District number of the office"),
            "OFF_S_H_CD": Col("string", "Office sought (S) or held (H) code"),
            "BAL_ID": Col("string", "Ballot measure ID"),
            "BAL_NAME": Col("string", "Ballot measure name"),
            "BAL_NUM": Col("string", "Ballot measure number or letter"),
            "BAL_JURIS": Col("string", "Ballot measure jurisdiction"),
            "SUP_OPP_CD": Col("string", "Support (S) or opposition (O) code"),
            "MEMO_CODE": Col("yn", "Memo amount flag (not totaled)"),
            "MEMO_REFNO": Col("string", "Reference to accompanying text memo"),
        },
    ),
    # ------------------------------------------------ lobbying.py
    "CVR_REGISTRATION_CD": Table(
        group="lobbying",
        unique_key=("FILING_ID", "AMEND_ID"),
        forms=("F601", "F602", "F603", "F604", "F606", "F607"),
        docs="Cover page of lobbying registration statements",
        columns={
            **_filing_cols(line_item=False),
            "SENDER_ID": Col("string", "Filer ID of the submitting party"),
            "FILER_ID": Col("string", "Filer identification number"),
            "ENTITY_CD": Col("string", "Registrant entity type code"),
            "FILER_NAML": Col("string", "Registrant last name or firm name"),
            "FILER_NAMF": Col("string", "Registrant first name"),
            "FILER_NAMT": Col("string", "Registrant name title or prefix"),
            "FILER_NAMS": Col("string", "Registrant name suffix"),
            "REPORT_NUM": Col("string", "Report number (amendments count up)"),
            "BUS_ADR1": Col("string", "Business address line 1"),
            "BUS_ADR2": Col("string", "Business address line 2"),
            "BUS_CITY": Col("string", "Business address city"),
            "BUS_ST": Col("string", "Business address state"),
            "BUS_ZIP4": Col("string", "Business address ZIP+4"),
            "BUS_PHON": Col("string", "Business phone number"),
            "BUS_FAX": Col("string", "Business fax number"),
            "MAIL_ADR1": Col("string", "Mailing address line 1"),
            "MAIL_ADR2": Col("string", "Mailing address line 2"),
            "MAIL_CITY": Col("string", "Mailing address city"),
            "MAIL_ST": Col("string", "Mailing address state"),
            "MAIL_ZIP4": Col("string", "Mailing address ZIP+4"),
            "MAIL_PHON": Col("string", "Mailing address phone number"),
            "FIRM_NAME": Col("string", "Lobbying firm or employer name"),
            "BUS_CB": Col("string", "Business-entity classification checkbox"),
            "BUS_CLASS": Col("string", "Business classification code"),
            "BUS_DESCR": Col("string", "Business description, when class is other"),
            "IND_CB": Col("string", "Industry classification checkbox"),
            "IND_CLASS": Col("string", "Industry classification code"),
            "IND_DESCR": Col("string", "Industry description, when class is other"),
            "TRADE_CB": Col("string", "Trade association checkbox"),
            "OTH_CB": Col("string", "Other classification checkbox"),
            "C_LESS50": Col("string", "Fewer-than-50-members checkbox"),
            "C_MORE50": Col("string", "Fifty-or-more-members checkbox"),
            "INFLUEN_YN": Col("yn", "Will attempt to influence legislation flag"),
            "ST_LEG_YN": Col("yn", "Will lobby the state legislature flag"),
            "ST_AGENCY": Col("string", "State agencies to be lobbied"),
            "LOBBY_INT": Col("string", "Description of lobbying interests"),
            "L_FIRM_CB": Col("string", "Lobbying firm checkbox"),
            "LBY_604_CB": Col("string", "Form 604 in-house lobbyist checkbox"),
            "LBY_REG_CB": Col("string", "Registered lobbyist checkbox"),
            "NEWCERT_CB": Col("string", "New certification checkbox"),
            "AUTH_NAME": Col("string", "Authorizing firm or employer name"),
            "AUTH_ADR1": Col("string", "Authorizing party address line 1"),
            "AUTH_ADR2": Col("string", "Authorizing party address line 2"),
            "AUTH_CITY": Col("string", "Authorizing party city"),
            "AUTH_ST": Col("string", "Authorizing party state"),
            "AUTH_ZIP4": Col("string", "Authorizing party ZIP+4"),
            "RPT_DATE": Col("date_mdy", "Date the registration was filed"),
            "EFF_DATE": Col("date_mdy", "Effective date of the registration"),
            "QUAL_DATE": Col("date_mdy", "Date the registrant qualified"),
            "LS_BEG_YR": Col("int", "Legislative session beginning year"),
            "LS_END_YR": Col("int", "Legislative session ending year"),
            "COMPLET_ID": Col("string", "Ethics-course completion ID"),
            "DESCRIP_1": Col("string", "Description of business activity"),
            "DESCRIP_2": Col("string", "Description of business activity, cont."),
            "RENCERT_CB": Col("yn", "Renewal/certification checkbox"),
            "SIG_DATE": Col("date_mdy", "Date the cover page was signed"),
            "SIG_LOC": Col("string", "City/state where signed"),
            "SIG_NAML": Col("string", "Signer last name"),
            "SIG_NAMF": Col("string", "Signer first name"),
            "SIG_NAMT": Col("string", "Signer name title or prefix"),
            "SIG_NAMS": Col("string", "Signer name suffix"),
            "SIG_TITLE": Col("string", "Signer title"),
            "PRN_NAML": Col("string", "Printed signer last name"),
            "PRN_NAMF": Col("string", "Printed signer first name"),
            "PRN_NAMT": Col("string", "Printed signer name title or prefix"),
            "PRN_NAMS": Col("string", "Printed signer name suffix"),
        },
    ),
    "CVR_LOBBY_DISCLOSURE_CD": Table(
        group="lobbying",
        unique_key=("FILING_ID", "AMEND_ID"),
        forms=("F615", "F625", "F635", "F645"),
        docs="Cover page of quarterly lobbying disclosure reports",
        columns={
            **_filing_cols(line_item=False),
            "SENDER_ID": Col("string", "Filer ID of the submitting party"),
            "FILER_ID": Col("string", "Filer identification number"),
            "ENTITY_CD": Col("string", "Filer entity type code"),
            "FILER_NAML": Col("string", "Filer last name or firm name"),
            "FILER_NAMF": Col("string", "Filer first name"),
            "FILER_NAMT": Col("string", "Filer name title or prefix"),
            "FILER_NAMS": Col("string", "Filer name suffix"),
            "REPORT_NUM": Col("string", "Report number (amendments count up)"),
            "FROM_DATE": Col("date_mdy", "Reporting period start date"),
            "THRU_DATE": Col("date_mdy", "Reporting period end date"),
            "RPT_DATE": Col("date_mdy", "Date the report was filed"),
            "CUM_BEG_DT": Col("date_mdy", "Cumulative-period beginning date"),
            "FIRM_ID": Col("string", "Firm ID, when filed for a firm"),
            "FIRM_NAME": Col("string", "Firm name"),
            "FIRM_ADR1": Col("string", "Firm address line 1"),
            "FIRM_ADR2": Col("string", "Firm address line 2"),
            "FIRM_CITY": Col("string", "Firm address city"),
            "FIRM_ST": Col("string", "Firm address state"),
            "FIRM_ZIP4": Col("string", "Firm address ZIP+4"),
            "FIRM_PHON": Col("string", "Firm phone number"),
            "MAIL_ADR1": Col("string", "Mailing address line 1"),
            "MAIL_ADR2": Col("string", "Mailing address line 2"),
            "MAIL_CITY": Col("string", "Mailing address city"),
            "MAIL_ST": Col("string", "Mailing address state"),
            "MAIL_ZIP4": Col("string", "Mailing address ZIP+4"),
            "MAIL_PHON": Col("string", "Mailing address phone number"),
            "RCPCMTE_ID": Col("string", "Recipient committee ID"),
            "RCPCMTE_NM": Col("string", "Recipient committee name"),
            "LOBBY_Y_CB": Col("string", "Lobbying activity yes checkbox"),
            "LOBBY_N_CB": Col("string", "Lobbying activity no checkbox"),
            "CTRIB_Y_CB": Col("string", "Campaign contributions yes checkbox"),
            "CTRIB_N_CB": Col("string", "Campaign contributions no checkbox"),
            "PART1_1_CB": Col("string", "Part I section 1 checkbox"),
            "PART1_2_CB": Col("string", "Part I section 2 checkbox"),
            "NOPART1_CB": Col("string", "No Part I activity checkbox"),
            "NOPART2_CB": Col("string", "No Part II activity checkbox"),
            "RPT_ATT_CB": Col("string", "Report-attached checkbox"),
            "MAJOR_NAML": Col("string", "Major donor last name, if applicable"),
            "MAJOR_NAMF": Col("string", "Major donor first name"),
            "MAJOR_NAMT": Col("string", "Major donor name title or prefix"),
            "MAJOR_NAMS": Col("string", "Major donor name suffix"),
            "LBY_ACTVTY": Col("string", "Description of lobbying activity"),
            "SIG_DATE": Col("date_mdy", "Date the cover page was signed"),
            "SIG_LOC": Col("string", "City/state where signed"),
            "SIG_NAML": Col("string", "Signer last name"),
            "SIG_NAMF": Col("string", "Signer first name"),
            "SIG_NAMT": Col("string", "Signer name title or prefix"),
            "SIG_NAMS": Col("string", "Signer name suffix"),
            "SIG_TITLE": Col("string", "Signer title"),
            "PRN_NAML": Col("string", "Printed signer last name"),
            "PRN_NAMF": Col("string", "Printed signer first name"),
            "PRN_NAMT": Col("string", "Printed signer name title or prefix"),
            "PRN_NAMS": Col("string", "Printed signer name suffix"),
        },
    ),
    "LEXP_CD": Table(
        group="lobbying",
        unique_key=("FILING_ID", "AMEND_ID", "LINE_ITEM", "REC_TYPE", "FORM_TYPE"),
        forms=("F615", "F625", "F635", "F645"),
        docs="Itemized lobbying activity expenses",
        # Full public column set (reference
        # calaccess_raw/models/lobbying.py §LexpCd).
        columns={
            **_filing_cols(),
            "TRAN_ID": Col("string", "Permanent transaction ID"),
            "ENTITY_CD": Col("string", "Payee entity type code"),
            "PAYEE_NAML": Col("string", "Payee last name or business name"),
            "PAYEE_NAMF": Col("string", "Payee first name"),
            "PAYEE_NAMT": Col("string", "Payee name title or prefix"),
            "PAYEE_NAMS": Col("string", "Payee name suffix"),
            "PAYEE_CITY": Col("string", "Payee city"),
            "PAYEE_ST": Col("string", "Payee state"),
            "PAYEE_ZIP4": Col("string", "Payee ZIP+4"),
            "EXPN_DATE": Col("date_mdy", "Date of the expense"),
            "AMOUNT": Col("decimal(14,2)", "Amount of the expense"),
            "EXPN_DSCR": Col("string", "Description of the expense"),
            "BENE_NAME": Col("string", "Name of the beneficiary official"),
            "BENE_POSIT": Col("string", "Position of the beneficiary official"),
            "BENE_AMT": Col("string", "Amount benefiting the official"),
            "CREDCARDCO": Col("string", "Credit card company, if paid by card"),
            "RECSUBTYPE": Col("string", "Record subtype code"),
            "MEMO_CODE": Col("yn", "Memo amount flag (not totaled)"),
            "MEMO_REFNO": Col("string", "Reference to accompanying text memo"),
            "BAKREF_TID": Col("string", "Back-reference to a parent transaction"),
        },
    ),
    "LCCM_CD": Table(
        group="lobbying",
        unique_key=("FILING_ID", "AMEND_ID", "LINE_ITEM", "REC_TYPE", "FORM_TYPE"),
        forms=("F615", "F625", "F635", "F645"),
        docs="Campaign contributions reported on lobbying disclosures",
        # Full public column set (reference
        # calaccess_raw/models/lobbying.py §LccmCd).
        columns={
            **_filing_cols(),
            "TRAN_ID": Col("string", "Permanent transaction ID"),
            "ENTITY_CD": Col("string", "Contributor entity type code"),
            "ACCTNAME": Col("string", "Account name the contribution was made from"),
            "CTRIB_NAML": Col("string", "Contributor last name or business name"),
            "CTRIB_NAMF": Col("string", "Contributor first name"),
            "CTRIB_NAMT": Col("string", "Contributor name title or prefix"),
            "CTRIB_NAMS": Col("string", "Contributor name suffix"),
            "CTRIB_CITY": Col("string", "Contributor city"),
            "CTRIB_ST": Col("string", "Contributor state"),
            "CTRIB_ZIP4": Col("string", "Contributor ZIP+4"),
            "CTRIB_DATE": Col("date_mdy", "Date the contribution was made"),
            "AMOUNT": Col("decimal(14,2)", "Amount of the contribution"),
            "RECIP_NAML": Col("string", "Recipient last name or committee name"),
            "RECIP_NAMF": Col("string", "Recipient first name"),
            "RECIP_NAMT": Col("string", "Recipient name title or prefix"),
            "RECIP_NAMS": Col("string", "Recipient name suffix"),
            "RECIP_CITY": Col("string", "Recipient city"),
            "RECIP_ST": Col("string", "Recipient state"),
            "RECIP_ZIP4": Col("string", "Recipient ZIP+4"),
            "RECIP_ID": Col("string", "Recipient filer ID"),
            "CMTE_ID": Col("string", "Committee ID of the recipient"),
            "MEMO_CODE": Col("yn", "Memo amount flag (not totaled)"),
            "MEMO_REFNO": Col("string", "Reference to accompanying text memo"),
            "BAKREF_TID": Col("string", "Back-reference to a parent transaction"),
        },
    ),
    "LPAY_CD": Table(
        group="lobbying",
        unique_key=("FILING_ID", "AMEND_ID", "LINE_ITEM", "REC_TYPE", "FORM_TYPE"),
        forms=("F625", "F635"),
        docs="Payments made to lobbying firms / received from employers",
        # Full public column set (reference
        # calaccess_raw/models/lobbying.py §LpayCd).
        columns={
            **_filing_cols(),
            "TRAN_ID": Col("string", "Permanent transaction ID"),
            "ENTITY_CD": Col("string", "Employer entity type code"),
            "EMPLR_NAML": Col("string", "Employer last name or business name"),
            "EMPLR_NAMF": Col("string", "Employer first name"),
            "EMPLR_NAMT": Col("string", "Employer name title or prefix"),
            "EMPLR_NAMS": Col("string", "Employer name suffix"),
            "EMPLR_CITY": Col("string", "Employer city"),
            "EMPLR_ST": Col("string", "Employer state"),
            "EMPLR_ZIP4": Col("string", "Employer ZIP+4"),
            "EMPLR_ID": Col("string", "Employer filer ID"),
            "EMPLR_PHON": Col("string", "Employer phone number"),
            "LBY_ACTVTY": Col("string", "Description of lobbying activity"),
            "FEES_AMT": Col("decimal(14,2)", "Fees and retainers this period"),
            "REIMB_AMT": Col("decimal(14,2)", "Reimbursed expenses this period"),
            "ADVAN_AMT": Col("decimal(14,2)", "Advances and other payments"),
            "PER_TOTAL": Col("decimal(14,2)", "Total payments this period"),
            "CUM_TOTAL": Col("decimal(14,2)", "Cumulative total to date"),
            "ADVAN_DSCR": Col("string", "Description of advances"),
            "MEMO_CODE": Col("yn", "Memo amount flag (not totaled)"),
            "MEMO_REFNO": Col("string", "Reference to accompanying text memo"),
            "BAKREF_TID": Col("string", "Back-reference to a parent transaction"),
        },
    ),
    "LEMP_CD": Table(
        group="lobbying",
        unique_key=("FILING_ID", "AMEND_ID", "LINE_ITEM", "REC_TYPE", "FORM_TYPE"),
        forms=("F601", "F603"),
        docs="Lobbyist employers and clients listed on registrations",
        columns={
            **_filing_cols(),
            "CLI_NAML": Col("string", "Client last name or business name"),
            "CLI_NAMF": Col("string", "Client first name"),
            "CLI_NAMT": Col("string", "Client name title or prefix"),
            "CLI_NAMS": Col("string", "Client name suffix"),
            "CLI_CITY": Col("string", "Client city"),
            "CLI_ST": Col("string", "Client state"),
            "CLI_ZIP4": Col("string", "Client ZIP+4"),
            "CLI_PHON": Col("string", "Client phone number"),
            "EFF_DATE": Col("date_mdy", "Effective date of the engagement"),
            "CON_PERIOD": Col("string", "Contract period description"),
            "DESCRIP": Col("string", "Description of lobbying interests"),
        },
    ),
    "CVR2_REGISTRATION_CD": Table(
        group="lobbying",
        unique_key=("FILING_ID", "AMEND_ID", "LINE_ITEM", "REC_TYPE", "FORM_TYPE"),
        forms=("F601", "F602", "F603"),
        docs="Lobbying registration continuation lines (listed lobbyists/agencies)",
        columns={
            **_filing_cols(),
            "TRAN_ID": Col("string", "Permanent transaction ID"),
            "ENTITY_CD": Col("string", "Entity type of the listed party"),
            "ENTY_NAML": Col("string", "Listed entity last name or firm name"),
            "ENTY_NAMF": Col("string", "Listed entity first name"),
            "ENTY_TITLE": Col("string", "Title of the listed party"),
        },
    ),
    "CVR2_LOBBY_DISCLOSURE_CD": Table(
        group="lobbying",
        unique_key=("FILING_ID", "AMEND_ID", "LINE_ITEM", "REC_TYPE", "FORM_TYPE"),
        forms=("F615", "F625", "F635", "F645"),
        docs="Lobbying disclosure continuation lines",
        columns={
            **_filing_cols(),
            "TRAN_ID": Col("string", "Permanent transaction ID"),
            "ENTITY_CD": Col("string", "Entity type of the listed party"),
            "ENTY_NAML": Col("string", "Listed entity last name or firm name"),
            "ENTY_NAMF": Col("string", "Listed entity first name"),
            "ENTY_TITLE": Col("string", "Title of the listed party"),
        },
    ),
    "LATT_CD": Table(
        group="lobbying",
        unique_key=("FILING_ID", "AMEND_ID", "LINE_ITEM", "REC_TYPE", "FORM_TYPE"),
        forms=("F630", "F635C", "F640"),
        docs="Payment attachments to lobbying disclosures ($5000+ itemization)",
        columns={
            **_filing_cols(),
            "TRAN_ID": Col("string", "Permanent transaction ID"),
            "ENTITY_CD": Col("string", "Recipient entity type code"),
            "RECIP_NAML": Col("string", "Recipient last name or business name"),
            "RECIP_NAMF": Col("string", "Recipient first name"),
            "RECIP_CITY": Col("string", "Recipient city"),
            "RECIP_ST": Col("string", "Recipient state"),
            "RECIP_ZIP4": Col("string", "Recipient ZIP+4"),
            "PMT_DATE": Col("date_mdy", "Date of the payment"),
            "AMOUNT": Col("decimal(14,2)", "Amount of the payment"),
            "CUM_AMT": Col("decimal(14,2)", "Cumulative amount to date"),
            "MEMO_CODE": Col("yn", "Memo amount flag (not totaled)"),
            "MEMO_REFNO": Col("string", "Reference to accompanying text memo"),
        },
    ),
    "LOTH_CD": Table(
        group="lobbying",
        unique_key=("FILING_ID", "AMEND_ID", "LINE_ITEM", "REC_TYPE", "FORM_TYPE"),
        forms=("F625", "F635"),
        docs="Payments made to other lobbying firms",
        # Full public column set (reference
        # calaccess_raw/models/lobbying.py §LothCd).
        columns={
            **_filing_cols(),
            "TRAN_ID": Col("string", "Permanent transaction ID"),
            "FIRM_NAME": Col("string", "Name of the receiving lobbying firm"),
            "FIRM_CITY": Col("string", "Firm city"),
            "FIRM_ST": Col("string", "Firm state"),
            "FIRM_ZIP4": Col("string", "Firm ZIP+4"),
            "FIRM_PHON": Col("string", "Firm phone number"),
            "PMT_DATE": Col("date_mdy", "Date of the payment"),
            "AMOUNT": Col("decimal(14,2)", "Amount of the payment"),
            "CUM_AMT": Col("decimal(14,2)", "Cumulative amount to date"),
            "SUBJ_NAML": Col("string", "Client on whose behalf payment was made"),
            "SUBJ_NAMF": Col("string", "Client first name"),
            "SUBJ_NAMT": Col("string", "Client name title or prefix"),
            "SUBJ_NAMS": Col("string", "Client name suffix"),
            "MEMO_CODE": Col("yn", "Memo amount flag (not totaled)"),
            "MEMO_REFNO": Col("string", "Reference to accompanying text memo"),
            "BAKREF_TID": Col("string", "Back-reference to a parent transaction"),
        },
    ),
    "LOBBY_AMENDMENTS_CD": Table(
        group="lobbying",
        unique_key=("FILING_ID", "AMEND_ID", "REC_TYPE", "FORM_TYPE"),
        forms=("F605",),
        docs="Amendments to lobbying registrations (what changed)",
        # Full public column set (reference
        # calaccess_raw/models/lobbying.py §LobbyAmendmentsCd): one
        # add/delete block (checkbox, effective date, name quartet)
        # per amendable party class — lobbyists (L), employers (LE),
        # firms (LF).
        columns={
            **_filing_cols(line_item=False),
            "EXEC_DATE": Col("date_mdy", "Date the amendment was executed"),
            "FROM_DATE": Col("date_mdy", "Amended period start date"),
            "THRU_DATE": Col("date_mdy", "Amended period end date"),
            "ADD_L_CB": Col("string", "Lobbyists-added checkbox (X)"),
            "ADD_L_EFF": Col("date_mdy", "Lobbyist-addition effective date"),
            "A_L_NAML": Col("string", "Added lobbyist last name"),
            "A_L_NAMF": Col("string", "Added lobbyist first name"),
            "A_L_NAMT": Col("string", "Added lobbyist name title or prefix"),
            "A_L_NAMS": Col("string", "Added lobbyist name suffix"),
            "DEL_L_CB": Col("string", "Lobbyists-deleted checkbox (X)"),
            "DEL_L_EFF": Col("date_mdy", "Lobbyist-deletion effective date"),
            "D_L_NAML": Col("string", "Deleted lobbyist last name"),
            "D_L_NAMF": Col("string", "Deleted lobbyist first name"),
            "D_L_NAMT": Col("string", "Deleted lobbyist name title or prefix"),
            "D_L_NAMS": Col("string", "Deleted lobbyist name suffix"),
            "ADD_LE_CB": Col("string", "Employers-added checkbox (X)"),
            "ADD_LE_EFF": Col("date_mdy", "Employer-addition effective date"),
            "A_LE_NAML": Col("string", "Added employer last name or business name"),
            "A_LE_NAMF": Col("string", "Added employer first name"),
            "A_LE_NAMT": Col("string", "Added employer name title or prefix"),
            "A_LE_NAMS": Col("string", "Added employer name suffix"),
            "DEL_LE_CB": Col("string", "Employers-deleted checkbox (X)"),
            "DEL_LE_EFF": Col("date_mdy", "Employer-deletion effective date"),
            "D_LE_NAML": Col("string", "Deleted employer last name or business name"),
            "D_LE_NAMF": Col("string", "Deleted employer first name"),
            "D_LE_NAMT": Col("string", "Deleted employer name title or prefix"),
            "D_LE_NAMS": Col("string", "Deleted employer name suffix"),
            "ADD_LF_CB": Col("string", "Firms-added checkbox (X)"),
            "ADD_LF_EFF": Col("date_mdy", "Firm-addition effective date"),
            "A_LF_NAME": Col("string", "Added firm business name"),
            "DEL_LF_CB": Col("string", "Firms-deleted checkbox (X)"),
            "DEL_LF_EFF": Col("date_mdy", "Firm-deletion effective date"),
            "D_LF_NAME": Col("string", "Deleted firm business name"),
            "OTHER_DESC": Col("string", "Description of other changes"),
        },
    ),
    "F690P2_CD": Table(
        group="lobbying",
        unique_key=("FILING_ID", "AMEND_ID", "LINE_ITEM", "REC_TYPE", "FORM_TYPE"),
        forms=("F690",),
        docs="Amendments to lobbying disclosure reports (Form 690 page 2)",
        columns={
            **_filing_cols(),
            "EXEC_DATE": Col("date_mdy", "Date the amendment was executed"),
            "FROM_DATE": Col("date_mdy", "Amended period start date"),
            "THRU_DATE": Col("date_mdy", "Amended period end date"),
            "CHG_PARTS": Col("string", "Which parts of the report changed"),
            "AMEND_TXT1": Col("string", "Amendment explanation text"),
        },
    ),
    # -------------------------------------------------- common.py
    "FILER_FILINGS_CD": Table(
        group="common",
        unique_key=None,  # CAL-ACCESS publishes duplicate rows here
        forms=(),
        docs="Link table connecting filers to their filings",
        # Full public column set (reference
        # calaccess_raw/models/common.py §FilerFilingsCd).
        columns={
            "FILER_ID": Col("long", "Filer identification number"),
            "FILING_ID": Col("long", "Unique filing identification number"),
            "PERIOD_ID": Col("int", "Identifies the period the filing covers"),
            "FORM_ID": Col("string", "Form type of the filing"),
            "FILING_SEQUENCE": Col("int", "Amendment sequence; 0 is original"),
            "FILING_DATE": Col("date_mdy", "Date the filing was received"),
            "STMNT_TYPE": Col("int", "Statement type code"),
            "STMNT_STATUS": Col("int", "Statement status code"),
            "SESSION_ID": Col("int", "Legislative session the filing covers"),
            "USER_ID": Col("string", "User ID that keyed the filing"),
            "SPECIAL_AUDIT": Col("int", "Special audit status code"),
            "FINE_AUDIT": Col("int", "Fine audit status code"),
            "RPT_START": Col("date_mdy", "Reporting period start date"),
            "RPT_END": Col("date_mdy", "Reporting period end date"),
            "RPT_DATE": Col("date_mdy", "Date the report was filed"),
            "FILING_TYPE": Col("int", "Filing type code"),
        },
    ),
    "FILINGS_CD": Table(
        group="common",
        unique_key=("FILING_ID",),
        forms=(),
        docs="Master list of all filings by ID",
        columns={
            "FILING_ID": Col("long", "Unique filing identification number"),
            "FILING_TYPE": Col("int", "Filing type code"),
        },
    ),
    "SMRY_CD": Table(
        group="common",
        unique_key=("FILING_ID", "AMEND_ID", "LINE_ITEM", "REC_TYPE", "FORM_TYPE"),
        forms=("F460", "F450", "F401", "F625", "F635"),
        docs="Summary totals reported on filing cover schedules",
        columns={
            "FILING_ID": Col("long", "Unique filing identification number"),
            "AMEND_ID": Col("int", "Amendment number; 0 is the original filing"),
            # summary lines are form-line labels ("1", "A.1"), not ints
            "LINE_ITEM": Col("string", "Form line the totals belong to"),
            "REC_TYPE": Col("string", "Record type of the summary row"),
            "FORM_TYPE": Col("string", "Schedule or form being summarized"),
            "AMOUNT_A": Col("decimal(14,2)", "Amount for column A of the line"),
            "AMOUNT_B": Col("decimal(14,2)", "Amount for column B of the line"),
            "AMOUNT_C": Col("decimal(14,2)", "Amount for column C of the line"),
            # Full public width: SMRY_CD is a NARROW table — these 12
            # columns are its entire CAL-ACCESS layout (reference
            # calaccess_raw/models/common.py §SmryCd); the election
            # columns below complete it.
            "ELEC_DT": Col("date_mdy", "Date of the election the totals apply to"),
            "ELEC_AMOUNT_A": Col("decimal(14,2)", "Election-cycle amount, column A"),
            "ELEC_AMOUNT_B": Col("decimal(14,2)", "Election-cycle amount, column B"),
            "ELEC_AMOUNT_C": Col("decimal(14,2)", "Election-cycle amount, column C"),
        },
    ),
    "TEXT_MEMO_CD": Table(
        group="common",
        unique_key=("FILING_ID", "AMEND_ID", "LINE_ITEM", "REC_TYPE", "FORM_TYPE"),
        forms=(),
        docs="Free-form text memos attached to filing line items",
        columns={
            **_filing_cols(),
            "REF_NO": Col("string", "Memo reference number line items cite"),
            "TEXT4000": Col("string", "Memo text, up to 4000 characters"),
        },
    ),
    "CVR_E530_CD": Table(
        group="common",
        unique_key=("FILING_ID", "AMEND_ID"),
        forms=("E530",),
        docs="Electronic issue-advocacy report cover pages (E-530)",
        columns={
            **_filing_cols(line_item=False),
            "FILER_ID": Col("string", "Filer identification number"),
            "FILER_NAML": Col("string", "Filer last name or organization name"),
            "FILER_NAMF": Col("string", "Filer first name"),
            "RPT_DATE": Col("date_mdy", "Date the report was filed"),
            "FROM_DATE": Col("date_mdy", "Reporting period start date"),
            "THRU_DATE": Col("date_mdy", "Reporting period end date"),
            "CAND_NAML": Col("string", "Candidate last name the communication concerns"),
            "OFFICE_CD": Col("string", "Office sought code"),
            "DIST_NO": Col("string", "District number of the office"),
            "PMNT_AMOUNT": Col("decimal(14,2)", "Amount of the payment reported"),
        },
    ),
    # --------------------------------------------------- other.py
    "FILERS_CD": Table(
        group="other",
        unique_key=("FILER_ID",),
        forms=(),
        docs="Master filer ID list (one row per filer)",
        columns={
            "FILER_ID": Col("long", "Filer identification number"),
        },
    ),
    "FILER_TYPES_CD": Table(
        group="other",
        unique_key=("FILER_TYPE",),
        forms=(),
        docs="Lookup of filer type codes and descriptions",
        columns={
            "FILER_TYPE": Col("int", "Filer type code"),
            "DESCRIPTION": Col("string", "Description of the filer type"),
            "GRP_TYPE": Col("int", "Group type the filer type belongs to"),
            "CALC_USE": Col("yn", "Whether used in calculations"),
            "GRACE_PERIOD": Col("string", "Filing grace period for the type"),
        },
    ),
    "FILER_TO_FILER_TYPE_CD": Table(
        group="other",
        unique_key=None,
        forms=(),
        docs="Assignment of filer IDs to filer types over sessions",
        columns={
            "FILER_ID": Col("long", "Filer identification number"),
            "FILER_TYPE": Col("int", "Filer type code assigned"),
            "ACTIVE": Col("yn", "Whether the assignment is active"),
            "RACE": Col("long", "Race/contest code, if applicable"),
            "SESSION_ID": Col("int", "Legislative session of the assignment"),
            "CATEGORY": Col("long", "Category code"),
            "CATEGORY_TYPE": Col("long", "Category type code"),
            "SUB_CATEGORY": Col("long", "Sub-category code"),
            "EFFECT_DT": Col("date_mdy", "Date the assignment took effect"),
            "PERIOD_ID": Col("long", "Filing period of the assignment"),
        },
    ),
    "FILER_XREF_CD": Table(
        group="other",
        unique_key=("FILER_ID", "XREF_ID"),
        forms=(),
        docs="Cross-reference between filer IDs and legacy agency IDs",
        columns={
            "FILER_ID": Col("long", "Filer identification number"),
            "XREF_ID": Col("string", "Legacy/agency identifier"),
            "EFFECT_DT": Col("date_mdy", "Date the mapping took effect"),
            "MIGRATION_SOURCE": Col("string", "System the mapping migrated from"),
        },
    ),
    "FILER_STATUS_TYPES_CD": Table(
        group="other",
        unique_key=("STATUS_TYPE",),
        forms=(),
        docs="Lookup of filer status codes",
        columns={
            "STATUS_TYPE": Col("string", "Status code"),
            "STATUS_DESC": Col("string", "Description of the status"),
        },
    ),
    "ACRONYMS_CD": Table(
        group="other",
        unique_key=("ACRONYM",),
        forms=(),
        docs="Lookup of acronyms used across CAL-ACCESS",
        columns={
            "ACRONYM": Col("string", "The acronym"),
            "STANDS_FOR": Col("string", "What the acronym stands for"),
            "EFFECT_DT": Col("date_mdy", "Date the acronym took effect"),
            "A_DESC": Col("string", "Description of the acronym"),
        },
    ),
    "ADDRESS_CD": Table(
        group="other",
        unique_key=("ADRID",),
        forms=(),
        docs="Shared address records referenced by filer tables",
        columns={
            "ADRID": Col("long", "Address record ID"),
            "CITY": Col("string", "City"),
            "ST": Col("string", "State"),
            "ZIP4": Col("string", "ZIP+4"),
            "PHON": Col("string", "Phone number"),
            "FAX": Col("string", "Fax number"),
            "EMAIL": Col("string", "Email address"),
        },
    ),
    "IMAGE_LINKS_CD": Table(
        group="other",
        unique_key=None,
        forms=(),
        docs="Links from filings to scanned document images",
        columns={
            "IMG_LINK_ID": Col("long", "Image link record ID"),
            "IMG_LINK_TYPE": Col("long", "Type of the linked record"),
            "IMG_ID": Col("long", "Image identifier"),
            "IMG_TYPE": Col("long", "Image type code"),
            "IMG_DT": Col("date_mdy", "Date of the image"),
        },
    ),
    "HDR_CD": Table(
        group="common",
        unique_key=("FILING_ID", "AMEND_ID"),
        forms=(),
        docs="Electronic-filing header record (software/version/format)",
        # Full public column set (reference
        # calaccess_raw/models/common.py §HdrCd — 9 fields).
        columns={
            "FILING_ID": Col("long", "Unique filing identification number"),
            "AMEND_ID": Col("int", "Amendment number; 0 is the original filing"),
            "REC_TYPE": Col("string", "Record type (HDR)"),
            "CAL_VER": Col("string", "CAL format version of the filing"),
            "EF_TYPE": Col("string", "Electronic filing type"),
            "STATE_CD": Col("string", "State code of the filing software"),
            "SOFT_NAME": Col("string", "Filing software name"),
            "SOFT_VER": Col("string", "Filing software version"),
            "HDR_COMMENT": Col("string", "Filer comment from the header"),
        },
    ),
    "HEADER_CD": Table(
        group="other",
        unique_key=None,
        forms=(),
        docs="Form header/label layout used to render filings",
        columns={
            "LINE_NUMBER": Col("long", "Line number within the form"),
            "FORM_ID": Col("string", "Form the header belongs to"),
            "REC_TYPE": Col("string", "Record type of the header row"),
            "SECTION_LABEL": Col("string", "Section label text"),
            "COMMENTS1": Col("string", "First comment line"),
            "COMMENTS2": Col("string", "Second comment line"),
            "LABEL": Col("string", "Display label text"),
        },
    ),
    "FILERNAME_CD": Table(
        group="other",
        unique_key=None,
        forms=(),
        docs="Name and address directory of all registered filers",
        columns={
            "XREF_FILER_ID": Col("string", "Agency cross-reference filer ID"),
            "FILER_ID": Col("long", "Filer identification number"),
            "FILER_TYPE": Col("string", "Filer type description"),
            "STATUS": Col("string", "Filer status (active, terminated...)"),
            "EFFECT_DT": Col("date_mdy", "Effective date of this name record"),
            "NAML": Col("string", "Last name or business name"),
            "NAMF": Col("string", "First name"),
            "NAMT": Col("string", "Name title or prefix"),
            "NAMS": Col("string", "Name suffix"),
            "ADR1": Col("string", "Street address line 1"),
            "ADR2": Col("string", "Street address line 2"),
            "CITY": Col("string", "City"),
            "ST": Col("string", "State"),
            "ZIP4": Col("string", "ZIP+4"),
            "PHON": Col("string", "Phone number"),
            "EMAIL": Col("string", "Email address"),
        },
    ),
    "FILER_LINKS_CD": Table(
        group="other",
        unique_key=None,
        forms=(),
        docs="Relationships between filer IDs (e.g. candidate to committee)",
        columns={
            "FILER_ID_A": Col("long", "First filer in the relationship"),
            "FILER_ID_B": Col("long", "Second filer in the relationship"),
            "ACTIVE_FLG": Col("yn", "Whether the link is currently active"),
            "SESSION_ID": Col("int", "Legislative session of the link"),
            "LINK_TYPE": Col("long", "Numeric code for the relationship type"),
            "LINK_DESC": Col("string", "Description of the relationship"),
            "EFFECT_DT": Col("date_mdy", "Date the link took effect"),
            "DOMINATE_FILER": Col("yn", "Whether filer A dominates the pair"),
            "TERMINATION_DT": Col("date_mdy", "Date the link terminated"),
        },
    ),
    "FILING_PERIOD_CD": Table(
        group="other",
        unique_key=("PERIOD_ID",),
        forms=(),
        docs="Lookup of filing period definitions and deadlines",
        columns={
            "PERIOD_ID": Col("int", "Unique period identifier"),
            "START_DATE": Col("date_mdy", "First day of the period"),
            "END_DATE": Col("date_mdy", "Last day of the period"),
            "PERIOD_TYPE": Col("int", "Period type code"),
            "PER_GRP_TYPE": Col("int", "Period group type code"),
            "PERIOD_DESC": Col("string", "Human-readable period description"),
            "DEADLINE": Col("date_mdy", "Filing deadline for the period"),
        },
    ),
    "LEGISLATIVE_SESSIONS_CD": Table(
        group="other",
        unique_key=("SESSION_ID",),
        forms=(),
        docs="Lookup of legislative session date ranges",
        columns={
            "SESSION_ID": Col("int", "Legislative session identifier"),
            "BEGIN_DATE": Col("date_mdy", "Session start date"),
            "END_DATE": Col("date_mdy", "Session end date"),
        },
    ),
    # ------------------------------------------------ inactive.py
    "LOBBYIST_CONTRIBUTIONS1_CD": Table(
        group="inactive",
        unique_key=None,
        forms=(),
        docs="Lobbyist campaign contribution directory (no longer updated)",
        columns={
            "FILER_ID": Col("long", "Filer ID of the lobbyist"),
            "FILING_PERIOD_START_DT": Col("date_mdy", "Directory period start"),
            "FILING_PERIOD_END_DT": Col("date_mdy", "Directory period end"),
            "CONTRIBUTION_DT": Col("string", "Date of the contribution (as published)"),
            "RECIPIENT_NAME": Col("string", "Recipient committee or candidate"),
            "RECIPIENT_ID": Col("long", "Recipient filer ID"),
            "AMOUNT": Col("decimal(14,2)", "Amount of the contribution"),
        },
    ),
    "LOBBYIST_FIRM1_CD": Table(
        group="inactive",
        unique_key=None,
        forms=(),
        docs="Lobbyist firm directory snapshot (no longer updated)",
        columns={
            "FIRM_ID": Col("long", "Firm identification number"),
            "FIRM_NAME": Col("string", "Name of the lobbying firm"),
            "CURRENT_QTR_AMT": Col("decimal(14,2)", "Amount for the current quarter"),
            "SESSION_TOTAL_AMT": Col("decimal(14,2)", "Total for the session"),
            "SESSION_ID": Col("int", "Legislative session of the snapshot"),
        },
    ),
    "FILER_TYPE_PERIODS_CD": Table(
        group="inactive",
        unique_key=("ELECTION_TYPE", "FILER_ID", "FILER_TYPE", "PERIOD_ID"),
        forms=(),
        docs="Filer-type to filing-period links (inactive table)",
        # Full public column set (reference
        # calaccess_raw/models/inactive.py §FilerTypePeriodsCd — 4 fields).
        columns={
            "ELECTION_TYPE": Col("int", "Election type code"),
            "FILER_ID": Col("long", "Filer identification number"),
            "FILER_TYPE": Col("int", "Filer type code"),
            "PERIOD_ID": Col("int", "Identifies the period the filing covers"),
        },
    ),
    "BALLOT_MEASURES_CD": Table(
        group="inactive",
        unique_key=("FILER_ID", "MEASURE_NO", "ELECTION_DATE"),
        forms=(),
        docs="Ballot measure directory (no longer updated by the state)",
        columns={
            "FILER_ID": Col("long", "Filer ID of the measure's committee"),
            "MEASURE_NO": Col("string", "Measure number or letter"),
            "ELECTION_DATE": Col("date_mdy", "Date of the election"),
            "MEASURE_NAME": Col("string", "Full name of the measure"),
            "MEASURE_SHORT_NAME": Col("string", "Short name of the measure"),
            "JURISDICTION": Col("string", "Jurisdiction voting on the measure"),
        },
    ),
    # ------------------------------------------------ campaign.py (2)
    "F501_502_CD": Table(
        group="campaign",
        unique_key=("FILING_ID", "AMEND_ID"),
        forms=("F501", "F502"),
        docs="Candidate intention and bank account statements (Forms 501/502)",
        columns={
            **_filing_cols(line_item=False),
            "FILER_ID": Col("string", "Filer ID of the candidate"),
            "COMMITTEE_ID": Col("string", "Committee ID of the campaign account"),
            "ENTITY_CD": Col("string", "Entity code of the filer"),
            "CAND_NAML": Col("string", "Candidate last name"),
            "CAND_NAMF": Col("string", "Candidate first name"),
            "OFFICE_CD": Col("string", "Office sought code"),
            "DISTRICT_CD": Col("int", "District of the office sought"),
            "PARTY_CD": Col("int", "Political party code"),
            "JURIS_CD": Col("string", "Jurisdiction code of the office"),
            "YR_OF_ELEC": Col("int", "Year of the election"),
            "ELEC_TYPE": Col("string", "Election type (primary/general/special)"),
            "EXECUTE_DT": Col("date_mdy", "Date the statement was executed"),
        },
    ),
    # ------------------------------------------------ other.py (2)
    "EFS_FILING_LOG_CD": Table(
        group="other",
        unique_key=None,
        forms=(),
        docs="Electronic filing system submission log (one row per attempt)",
        columns={
            "FILING_DATE": Col("date_mdy", "Date the electronic filing arrived"),
            "FILINGSTATUS": Col("int", "Status code assigned by the EFS"),
            "VENDOR": Col("string", "Software vendor that produced the filing"),
            "FILER_ID": Col("string", "Filer ID on the submission"),
            "FORM_TYPE": Col("string", "Form type of the submission"),
            "ERROR_NO": Col("string", "Error number when the submission failed"),
        },
    ),
    "FILER_ACRONYMS_CD": Table(
        group="other",
        unique_key=("ACRONYM", "FILER_ID"),
        forms=(),
        docs="Acronyms registered to individual filers",
        columns={
            "ACRONYM": Col("string", "Acronym registered by the filer"),
            "FILER_ID": Col("long", "Filer ID owning the acronym"),
        },
    ),
    "FILER_ADDRESS_CD": Table(
        group="other",
        unique_key=None,
        forms=(),
        docs="Links filers to their addresses in the address directory",
        columns={
            "FILER_ID": Col("long", "Filer ID of the record"),
            "ADRID": Col("long", "Address ID in ADDRESS_CD"),
            "EFFECT_DT": Col("date_mdy", "Date the address became effective"),
            "ADD_TYPE": Col("int", "Address type code"),
            "SESSION_ID": Col("int", "Legislative session of the link"),
        },
    ),
    "FILER_ETHICS_CLASS_CD": Table(
        group="other",
        unique_key=None,
        forms=(),
        docs="Ethics training completion dates per lobbyist filer",
        columns={
            "FILER_ID": Col("long", "Filer ID of the lobbyist"),
            "SESSION_ID": Col("int", "Legislative session of the class"),
            "ETHICS_DATE": Col("date_mdy", "Date the ethics class was completed"),
        },
    ),
    "FILER_INTERESTS_CD": Table(
        group="other",
        unique_key=None,
        forms=(),
        docs="Lobbying interest codes declared per filer and session",
        columns={
            "FILER_ID": Col("long", "Filer ID of the record"),
            "SESSION_ID": Col("int", "Legislative session of the declaration"),
            "INTEREST_CD": Col("int", "Lobbying interest category code"),
            "EFFECT_DATE": Col("date_mdy", "Date the declaration took effect"),
        },
    ),
    "GROUP_TYPES_CD": Table(
        group="other",
        unique_key=None,
        forms=(),
        docs="Lookup of filer group type codes",
        columns={
            "GRP_ID": Col("int", "Group type identification number"),
            "GRP_NAME": Col("string", "Name of the group type"),
            "GRP_DESC": Col("string", "Description of the group type"),
        },
    ),
    "LOOKUP_CODES_CD": Table(
        group="other",
        unique_key=("CODE_TYPE", "CODE_ID"),
        forms=(),
        docs="Master lookup of coded values used across the database",
        columns={
            "CODE_TYPE": Col("int", "Family the coded value belongs to"),
            "CODE_ID": Col("int", "Value of the code within its family"),
            "CODE_DESC": Col("string", "Human-readable meaning of the code"),
        },
    ),
    "NAMES_CD": Table(
        group="other",
        unique_key=None,
        forms=(),
        docs="Name directory backing the filer search screens",
        columns={
            "NAMID": Col("long", "Name record identification number"),
            "NAML": Col("string", "Last name or business name"),
            "NAMF": Col("string", "First name"),
            "NAMT": Col("string", "Name title or prefix"),
            "NAMS": Col("string", "Name suffix"),
            "MONIKER": Col("string", "Moniker associated with the name"),
            "MONIKER_POS": Col("string", "Position of the moniker in the name"),
            "NAML_SEARCH": Col("string", "Search-normalized last name"),
        },
    ),
    "RECEIVED_FILINGS_CD": Table(
        group="other",
        unique_key=None,
        forms=(),
        docs="Log of filings received by the secretary of state's office",
        columns={
            "FILER_ID": Col("long", "Filer ID on the received filing"),
            "FILING_FILE_NAME": Col("string", "File name of the received filing"),
            "RECEIVED_DATE": Col("date_mdy", "Date the filing was received"),
            "FILING_DIRECTORY": Col("string", "Directory the filing was stored in"),
            "FILING_ID": Col("long", "Filing ID assigned on receipt"),
            "FORM_ID": Col("string", "Form type of the received filing"),
            "RECEIVE_COMMENT": Col("string", "Comment recorded at receipt"),
        },
    ),
    "REPORTS_CD": Table(
        group="other",
        unique_key=None,
        forms=(),
        docs="Catalog of canned reports the state system can produce",
        columns={
            "RPT_ID": Col("int", "Report identification number"),
            "RPT_NAME": Col("string", "Name of the report"),
            "RPT_DESC_FIELD": Col("string", "Description of the report"),
            "PATH": Col("string", "Path to the report definition"),
            "DATA_OBJECT": Col("string", "Data object the report runs over"),
            "PARMS_FLG_Y_N": Col("yn", "Whether the report takes parameters"),
            "RPT_TYPE": Col("int", "Report type code"),
            "PARM_DEFINITION": Col("int", "Parameter definition identifier"),
        },
    ),
    # ------------------------------------------------ inactive.py (2)
    # The Lobbyist* directory snapshots ship as 1/2/3 generations of
    # the same layout (models/inactive.py declares each generation as
    # its own model); the registry builds each family from one shape.
    "LOBBYING_CHG_LOG_CD": Table(
        group="inactive",
        unique_key=None,
        forms=(),
        docs="Change log of lobbying filer registrations (no longer updated)",
        columns={
            "FILER_ID": Col("long", "Filer ID whose record changed"),
            "CHANGE_NO": Col("int", "Sequence number of the change"),
            "SESSION_ID": Col("int", "Legislative session of the change"),
            "LOG_DT": Col("date_mdy", "Date the change was logged"),
            "FILER_TYPE": Col("int", "Filer type code at change time"),
            "CORRECTION_FLAG": Col("string", "Whether the change is a correction"),
            "ACTION": Col("string", "Action that produced the change"),
            "ATTRIBUTE_CHANGED": Col("string", "Attribute the change touched"),
            "ETHICS_DT": Col("date_mdy", "Ethics class date on the record"),
            "INTERESTS": Col("string", "Declared lobbying interests"),
            "FILER_FULL_NAME": Col("string", "Full name of the filer"),
            "FILER_CITY": Col("string", "City of the filer"),
            "FILER_ST": Col("string", "State of the filer"),
            "FILER_ZIP": Col("string", "ZIP code of the filer"),
            "FILER_PHONE": Col("string", "Phone number of the filer"),
        },
    ),
    **{
        f"LOBBYIST_CONTRIBUTIONS{g}_CD": Table(
            group="inactive",
            unique_key=None,
            forms=(),
            docs=f"Lobbyist campaign contribution directory, generation {g} "
            "(no longer updated)",
            columns={
                "FILER_ID": Col("long", "Filer ID of the lobbyist"),
                "FILING_PERIOD_START_DT": Col("date_mdy", "Directory period start"),
                "FILING_PERIOD_END_DT": Col("date_mdy", "Directory period end"),
                "CONTRIBUTION_DT": Col(
                    "string", "Date of the contribution (as published)"
                ),
                "RECIPIENT_NAME": Col("string", "Recipient committee or candidate"),
                "RECIPIENT_ID": Col("long", "Recipient filer ID"),
                "AMOUNT": Col("decimal(14,2)", "Amount of the contribution"),
            },
        )
        for g in (2, 3)
    },
    **{
        f"LOBBYIST_EMPLOYER{g}_CD": Table(
            group="inactive",
            unique_key=None,
            forms=(),
            docs=f"Lobbyist employer directory, generation {g} "
            "(no longer updated)",
            columns={
                "EMPLOYER_ID": Col("long", "Employer identification number"),
                "SESSION_ID": Col("int", "Legislative session of the snapshot"),
                "EMPLOYER_NAME": Col("string", "Name of the lobbyist employer"),
                "CURRENT_QTR_AMT": Col(
                    "decimal(14,2)", "Amount spent in the current quarter"
                ),
                "SESSION_TOTAL_AMT": Col(
                    "decimal(14,2)", "Total spent in the session"
                ),
                "CONTRIBUTOR_ID": Col("long", "Contributor ID of the employer"),
                "INTEREST_CD": Col("int", "Lobbying interest category code"),
                "INTEREST_NAME": Col("string", "Lobbying interest category name"),
                "SESSION_YR_1": Col("int", "First year of the session"),
                "SESSION_YR_2": Col("int", "Second year of the session"),
                "YR_1_YTD_AMT": Col("decimal(14,2)", "Year-one year-to-date amount"),
                "YR_2_YTD_AMT": Col("decimal(14,2)", "Year-two year-to-date amount"),
            },
        )
        for g in (1, 2, 3)
    },
    **{
        f"LOBBYIST_FIRM{g}_CD": Table(
            group="inactive",
            unique_key=None,
            forms=(),
            docs=f"Lobbyist firm directory, generation {g} (no longer updated)",
            columns={
                "FIRM_ID": Col("long", "Firm identification number"),
                "SESSION_ID": Col("int", "Legislative session of the snapshot"),
                "FIRM_NAME": Col("string", "Name of the lobbying firm"),
                "CURRENT_QTR_AMT": Col(
                    "decimal(14,2)", "Amount for the current quarter"
                ),
                "SESSION_TOTAL_AMT": Col("decimal(14,2)", "Total for the session"),
                "CONTRIBUTOR_ID": Col("long", "Contributor ID of the firm"),
            },
        )
        for g in (2, 3)
    },
    **{
        f"LOBBYIST_EMP_LOBBYIST{g}_CD": Table(
            group="inactive",
            unique_key=None,
            forms=(),
            docs=f"Lobbyists employed by employers, generation {g} "
            "(no longer updated)",
            columns={
                "EMPLOYER_ID": Col("long", "Employer identification number"),
                "SESSION_ID": Col("int", "Legislative session of the snapshot"),
                "LOBBYIST_ID": Col("long", "Lobbyist identification number"),
                "LOBBYIST_LAST_NAME": Col("string", "Lobbyist last name"),
                "LOBBYIST_FIRST_NAME": Col("string", "Lobbyist first name"),
                "EMPLOYER_NAME": Col("string", "Name of the employing entity"),
            },
        )
        for g in (1, 2)
    },
    **{
        f"LOBBYIST_EMPLOYER_FIRMS{g}_CD": Table(
            group="inactive",
            unique_key=None,
            forms=(),
            docs=f"Firms engaged by lobbyist employers, generation {g} "
            "(no longer updated)",
            columns={
                "EMPLOYER_ID": Col("long", "Employer identification number"),
                "FIRM_ID": Col("long", "Engaged firm identification number"),
                "FIRM_NAME": Col("string", "Name of the engaged firm"),
                "SESSION_ID": Col("int", "Legislative session of the engagement"),
                "TERMINATION_DT": Col("date_mdy", "Date the engagement ended"),
            },
        )
        for g in (1, 2)
    },
    **{
        f"LOBBYIST_FIRM_EMPLOYER{g}_CD": Table(
            group="inactive",
            unique_key=None,
            forms=(),
            docs=f"Employers reported by lobbying firms, generation {g} "
            "(no longer updated)",
            columns={
                "FIRM_ID": Col("long", "Firm identification number"),
                "FILING_ID": Col("long", "Filing the relationship was reported on"),
                "FILING_SEQUENCE": Col("int", "Amendment sequence of the filing"),
                "FIRM_NAME": Col("string", "Name of the lobbying firm"),
                "EMPLOYER_NAME": Col("string", "Name of the employer client"),
                "RPT_START": Col("date_mdy", "Reporting period start"),
                "RPT_END": Col("date_mdy", "Reporting period end"),
                "PER_TOTAL": Col("decimal(14,2)", "Total fees for the period"),
                "CUM_TOTAL": Col("decimal(14,2)", "Cumulative fees to date"),
                "LBY_ACTVTY": Col("string", "Described lobbying activity"),
            },
        )
        for g in (1, 2)
    },
    **{
        f"LOBBYIST_FIRM_LOBBYIST{g}_CD": Table(
            group="inactive",
            unique_key=None,
            forms=(),
            docs=f"Lobbyists employed by firms, generation {g} "
            "(no longer updated)",
            columns={
                "FIRM_ID": Col("long", "Firm identification number"),
                "LOBBYIST_ID": Col("long", "Lobbyist identification number"),
                "LOBBYIST_LAST_NAME": Col("string", "Lobbyist last name"),
                "LOBBYIST_FIRST_NAME": Col("string", "Lobbyist first name"),
                "FIRM_NAME": Col("string", "Name of the employing firm"),
                "SESSION_ID": Col("int", "Legislative session of the snapshot"),
            },
        )
        for g in (1, 2)
    },
    "LOBBYIST_EMPLOYER_HISTORY_CD": Table(
        group="inactive",
        unique_key=None,
        forms=(),
        docs="Historical totals per lobbyist employer (no longer updated)",
        columns={
            "CONTRIBUTOR_ID": Col("long", "Contributor ID of the employer"),
            "EMPLOYER_ID": Col("long", "Employer identification number"),
            "EMPLOYER_NAME": Col("string", "Name of the lobbyist employer"),
            "SESSION_ID": Col("int", "Legislative session of the totals"),
            "CURRENT_QTR_AMT": Col("decimal(14,2)", "Amount for the current quarter"),
            "SESSION_TOTAL_AMT": Col("decimal(14,2)", "Total for the session"),
            "INTEREST_CD": Col("int", "Lobbying interest category code"),
            "INTEREST_NAME": Col("string", "Lobbying interest category name"),
        },
    ),
    "LOBBYIST_FIRM_HISTORY_CD": Table(
        group="inactive",
        unique_key=None,
        forms=(),
        docs="Historical totals per lobbying firm (no longer updated)",
        columns={
            "CONTRIBUTOR_ID": Col("long", "Contributor ID of the firm"),
            "FIRM_ID": Col("long", "Firm identification number"),
            "FIRM_NAME": Col("string", "Name of the lobbying firm"),
            "SESSION_ID": Col("int", "Legislative session of the totals"),
            "CURRENT_QTR_AMT": Col("decimal(14,2)", "Amount for the current quarter"),
            "SESSION_TOTAL_AMT": Col("decimal(14,2)", "Total for the session"),
        },
    ),
}


# ------------------------------------------------------------------
# Back-compat plain mappings (column → kind) — the shape the clean /
# typing layer consumes. Derived from the registry, never hand-kept.

SCHEMAS: dict[str, dict[str, str]] = {
    name: {c: cd.kind for c, cd in t.columns.items()}
    for name, t in REGISTRY.items()
}

RCPT_CD = SCHEMAS["RCPT_CD"]
EXPN_CD = SCHEMAS["EXPN_CD"]
CVR_CAMPAIGN_DISCLOSURE_CD = SCHEMAS["CVR_CAMPAIGN_DISCLOSURE_CD"]


# ------------------------------------------------------------------
# StructType projection with metadata — the Spark documentation layer


def kind_datatype(kind: str) -> DataType:
    """Logical kind → the Spark type the typing expressions produce."""
    if kind.startswith("decimal"):
        p, s = kind[len("decimal(") : -1].split(",")
        return DecimalType(int(p), int(s))
    return {
        "string": StringType(),
        "int": IntegerType(),
        "long": LongType(),
        "date_mdy": DateType(),
        "ts_mdy12": TimestampNTZType(),
        "yn": IntegerType(),
    }[kind]


def to_struct_type(name: str) -> StructType:
    """Typed ``StructType`` for a registered table, with each
    ``StructField.metadata`` carrying the documentation layer
    (help_text + logical kind + source group) — the reference's
    field-level help_text twin, in the place Spark persists through
    parquet writes and exposes via ``df.schema``."""
    t = REGISTRY[name]
    return StructType(
        [
            StructField(
                c,
                kind_datatype(cd.kind),
                nullable=True,
                metadata={"help_text": cd.help, "kind": cd.kind, "group": t.group},
            )
            for c, cd in t.columns.items()
        ]
    )
