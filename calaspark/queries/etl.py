"""Declared contract queries Q21–Q28 — the ETL/cleaning twins
(SURVEY.md §2.2 C1–C4/T1–T3, §2.5 E6–E10, §2.6).

These mirror the heart of the reference: the TSV cleaner
(`calaccess_raw/management/commands/cleancalaccessrawfile.py
§Command.handle` — quarantine, control-char strip, re-quoting) and
the in-DB typing templates (`calaccess_raw/fields.py
§DateField.copy_template` etc. — empty-string→NULL, M/D/YYYY parsing,
decimal casts), re-expressed as distributed column expressions that
stay inside whole-stage codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..ops.text import fingerprint
from ..tables import load_table
from ._util import as_date, money_sum

# ---------------------------------------------------------------- Q21


def q21_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery over part (R2/E6; admin search twin)."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").contains("e") | F.col("p_name").startswith("red")
    ).select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_type").alias("lo"),
        F.substring("p_name", 1, 10).alias("sub"),
        F.concat_ws("|", "p_brand", "p_type").alias("cw"),
        F.lpad("p_brand", 12, "*").alias("lp"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("tr"),
        F.translate("p_name", "ae", "43").alias("tl"),
        F.initcap("p_name").alias("ic"),
        F.length("p_name").cast("long").alias("ln"),
        F.levenshtein("p_brand", F.lit("Brand#11")).cast("long").alias("lev"),
    )


# ---------------------------------------------------------------- Q22


def q22_regex_clean_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleaning twin (C3/C4/E21): control-char strip, whitespace
    collapse, empty→NULL, md5 fingerprint — the reference's cleaner
    semantics over `documents.text`."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace("text", r"[\x00-\x1F]", " "), r" +", " "
        )
    )
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"^(\w+)", 1).alias("first_tok"),
        F.nullif(norm, F.lit("")).alias("cleaned"),
        fingerprint("text").alias("fp"),
        F.length(norm).cast("long").alias("n_chars_norm"),
    )


# ---------------------------------------------------------------- Q23


def q23_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery (E8). Round happens on exact decimal (never on a
    raw double — engines disagree on double half-rounding); sqrt is
    IEEE-correctly-rounded so it is portable; pow is avoided in favor
    of multiplication (libm pow may differ across engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice").cast("decimal(12,2)"), 1)
        .cast("double")
        .alias("r1"),
        F.abs(F.col("l_extendedprice") - 50000).alias("abs_diff"),
        F.ceil("l_quantity").cast("long").alias("ce"),
        F.floor("l_quantity").cast("long").alias("fl"),
        F.pmod("l_orderkey", F.lit(7)).alias("md"),
        F.sqrt("l_quantity").alias("sq"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("q2"),
    )


# ---------------------------------------------------------------- Q24


def q24_date_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ETL typing twin (T2): the reference parses `M/D/YYYY` and
    `M/D/YYYY HH12:MI:SS AM` inside PostgreSQL COPY
    (`calaccess_raw/fields.py §DateField.copy_template`); here we
    format→reparse→compare to prove identical semantics."""
    o = load_table(spark, sf_dir, "orders")
    s1 = F.date_format("o_orderdate", "M/d/yyyy")
    s2 = F.concat(s1, F.lit(" 12:00:00 AM"))
    parsed = F.to_date(s1, "M/d/yyyy")
    parsed_ts = F.to_timestamp(s2, "M/d/yyyy h:mm:ss a")
    return o.select(
        "o_orderkey",
        s1.alias("s1"),
        parsed.alias("parsed"),
        parsed_ts.cast("date").alias("parsed_ts_date"),
        F.hour(parsed_ts).cast("long").alias("parsed_hour"),
        (parsed == F.col("o_orderdate").cast("date")).alias("roundtrip_ok"),
    )


# ---------------------------------------------------------------- Q25


def q25_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function battery (E7): extract, truncate, arithmetic."""
    o = load_table(spark, sf_dir, "orders")
    d = as_date("o_orderdate")
    return o.select(
        "o_orderkey",
        d.alias("d"),
        F.year(d).cast("long").alias("y"),
        F.month(d).cast("long").alias("m"),
        F.dayofmonth(d).cast("long").alias("dy"),
        F.trunc(d, "month").alias("mstart"),
        F.date_add(d, 7).alias("d7"),
        F.datediff(F.lit("1998-01-01").cast("date"), d).cast("long").alias("days_to_98"),
        F.last_day(d).alias("ld"),
        ((F.lit(1998) - F.year(d)) * 12 + (F.lit(1) - F.month(d)))
        .cast("long")
        .alias("months_to_98"),
    )


def q25_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per calendar month (E7 + R9 date_hierarchy twin)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.trunc(as_date("o_orderdate"), "month").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum("o_totalprice", "revenue"),
        )
    )


# ---------------------------------------------------------------- Q26


def q26_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1/T3 twin: empty-string→NULL, Y/N flag typing, COALESCE —
    the `CASE WHEN "col" = '' THEN NULL ELSE ...` COPY templates of
    `calaccess_raw/fields.py`, as column expressions."""
    p = load_table(spark, sf_dir, "part")
    dirty = F.when(F.col("p_size") % 3 == 0, F.lit("")).otherwise(F.col("p_type"))
    flag = F.when(F.col("p_size") % 2 == 0, F.lit("Y")).otherwise(F.lit("N"))
    cleaned = F.nullif(dirty, F.lit(""))
    return p.select(
        "p_partkey",
        cleaned.alias("cleaned"),
        F.when(flag == "Y", 1).otherwise(0).alias("flag_int"),
        F.coalesce(cleaned, F.lit("UNKNOWN")).alias("coal"),
        cleaned.isNull().cast("int").alias("is_null"),
    )


# ---------------------------------------------------------------- Q27


def q27_quarantine_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 quarantine twin: classify rows whose (synthetically mangled)
    JSON payload fails to parse; report per-class counts — the
    reference's malformed-row sidecar + `RawDataFile.error_count`."""
    e = load_table(spark, sf_dir, "events")
    mangled = F.when(
        F.col("event_id") % 7 == 0, F.expr("substring(props, 2)")
    ).otherwise(F.col("props"))
    cls = F.when(
        F.get_json_object(mangled, "$.k").isNotNull(), F.lit("good")
    ).otherwise(F.lit("quarantine"))
    return (
        e.select(cls.alias("cls"), "event_id")
        .groupBy("cls")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
        )
    )


# ---------------------------------------------------------------- Q28


def q28_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction + typed aggregation (E10)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            (F.sum("k").cast("double") / F.count("k").cast("double")).alias("avg_k"),
        )
    )
