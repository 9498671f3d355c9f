"""Text-analysis operators for LLM-data pipelines (SURVEY.md §2.5 E19).

All hot-path expressions are built-in `pyspark.sql.functions` (JVM
whole-stage codegen, no Python in the loop); per-row Python appears
only in the clearly-marked UDF demos in queries/extensions.py.

At 100 TB these are embarrassingly parallel projections — no shuffle
except the final aggregations, which do map-side partial aggregation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: tiny per-language stopword lists for the n-gram/stopword-ratio
#: language heuristic. Deterministic, dependency-free.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es": ("el", "la", "de", "y", "que", "en", "un", "es", "se", "no"),
    "fr": ("le", "la", "de", "et", "que", "en", "un", "est", "se", "ne"),
    "de": ("der", "die", "das", "und", "zu", "in", "ist", "es", "den", "nicht"),
}

#: Whitespace class shared by Java regex (Spark) and RE2 (DuckDB
#: oracles): Java's \s additionally matches \x0B where RE2's does
#: not, so every oracled tokenization spells the class out instead —
#: a document containing a vertical tab must tokenize identically in
#: both engines or the value-hash gate flakes.
WS = "[\t\n\f\r ]"

#: BPE-ish token regex: words, numbers, or single non-space symbols —
#: a deterministic stand-in for a real tokenizer's pre-tokenization.
#: Whitespace spelled out (see WS) so Java and RE2 agree on \x0B.
BPE_ISH = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\t\n\f\r ]"


def tokens(text: str | Column, pattern: str = WS + "+") -> Column:
    """Whitespace tokens with empties removed (array<string>)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, pattern), lambda x: x != "")


def token_count(text: str | Column) -> Column:
    return F.size(tokens(text)).cast("long")


def bpe_ish_count(text: str | Column) -> Column:
    """Token count under the BPE-ish pre-tokenization regex."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH), F.lit(0))).cast("long")


def stopword_ratio(text: str | Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    toks = tokens(text)
    stop = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, F.lower(t))))
    return n_stop.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword quality features per document.

    The standard cheap pre-filters of a training-data pipeline:
    mean word length, punctuation density, stopword ratio, digit
    ratio. Everything stays in codegen.
    """
    c = F.col(text_col)
    n_chars = F.length(c).cast("long")
    toks = tokens(text_col)
    n_toks = F.size(toks).cast("long")
    return df.withColumns(
        {
            "n_chars": n_chars,
            "n_tokens": n_toks,
            "mean_token_len": (
                F.aggregate(
                    toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
                ).cast("double")
                / F.greatest(n_toks, F.lit(1)).cast("double")
            ),
            "punct_ratio": (
                F.length(F.regexp_replace(c, r"[^!-/:-@\[-`{-~]", "")).cast("double")
                / F.greatest(n_chars, F.lit(1)).cast("double")
            ),
            "digit_ratio": (
                F.length(F.regexp_replace(c, r"[^0-9]", "")).cast("double")
                / F.greatest(n_chars, F.lit(1)).cast("double")
            ),
            "stopword_ratio_en": stopword_ratio(text_col, "en"),
        }
    )


def langid_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword ratios.

    Ties break lexicographically ('unknown' when no stopwords hit) —
    fully deterministic, so it is oracle-checkable in SQL.
    """
    toks = tokens(text_col)
    cols = {}
    for lang, words in STOPWORDS.items():
        stop = F.array(*[F.lit(w) for w in words])
        cols[f"score_{lang}"] = (
            F.size(F.filter(toks, lambda t: F.array_contains(stop, F.lower(t))))
            .cast("double")
            / F.greatest(F.size(toks), F.lit(1)).cast("double")
        )
    out = df.withColumns(cols)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in STOPWORDS])
    pred = F.lit("unknown")
    # reversed lexicographic fold → earliest language wins exact ties
    for lang in sorted(STOPWORDS, reverse=True):
        pred = F.when(
            (best > 0) & (F.col(f"score_{lang}") == best), F.lit(lang)
        ).otherwise(pred)
    return out.withColumn("pred_lang", pred)


def fingerprint(text: str | Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (lowercase, collapsed whitespace) — the exact-dedup key."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.trim(F.regexp_replace(F.lower(c), r"\s+", " ")))


def shingles(text: str | Column, n: int = 3) -> Column:
    """Word n-gram shingles (array<string>) — the standard dedup unit
    (word tokens alone under-segment; character/word shingles catch
    local rewrites). Pure higher-order expression: for token count T
    produces T-n+1 shingles via sequence+transform, no explode.

    Feed `array_distinct(shingles(...))` to MinHash/Jaccard exactly
    like token sets (`calaspark.ops.lsh`).
    """
    toks = tokens(text)
    # Bind the token array ONCE per row by passing it through a
    # one-element array transform: higher-order lambdas are
    # interpreted without common-subexpression elimination, so
    # referencing `toks` (a regexp split + filter) directly inside
    # the per-index lambda would RE-TOKENIZE the document for every
    # shingle — measured ~20 µs/shingle, the difference between a
    # serial 13 s and a 2 s stage at bench SF. The lambda variable
    # `ts` is the evaluated VALUE, so the split runs once.
    per_row = F.transform(
        F.array(toks),
        lambda ts: F.transform(
            F.sequence(F.lit(1), F.size(ts) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(ts, i, n)),
        ),
    )
    # sequence(1, 0) errors — guard the too-short case to empty array
    return F.when(
        F.size(toks) >= n,
        F.flatten(per_row),
    ).otherwise(F.array().cast("array<string>"))


def with_shingle_hashes(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    out: str = "toks",
) -> DataFrame:
    """Word n-gram shingles as 64-bit hashes (``out``: array<long>).

    Set-equivalent to ``shingles()`` up to hashing — MinHash/SimHash/
    Jaccard only ever hash or compare shingles, never display them —
    with no per-shingle string allocation (~2× on tokenize+hash).

    DataFrame-level on purpose: higher-order lambdas are evaluated
    INTERPRETED, and any outer expression referenced inside the
    lambda body is inlined and re-evaluated per element. Two separate
    projections (hash each token once; then mix n consecutive hashes)
    keep the lambda bodies referencing cheap bound columns — measured
    10× vs the single-expression form, whose token subtree re-split
    the text for every element_at. CollapseProject leaves the split
    alone because the alias is non-cheap and multiply referenced.

    64-bit shingle collisions are birthday-negligible at corpus scale.
    """
    hw = F.col("_hw")
    mixed = F.when(
        F.size(hw) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(hw) - (n - 1)),
            lambda i: F.xxhash64(
                *[F.element_at(hw, i + k) for k in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<long>"))
    return (
        df.select(
            "*", F.transform(tokens(text_col), lambda t: F.xxhash64(t)).alias("_hw")
        )
        .select("*", mixed.alias(out))
        .drop("_hw")
    )
