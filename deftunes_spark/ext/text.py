"""Text analysis operators over a document table (documents fixture).

All pure built-in-function column pipelines (JVM/codegen, no UDFs):
token counting, quality scoring, n-gram/marker language ID, and
content fingerprinting. Each ``with_*`` returns the input plus new
columns so they compose into one scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker stopwords per language (public linguistic common-word lists).
# Word-boundary regex alternation; scoring = marker hits per token.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "est", "que", "une", "dans"],
    "es": ["el", "los", "las", "es", "que", "una", "por", "para"],
}
# Han characters mark zh without needing word segmentation.
ZH_CHAR_CLASS = "[\\u4e00-\\u9fff]"


def tokens_col(col: str = "text") -> Column:
    return F.split(F.trim(F.col(col)), "\\s+")


def with_token_count(df: DataFrame, col: str = "text") -> DataFrame:
    """Whitespace token count, matching Python ``str.split()``: blank /
    whitespace-only text has 0 tokens (``split`` alone would yield
    [""] → 1). The BPE-ish regex variant is ``with_subword_count``."""
    return df.withColumn(
        "token_count",
        F.size(
            F.filter(F.split(F.col(col), "\\s+"), lambda t: t != "")
        ).cast("bigint"),
    )


def with_subword_count(df: DataFrame, col: str = "text") -> DataFrame:
    """BPE-ish proxy: count alnum runs and standalone punctuation, the
    units a byte-pair tokenizer would start from."""
    return df.withColumn(
        "subword_count",
        F.size(
            F.filter(
                F.split(F.col(col), "[^A-Za-z0-9]+"),
                lambda t: t != "",
            )
        ).cast("bigint")
        + F.length(F.regexp_replace(F.col(col), "[A-Za-z0-9\\s]", ""))
        .cast("bigint"),
    )


def with_quality_features(df: DataFrame, col: str = "text") -> DataFrame:
    """Length/punctuation/character-class ratios used for quality
    filtering of training corpora."""
    c = F.col(col)
    n = F.length(c).cast("double")
    alpha = F.length(F.regexp_replace(c, "[^A-Za-z]", "")).cast("double")
    digit = F.length(F.regexp_replace(c, "[^0-9]", "")).cast("double")
    space = F.length(F.regexp_replace(c, "[^ ]", "")).cast("double")
    nz = F.when(n > 0, n)
    return (
        df.withColumn("n_chars_m", n.cast("bigint"))
        .withColumn("alpha_ratio", F.coalesce(alpha / nz, F.lit(0.0)))
        .withColumn("digit_ratio", F.coalesce(digit / nz, F.lit(0.0)))
        .withColumn("space_ratio", F.coalesce(space / nz, F.lit(0.0)))
    )


def with_quality_score(df: DataFrame, col: str = "text") -> DataFrame:
    """Composite 0..1 quality score: mostly-alphabetic, sane word
    lengths, not digit-noise. Deliberately simple arithmetic so it is
    exactly mirrorable in ANSI SQL (the correctness oracle)."""
    df = with_quality_features(df, col)
    df = with_token_count(df, col)
    avg_tok = F.when(
        F.col("token_count") > 0,
        F.col("n_chars_m").cast("double") / F.col("token_count"),
    ).otherwise(F.lit(0.0))
    raw = (
        F.col("alpha_ratio")
        - F.col("digit_ratio")
        - F.greatest(F.lit(0.0), F.abs(avg_tok - 6.0) - 3.0) * 0.1
    )
    return df.withColumn(
        "quality_score", F.greatest(F.lit(0.0), F.least(F.lit(1.0), raw))
    )


def _marker_count(col: Column, words: list[str]) -> Column:
    pat = "(?i)\\b(" + "|".join(words) + ")\\b"
    return F.regexp_count(col, F.lit(pat)).cast("double")


def with_lang_id(df: DataFrame, col: str = "text") -> DataFrame:
    """Marker-word / script language ID.

    Scores each candidate language by marker-stopword hits (Han-script
    chars for zh), picks the argmax with a fixed preference order on
    ties, 'und' when nothing matches. One regexp pass per language —
    all codegen, no UDF, no shuffle.
    """
    c = F.col(col)
    scores = {
        lang: _marker_count(c, words) for lang, words in LANG_MARKERS.items()
    }
    # Han char count without lookahead (RE2-compatible formulation):
    # total length minus length with Han chars removed.
    scores["zh"] = (
        F.length(c) - F.length(F.regexp_replace(c, ZH_CHAR_CLASS, ""))
    ).cast("double")
    df = df.withColumns({f"score_{k}": v for k, v in scores.items()})
    best = F.greatest(*[F.col(f"score_{k}") for k in scores])
    pred = F.lit("und")
    # Reverse preference order so earlier langs win ties.
    for lang in reversed(list(scores)):
        pred = F.when(
            (best > 0) & (F.col(f"score_{lang}") == best), F.lit(lang)
        ).otherwise(pred)
    return df.withColumn("lang_pred", pred).drop(
        *[f"score_{k}" for k in scores]
    )


def with_fingerprint(df: DataFrame, col: str = "text") -> DataFrame:
    """Content fingerprints: full-content md5 plus a normalized key
    (lowercased, whitespace-collapsed) whose md5 catches trivially
    reformatted duplicates."""
    c = F.col(col)
    normalized = F.lower(F.regexp_replace(F.trim(c), "\\s+", " "))
    return df.withColumn("fingerprint", F.md5(c)).withColumn(
        "normalized_fingerprint", F.md5(normalized)
    )
