"""Model-based document classification for corpus curation.

Training-data pipelines filter and route documents with lightweight
bag-of-words classifiers (the GPT-3 quality classifier, CCNet's
fasttext language/domain filters). This module provides that stage as
a class-profile (Rocchio-style nearest-class) classifier with INTEGER
term weights:

- **Train** = one aggregation: per (label, token) corpus frequency —
  the class profile. No iterations, no floats, no seed.
- **Score** = sparse dot product of a document's term counts with
  each class profile, in BIGINT arithmetic; predicted label = argmax
  with a deterministic tie-break (score desc, label asc).

The integer weights are the point: training and inference are exactly
reproducible across runs, partitionings, and engines, so the whole
classifier (train + predict + confusion matrix) carries a full DuckDB
value-hash oracle — the property a float LR/fasttext model cannot
give (aggregation-order float drift). At production quality
thresholds you'd swap in a calibrated model; the pipeline shape
(profile broadcast/join, per-doc argmax) is identical.

Scale shape: profiles are vocabulary × classes (MBs at any corpus
size — aggregate is map-side combined); scoring is one equi-join on
token plus a per-(doc, class) sum — shuffle carries (doc, class,
partial score), never text. The per-doc argmax is a size-#classes
window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _doc_term_counts(
    df: DataFrame, id_col: str, text_col: str, extra_cols: list[str]
) -> DataFrame:
    """(id, extra..., token, tf) over lowercased whitespace tokens."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), "[ \\t\\n\\x0B\\f\\r]+"),
        lambda t: t != "",
    )
    return (
        df.select(F.col(id_col), *extra_cols, F.explode(toks).alias("token"))
        .groupBy(id_col, *extra_cols, "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )


def class_term_profiles(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Train: per-(label, token) corpus frequency — the integer class
    profile. One map-side-combined aggregation over the corpus."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), "[ \\t\\n\\x0B\\f\\r]+"),
        lambda t: t != "",
    )
    return (
        df.select(F.col(label_col).alias("label"), F.explode(toks).alias("token"))
        .groupBy("label", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cf"))
    )


def profile_classify(
    df: DataFrame,
    profiles: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Predict each document's label: argmax over classes of
    Σ_token tf(doc, token) × cf(label, token), BIGINT-exact, ties
    broken by label ascending. Documents whose tokens never appear in
    any profile are dropped (no evidence → no prediction); with
    profiles trained on the same corpus that set is empty-text docs
    only. Returns (id, pred_label, score)."""
    tf = _doc_term_counts(df, id_col, text_col, [])
    scores = (
        tf.join(profiles, "token")
        .groupBy(id_col, "label")
        .agg(F.sum(F.col("tf") * F.col("cf")).alias("score"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("label").asc()
    )
    return (
        scores.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            id_col,
            F.col("label").alias("pred_label"),
            F.col("score").cast("bigint").alias("score"),
        )
    )


def classifier_confusion(
    df: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Self-classification confusion matrix: train profiles on the
    labeled corpus, predict every document, count (true, predicted)
    pairs — the standard quick read on whether a label is learnable
    from the text (and the driver-checkable face of the classifier).
    Returns (true_label, pred_label, n)."""
    profiles = class_term_profiles(df, label_col, text_col)
    pred = profile_classify(df, profiles, id_col, text_col)
    truth = df.select(
        F.col(id_col), F.col(label_col).alias("true_label")
    )
    return (
        pred.join(truth, id_col)
        .groupBy("true_label", "pred_label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
