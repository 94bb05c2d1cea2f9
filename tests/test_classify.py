"""Class-profile classifier (ext/classify.py): deterministic
integer-weight bag-of-words classification for corpus curation."""

from __future__ import annotations

from pyspark.sql import functions as F

from deftunes_spark.ext.classify import (
    class_term_profiles,
    classifier_confusion,
    profile_classify,
)


def _docs(spark):
    rows = []
    did = 0
    for lang, vocab in (
        ("en", "the cat sat on the mat"),
        ("fr", "le chat assis sur le tapis"),
        ("de", "die katze sass auf der matte"),
    ):
        for i in range(4):
            did += 1
            rows.append((did, lang, f"{vocab} extra{i}"))
    return spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    )


def test_separable_corpus_classifies_perfectly(spark):
    docs = _docs(spark)
    conf = {
        (r.true_label, r.pred_label): r.n
        for r in classifier_confusion(docs, "lang").collect()
    }
    assert conf == {("en", "en"): 4, ("fr", "fr"): 4, ("de", "de"): 4}


def test_tie_breaks_by_label_ascending(spark):
    """Two classes with identical profiles score identically; the
    deterministic tie-break picks the lexicographically first."""
    docs = spark.createDataFrame(
        [(1, "b", "same words here"), (2, "a", "same words here")],
        "doc_id long, lang string, text string",
    )
    profiles = class_term_profiles(docs, "lang")
    pred = {
        r.doc_id: r.pred_label
        for r in profile_classify(docs, profiles).collect()
    }
    assert pred == {1: "a", 2: "a"}


def test_scores_are_exact_integers(spark):
    """Score = Σ tf×cf in BIGINT: verified against a hand computation
    (train == score corpus of one doc: every token tf=cf, score=Σtf²)."""
    docs = spark.createDataFrame(
        [(1, "x", "a a b")], "doc_id long, lang string, text string"
    )
    profiles = class_term_profiles(docs, "lang")
    row = profile_classify(docs, profiles).collect()[0]
    assert (row.pred_label, row.score) == ("x", 2 * 2 + 1 * 1)


def test_empty_and_null_text_dropped(spark):
    docs = spark.createDataFrame(
        [(1, "en", "hello world"), (2, "en", ""), (3, "en", None)],
        "doc_id long, lang string, text string",
    )
    profiles = class_term_profiles(docs, "lang")
    out = profile_classify(docs, profiles)
    assert [r.doc_id for r in out.collect()] == [1]


def test_new_docs_scored_against_trained_profiles(spark):
    """Inference on UNSEEN docs (the production shape: profiles are
    the persisted model, the batch streams through)."""
    train = _docs(spark)
    profiles = class_term_profiles(train, "lang")
    new = spark.createDataFrame(
        [(100, "le chat sur tapis"), (101, "the cat on mat")],
        "doc_id long, text string",
    )
    pred = {
        r.doc_id: r.pred_label
        for r in profile_classify(new, profiles).collect()
    }
    assert pred == {100: "fr", 101: "en"}
