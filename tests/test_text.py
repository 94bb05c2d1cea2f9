import pytest

from deftunes_spark.ext import text as X

SAMPLES = [
    (1, "the cat and the dog sat in the garden with the birds", "en"),
    (2, "der Hund und die Katze sind nicht mit der Maus", "de"),
    (3, "le chat est dans la maison et les oiseaux dans le jardin", "fr"),
    (4, "el perro es grande y los gatos son una familia para todos", "es"),
    (5, "我们今天去公园散步然后回家吃饭", "zh"),
    (6, "12345 67890 !!!", "und"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t, _ in SAMPLES], ["doc_id", "text"]
    )


def test_lang_id_on_real_language_samples(docs):
    out = {r.doc_id: r.lang_pred for r in X.with_lang_id(docs).collect()}
    for i, _, expected in SAMPLES:
        assert out[i] == expected, f"doc {i}: {out[i]} != {expected}"


def test_token_count(spark):
    df = spark.createDataFrame(
        [(1, "  a b   c  "), (2, "single")], ["doc_id", "text"]
    )
    out = {r.doc_id: r.token_count for r in X.with_token_count(df).collect()}
    assert out == {1: 3, 2: 1}


def test_subword_count_bpe_ish(spark):
    df = spark.createDataFrame([(1, "hello, world! x2")], ["doc_id", "text"])
    row = X.with_subword_count(df).first()
    # alnum runs: hello, world, x2 → 3; punctuation: , ! → 2
    assert row.subword_count == 5


def test_quality_score_bounds_and_ordering(spark):
    df = spark.createDataFrame(
        [
            (1, "a clean sentence made of normal readable words"),
            (2, "0123456789 0123456789 0123456789"),
            (3, ""),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.quality_score for r in X.with_quality_score(df).collect()}
    assert all(0.0 <= v <= 1.0 for v in out.values())
    assert out[1] > out[2]  # digit noise scores lower
    assert out[3] == 0.0


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "  hello world "), (3, "other")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in X.with_fingerprint(df).collect()}
    assert rows[1].fingerprint != rows[2].fingerprint
    assert (
        rows[1].normalized_fingerprint == rows[2].normalized_fingerprint
    )
    assert rows[1].normalized_fingerprint != rows[3].normalized_fingerprint
