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


def test_term_counts_and_tfidf(spark):
    import math

    from deftunes_spark.ext.text import term_counts, tf_idf

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "a c"), (3, "d d d")], ["doc_id", "text"]
    )
    tc = {(r.doc_id, r.term): r.tf for r in term_counts(docs).collect()}
    assert tc[(1, "a")] == 2 and tc[(3, "d")] == 3
    w = {
        (r.doc_id, r.term): (r.df, r.tfidf)
        for r in tf_idf(docs).collect()
    }
    # 'a' in 2 of 3 docs; tf=2 in doc 1
    df_a, tfidf_a = w[(1, "a")]
    assert df_a == 2
    assert abs(tfidf_a - 2 * math.log(3 / 2)) < 1e-12
    # 'd' only in doc 3: idf = ln(3)
    assert abs(w[(3, "d")][1] - 3 * math.log(3.0)) < 1e-12


def test_pack_sequences_bins_bounded(spark):
    from deftunes_spark.ext.text import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * (10 + i % 5))) for i in range(100)],
        ["doc_id", "text"],
    )
    packed = pack_sequences(docs, context_tokens=50, n_shards=4)
    rows = packed.collect()
    assert len(rows) == 100
    # bins are filled in doc order: tokens_before of the first doc of
    # each (shard,bin) is < bin*context + doc's own size
    import collections

    per_bin = collections.defaultdict(int)
    for r in rows:
        per_bin[(r.shard, r.bin)] += r.token_count
    # every non-final bin of a shard holds >= context worth once closed
    for (shard, b), tot in per_bin.items():
        later = [k for k in per_bin if k[0] == shard and k[1] > b]
        if later:
            assert tot >= 50 - 14  # closed bin is full up to one doc


def test_nfc_normalization_composes(spark):
    from deftunes_spark.ext.text import with_nfc_normalized

    rows = [(1, "cafe\u0301"), (2, "caf\u00e9"), (3, None),
            (4, "plain")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r.text_nfc
        for r in with_nfc_normalized(df).collect()
    }
    assert out[1] == out[2] == "caf\u00e9"
    assert out[3] is None
    assert out[4] == "plain"


def test_bigram_lm_scores_match_python_reference(spark):
    import math
    from collections import Counter

    from deftunes_spark.ext.text import bigram_lm_scores

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the hat"),
        (3, "dog"),                      # < 2 tokens -> excluded
        (4, "THE CAT sat"),              # lowercasing folds with 1/2
        (5, ""),                         # empty -> excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    k = 0.5
    got = {
        r.doc_id: (r.n_bigrams, r.avg_logp, r.perplexity)
        for r in bigram_lm_scores(df, k_smooth=k).collect()
    }
    assert set(got) == {1, 2, 4}

    toks = {i: t.lower().split() for i, t in rows}
    bigs = {
        i: list(zip(t, t[1:])) for i, t in toks.items() if len(t) >= 2
    }
    c2 = Counter(b for bs in bigs.values() for b in bs)
    c1 = Counter(b[0] for bs in bigs.values() for b in bs)
    vocab = len({w for t in toks.values() for w in t})
    for i, bs in bigs.items():
        avg = sum(
            math.log((c2[b] + k) / (c1[b[0]] + k * vocab)) for b in bs
        ) / len(bs)
        assert got[i][0] == len(bs)
        assert got[i][1] == pytest.approx(round(avg, 6), abs=2e-6)
        assert got[i][2] == pytest.approx(round(math.exp(-avg), 6), abs=2e-6)
    # Docs 1 and 2 share most bigrams; the shared-structure docs score
    # better (higher avg logp) than the folded short doc 4's worst case.
    assert got[1][1] > -10 and got[2][1] > -10


def test_gopher_rules_planted(spark):
    from deftunes_spark.ext.text import gopher_quality_flags

    good = "the quick brown fox jumps over a lazy dog with style " * 6
    rows = [
        (1, good),                       # passes everything
        (2, "short text only"),          # fails word count
        (3, good + " ###### " * 30),     # symbol ratio blown
        (4, ("aa " * 60) + "the a"),     # no 3..10 violation, passes
        (5, " ".join(["supercalifragilisticexpialidocious"] * 60)),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in gopher_quality_flags(df).collect()}
    assert out[1].gopher_keep
    assert not out[2].pass_word_count and not out[2].gopher_keep
    assert not out[3].pass_symbol_ratio
    assert out[4].pass_stopwords
    # 34-char words: mean word length rule fires.
    assert not out[5].pass_mean_word_len and not out[5].pass_stopwords


def test_char_entropy_known_values(spark):
    import math

    from deftunes_spark.ext.text import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "ab"), (3, "abcd"), (4, "aab")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in char_entropy(df).collect()}
    assert out[1].char_entropy == 0.0  # degenerate distribution
    assert abs(out[2].char_entropy - math.log(2)) < 1e-6
    assert abs(out[3].char_entropy - math.log(4)) < 1e-6  # uniform max
    h = -(2 / 3) * math.log(2 / 3) - (1 / 3) * math.log(1 / 3)
    assert abs(out[4].char_entropy - h) < 1e-6
    assert out[3].n_chars_e == 4


def test_ngram_repetition_fractions(spark):
    """Hand-computed duplicate-n-gram fractions (the Gopher n-gram
    repetition rules) including the degenerate shapes: a doc shorter
    than n tokens, a NULL doc, and a fully-repetitive doc."""
    from deftunes_spark.ext.text import ngram_repetition

    rows = [
        # "a b a b a": 2-grams [a b, b a, a b, b a] -> top 2/4, dup 4/4
        #              3-grams [a b a, b a b, a b a] -> top 2/3, dup 2/3
        (1, "a b a b a"),
        # all distinct: "x y z": 2-grams [x y, y z] -> top 1/2, dup 0
        (2, "x y z"),
        (3, "solo"),        # shorter than 2 tokens -> zeros
        (4, None),          # NULL text -> zeros
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.asDict()
        for r in ngram_repetition(df, "doc_id", "text").collect()
    }
    assert got[1]["n_2grams"] == 4
    assert got[1]["top_2gram_frac"] == 0.5
    assert got[1]["dup_2gram_frac"] == 1.0
    assert got[1]["n_3grams"] == 3
    assert got[1]["top_3gram_frac"] == round(2 / 3, 6)
    assert got[1]["dup_3gram_frac"] == round(2 / 3, 6)
    assert got[2]["n_2grams"] == 2
    assert got[2]["top_2gram_frac"] == 0.5
    assert got[2]["dup_2gram_frac"] == 0.0
    for d in (3, 4):
        assert got[d]["n_2grams"] == 0 and got[d]["n_3grams"] == 0
        assert got[d]["top_2gram_frac"] == 0.0
        assert got[d]["dup_3gram_frac"] == 0.0
