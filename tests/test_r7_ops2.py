"""Round-7 second-wave operators: prefix-filter exact similarity
join, DSIR importance weights, Zipf rank-frequency fit."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_prefix_filter_parity_with_exact_join(spark):
    """Prefix filtering must be lossless: identical pair set and
    Jaccard values as the join-on-every-shingle exact operator,
    across n-gram sizes and thresholds."""
    from deftunes_spark.ext.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_pairs,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for n, t in [(1, 0.5), (2, 0.4), (3, 0.7)]:
        got = {
            (r.id_a, r.id_b, r.jaccard)
            for r in prefix_filter_pairs(
                docs, "doc_id", "text", n=n, threshold=t
            ).collect()
        }
        want = {
            (r.id_a, r.id_b, round(r.jaccard, 6))
            for r in ngram_jaccard_pairs(
                docs, "doc_id", "text", n=n, threshold=t
            ).collect()
        }
        assert got == want, f"n={n} t={t}"
        assert got, f"n={n} t={t}: fixture should contain near-dups"


def test_prefix_filter_finds_planted_duplicate(spark):
    from deftunes_spark.ext.dedup import prefix_filter_pairs

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different words entirely here now"),
        ],
        ["doc_id", "text"],
    )
    rows = prefix_filter_pairs(
        df, "doc_id", "text", n=1, threshold=0.5
    ).collect()
    assert {(r.id_a, r.id_b) for r in rows} == {(1, 2)}
    # 8-distinct-token sets sharing 7: J = 7 / (8 + 8 - 7)
    assert rows[0].jaccard == round(7 / 9, 6)


def test_prefix_filter_threshold_validation(spark):
    from deftunes_spark.ext.dedup import prefix_filter_pairs

    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            prefix_filter_pairs(df, "doc_id", "text", threshold=bad)


def test_tokenization_vertical_tab_cross_engine(spark):
    """Repo-wide tokenization uses the explicit [ \\t\\n\\x0B\\f\\r]+
    class because Java \\s includes U+000B and RE2 \\s does not. On a
    vertical-tab document, Spark shingles must equal DuckDB's split
    with the same class — and both must treat \\x0B as a separator."""
    import duckdb

    from deftunes_spark.ext.dedup import shingles

    txt = "alpha\x0bbeta gamma"
    got = sorted(
        r.shingle
        for r in shingles(
            spark.createDataFrame([(1, txt)], ["doc_id", "text"]),
            "doc_id",
            "text",
            n=1,
        ).collect()
    )
    want = sorted(
        r[0]
        for r in duckdb.sql(
            "SELECT DISTINCT unnest(regexp_split_to_array(trim(?),"
            " '[ \\t\\n\\x0B\\f\\r]+')) AS t",
            params=[txt],
        ).fetchall()
    )
    assert got == want == ["alpha", "beta", "gamma"]


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_corpus = st.lists(
    st.text(
        alphabet=st.sampled_from(" ab\t\x0bxy"), min_size=0, max_size=40
    ),
    min_size=2,
    max_size=12,
)


def _brute_force_pairs(texts, n, t):
    """Driver-side reference: the EXACT engine tokenization (trim
    ASCII spaces, split on the explicit whitespace class, short-doc
    full-string shingle) and exact Jaccard — independent of Spark."""
    import re

    sets = {}
    for i, txt in enumerate(texts):
        toks = re.split("[ \t\n\x0b\f\r]+", txt.strip(" "))
        if len(toks) <= n:
            sh = {" ".join(toks)}
        else:
            sh = {
                " ".join(toks[j : j + n])
                for j in range(len(toks) - n + 1)
            }
        sets[i] = sh
    out = set()
    ids = sorted(sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            o = len(sets[a] & sets[b])
            u = len(sets[a]) + len(sets[b]) - o
            if u and o / u >= t:
                out.add((a, b, round(o / u, 6)))
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=_corpus,
    n=st.integers(min_value=1, max_value=3),
    t=st.sampled_from([0.3, 0.5, 0.8]),
)
def test_prefix_filter_exact_on_arbitrary_corpora(spark, texts, n, t):
    """Prefix filtering is EXACT for any corpus — including vertical
    tabs, empty docs, and all-duplicate corpora — per the AllPairs
    prefix lemma; verified against a driver-side brute force that
    shares only the tokenization definition."""
    from deftunes_spark.ext.dedup import prefix_filter_pairs

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.id_a, r.id_b, r.jaccard)
        for r in prefix_filter_pairs(
            df, "doc_id", "text", n=n, threshold=t, cache=False
        ).collect()
    }
    assert got == _brute_force_pairs(texts, n, t)


def test_dsir_separates_target_from_raw(spark):
    """Importance log-weights must rank the target slice above the
    rest on average — that is the whole point of the estimator."""
    from deftunes_spark.ext.curation import dsir_logweights

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    w = dsir_logweights(docs, F.col("lang") == "en", n=2)
    joined = w.join(docs.select("doc_id", "lang"), "doc_id")
    means = {
        r.is_t: r.m
        for r in joined.groupBy(
            (F.col("lang") == "en").alias("is_t")
        )
        .agg(F.avg("dsir_logweight").alias("m"))
        .collect()
    }
    assert means[True] > means[False]
    assert w.count() == docs.count()


def test_dsir_weight_is_exact_feature_sum(spark):
    """Hand-checkable two-bucket-model case: every doc's weight must
    equal the sum of its features' rounded log-ratios."""
    from deftunes_spark.ext.curation import dsir_logweights

    df = spark.createDataFrame(
        [(1, "aa aa bb", True), (2, "bb bb cc", False)],
        ["doc_id", "text", "is_t"],
    )
    rows = {
        r.doc_id: r
        for r in dsir_logweights(
            df, F.col("is_t"), n=1, n_buckets=4
        ).collect()
    }
    # n=1 shingles: doc1 -> aa aa bb (3 feats), doc2 -> bb bb cc.
    assert rows[1].n_feats == 3 and rows[2].n_feats == 3
    # Recompute driver-side with the same smoothing/rounding.
    import hashlib

    def bkt(s):
        return int(hashlib.md5(f"dsir|{s}".encode()).hexdigest()[:15], 16) % 4

    feats = {1: ["aa", "aa", "bb"], 2: ["bb", "bb", "cc"]}
    cr, ct = {}, {}
    for d, fs in feats.items():
        for s in fs:
            b = bkt(s)
            cr[b] = cr.get(b, 0) + 1
            if d == 1:
                ct[b] = ct.get(b, 0) + 1
    r_tot, t_tot = sum(cr.values()), sum(ct.values())
    for d, fs in feats.items():
        want = sum(
            round(
                math.log(
                    ((ct.get(bkt(s), 0) + 1) * float(r_tot + 4))
                    / ((cr[bkt(s)] + 1) * float(t_tot + 4))
                ),
                6,
            )
            for s in fs
        )
        assert abs(rows[d].dsir_logweight - want) < 1e-9


def test_zipf_fit_on_known_distribution(spark):
    """Exact power law cnt = 2^(10-rank_exponent): slope of the log-log
    fit must recover the exponent."""
    from deftunes_spark.ext.profile import zipf_fit

    # token w_i repeated floor(1000 / i) times -> slope ~ -1.
    df = spark.createDataFrame(
        [
            (i, (f"w{i:03d} " * max(1000 // i, 1)).strip())
            for i in range(1, 51)
        ],
        ["doc_id", "text"],
    )
    r = zipf_fit(df, "text", max_rank=50).first()
    assert r.vocab_size == 50
    assert r.fitted_ranks == 50
    assert -1.05 < r.zipf_slope < -0.95
    assert r.total_tokens == sum(max(1000 // i, 1) for i in range(1, 51))


def test_zipf_max_rank_caps_fit(spark):
    from deftunes_spark.ext.profile import zipf_fit

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    r = zipf_fit(docs, "text", max_rank=10).first()
    assert r.fitted_ranks == 10
    assert r.vocab_size > 10  # full vocab still reported
    assert r.zipf_slope < 0


def test_matryoshka_truncate_renormalizes(spark):
    from deftunes_spark.ext.similarity import matryoshka_truncate

    df = spark.createDataFrame(
        [(1, [3.0, 4.0, 100.0, 100.0]), (2, [0.0, 0.0, 5.0, 5.0])],
        ["vec_id", "embedding"],
    )
    rows = {
        r.vec_id: r.m
        for r in matryoshka_truncate(
            df, 2, out_col="m"
        ).collect()
    }
    assert rows[1] == pytest.approx([0.6, 0.8])  # 3-4-5 renormed
    assert rows[2] is None  # zero-norm prefix -> NULL, not div/0
    # renormalize=False keeps the raw slice
    raw = {
        r.vec_id: r.m
        for r in matryoshka_truncate(
            df, 2, out_col="m", renormalize=False
        ).collect()
    }
    assert raw[2] == [0.0, 0.0]
    with pytest.raises(ValueError):
        matryoshka_truncate(df, 0)


def test_matryoshka_recall_bounds_and_self_consistency(spark):
    """recall@k in [0,1]; overlap counts monotone in k; full-vs-full
    would be 1.0 — spot-check the registry query output shape."""
    from deftunes_spark.registry import QUERIES

    rows = sorted(
        QUERIES["matryoshka_recall"](
            spark, "/root/testdata/sf0.001"
        ).collect(),
        key=lambda r: r.k,
    )
    assert [r.k for r in rows] == [5, 10, 20]
    prev = 0
    for r in rows:
        assert 0 <= r.n_overlap <= r.k
        assert r.recall == round(r.n_overlap / r.k, 6)
        assert r.n_overlap >= prev  # overlap can only grow with k
        prev = r.n_overlap


def test_prefix_filter_guard_trips_on_stopword_universe(spark):
    """r7 verdict #6: the n=2/t=0.5 config on the 40-word synthetic
    vocabulary makes every prefix token a stopword; the auto-guard
    must fail fast with an error naming the knobs instead of running
    the quadratic candidate join (builder measured 11 s pre-guard at
    sf0.1)."""
    from deftunes_spark.ext.dedup import prefix_filter_pairs

    docs = spark.read.parquet(
        "/root/testdata/sf0.1/documents.parquet"
    )
    with pytest.raises(Exception) as exc:
        prefix_filter_pairs(
            docs, "doc_id", "text", n=2, threshold=0.5, cache=False
        ).collect()
    msg = str(exc.value)
    assert "stopword-dense" in msg
    assert "raise n" in msg and "max_doc_freq" in msg


def test_prefix_filter_guard_floor_spares_small_corpora(spark):
    """Dense candidate sets on tiny corpora are legitimate and cheap —
    the absolute floor must keep them out of the guard's way, and the
    gate must not change the answer."""
    from deftunes_spark.ext.dedup import prefix_filter_pairs

    texts = ["common words shared by every document"] * 10
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = prefix_filter_pairs(
        df, "doc_id", "text", n=1, threshold=0.5, cache=False
    ).collect()
    assert len(rows) == 45  # all 10-choose-2 identical pairs
    # ... and with the floor lowered the same corpus trips.
    with pytest.raises(Exception) as exc:
        prefix_filter_pairs(
            df,
            "doc_id",
            "text",
            n=1,
            threshold=0.5,
            cache=False,
            max_candidate_factor=1.0,
            min_candidate_floor=10,
        ).collect()
    assert "stopword-dense" in str(exc.value)


def test_prefix_filter_guard_disabled(spark):
    """max_candidate_factor=None disables the guard entirely (no gate
    relation in the plan)."""
    from deftunes_spark.ext.dedup import prefix_filter_pairs

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d")], ["doc_id", "text"]
    )
    out = prefix_filter_pairs(
        df,
        "doc_id",
        "text",
        n=1,
        threshold=0.4,
        cache=False,
        max_candidate_factor=None,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "raise_error" not in plan
    assert {(r.id_a, r.id_b) for r in out.collect()} == {(1, 2)}


def test_prefix_filter_empty_input(spark):
    """r8 review: an empty input's Σc² aggregate is NULL — the guard
    must coalesce to 0 and return zero pairs, not throw
    assert_true(NULL)."""
    from deftunes_spark.ext.dedup import prefix_filter_pairs

    df = spark.createDataFrame([], "doc_id long, text string")
    assert (
        prefix_filter_pairs(
            df, "doc_id", "text", n=2, threshold=0.5, cache=False
        ).collect()
        == []
    )
