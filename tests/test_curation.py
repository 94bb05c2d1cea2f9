"""Planted-ground-truth tests for ext.curation: decontamination,
segment dedup (both methods), semantic dedup, mixture reweighting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deftunes_spark.ext import curation as C


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # 0-1: share the exact phrase "alpha beta gamma delta" with
        # the eval doc → contaminated at n=3, min_matches=2.
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "prefix alpha beta gamma delta suffix tail"),
        # 2: one 3-gram overlap only ("beta gamma delta" absent;
        # shares "gamma delta epsilon" once).
        (2, "unrelated words gamma delta epsilon here"),
        # 3: disjoint vocabulary.
        (3, "totally different content entirely"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate(spark, docs):
    eval_df = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["matched_ngrams"], r["contaminated"])
        for r in C.decontaminate(
            docs, eval_df, n=3, min_matches=2
        ).collect()
    }
    # doc 0: shingles of eval fully inside → 3 matches
    assert out[0] == (3, True)
    assert out[1][1] is True and out[1][0] >= 2
    assert out[2] == (1, False)
    assert out[3] == (0, False)


@pytest.mark.parametrize("method", ["broadcast", "shuffle"])
def test_segment_dedup_drops_boilerplate(spark, method):
    boiler = "click here to subscribe"
    rows = [
        (1, f"{boiler} unique one content"),
        (2, f"{boiler} other two payload"),
        (3, f"{boiler} third three thing"),
        (4, "clean document with no boilerplate at all"),
        (5, boiler),  # fully boilerplate → empty cleaned_text
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in C.segment_dedup(
            df, seg_tokens=4, max_doc_freq=2, method=method
        ).collect()
    }
    assert len(out) == 5
    # The 4-token boiler segment appears in 4 docs (> 2) → dropped.
    for i in (1, 2, 3):
        assert boiler not in out[i]["cleaned_text"]
        assert out[i]["n_dropped"] == 1
    assert out[4]["n_dropped"] == 0
    assert "clean document" in out[4]["cleaned_text"]
    assert out[5]["cleaned_text"] == ""
    assert out[5]["n_dropped"] == 1


def test_segment_dedup_methods_agree(spark):
    rows = [
        (i, f"shared head segment words unique tail {i} piece")
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(seg_tokens=4, max_doc_freq=2)
    a = sorted(
        C.segment_dedup(df, method="broadcast", **kw).collect()
    )
    b = sorted(C.segment_dedup(df, method="shuffle", **kw).collect())
    assert a == b


def test_segment_dedup_preserves_order(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l")], "doc_id long, text string"
    )
    [r] = C.segment_dedup(df, seg_tokens=4, max_doc_freq=5).collect()
    assert r["cleaned_text"] == "a b c d e f g h i j k l"
    assert r["n_segments"] == 3 and r["n_dropped"] == 0


def test_semantic_dedup(spark):
    # Two clusters around opposite corners; 1/2 near-identical (dup),
    # 3 distinct; 10/11 near-identical in the other cluster.
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),   # dup of 1 (cos ≈ 1)
        (3, [0.2, 0.9, 0.0]),      # same cluster, cos ≈ 0.2 vs 1
        (10, [-1.0, 0.0, 0.1]),
        (11, [-0.999, 0.0, 0.11]), # dup of 10
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centroids = [[1.0, 0.5, 0.0], [-1.0, 0.0, 0.0]]
    out = {
        r["vec_id"]: r
        for r in C.semantic_dedup(df, centroids, threshold=0.95).collect()
    }
    assert out[1]["kept"] and not out[2]["kept"]
    assert out[3]["kept"]
    assert out[10]["kept"] and not out[11]["kept"]
    assert out[1]["cluster"] == out[2]["cluster"] == out[3]["cluster"]
    assert out[10]["cluster"] == out[11]["cluster"] != out[1]["cluster"]


def test_mixture_rates():
    counts = {"web": 1000, "code": 100, "books": 50}
    # books is the bottleneck: 50/0.25 = 200 < 100/0.25=400 < 1000/0.5
    rates = C.mixture_rates(
        counts, {"web": 0.5, "code": 0.25, "books": 0.25}
    )
    assert rates["books"] == 1.0
    assert abs(rates["web"] - 100 / 1000) < 1e-12
    assert abs(rates["code"] - 50 / 100) < 1e-12
    # Missing domain → impossible mixture → loud ERROR (a silent
    # all-zero rate table empties the corpus on a domain-name typo).
    with pytest.raises(ValueError, match="absent"):
        C.mixture_rates(counts, {"web": 0.5, "absent": 0.5})


def test_mixture_sample_proportions_and_determinism(spark):
    rows = [(i, "web" if i < 2000 else "code") for i in range(2500)]
    df = spark.createDataFrame(rows, "id long, domain string")
    out1 = C.mixture_sample(df, "domain", {"web": 0.5, "code": 0.5}, "id")
    got = {
        r["domain"]: r["n"]
        for r in out1.groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # code is the bottleneck (500/0.5): keeps all 500; web samples to ~500.
    assert got["code"] == 500
    assert abs(got["web"] - 500) < 100  # hash-sample variance
    # Deterministic: re-run selects the identical row set.
    a = sorted(r["id"] for r in out1.collect())
    b = sorted(
        r["id"]
        for r in C.mixture_sample(
            df, "domain", {"web": 0.5, "code": 0.5}, "id"
        ).collect()
    )
    assert a == b


# ---------------------------------------------------------------------
# Property-based (hypothesis): random corpora vs plain-Python reference
# ---------------------------------------------------------------------

import math
from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WORDS = ["alpha", "Beta", "gamma", "DELTA", "eps", "zeta"]
_corpus = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12).map(
        " ".join
    ),
    min_size=1,
    max_size=10,
)


def _ref_segment_dedup(rows, k, max_df):
    """Plain-Python mirror of segment_dedup's semantics: fixed
    k-token windows, normalized (lower/trim) equality, a segment in
    more than max_df distinct docs is dropped everywhere."""
    segs_by_doc = {}
    for i, text in rows:
        toks = [t for t in text.strip().split() if t]
        n = max(math.ceil(len(toks) / k), 1)
        segs_by_doc[i] = [
            " ".join(toks[j * k : (j + 1) * k]) for j in range(n)
        ]
    docs_per = defaultdict(set)
    for i, segs in segs_by_doc.items():
        for s in segs:
            docs_per[s.strip().lower()].add(i)
    hot = {s for s, ds in docs_per.items() if len(ds) > max_df}
    return {
        i: (
            " ".join(s for s in segs if s.strip().lower() not in hot),
            len(segs),
            sum(1 for s in segs if s.strip().lower() in hot),
        )
        for i, segs in segs_by_doc.items()
    }


@SLOW
@given(
    texts=_corpus,
    k=st.integers(min_value=1, max_value=4),
    max_df=st.integers(min_value=1, max_value=3),
    method=st.sampled_from(["broadcast", "shuffle"]),
)
def test_segment_dedup_matches_python_reference(
    spark, texts, k, max_df, method
):
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.cleaned_text, r.n_segments, r.n_dropped)
        for r in C.segment_dedup(
            df, seg_tokens=k, max_doc_freq=max_df, method=method
        ).collect()
    }
    assert got == _ref_segment_dedup(rows, k, max_df)


@SLOW
@given(texts=_corpus, max_df=st.integers(min_value=1, max_value=3))
def test_segment_dedup_idempotent_token_segments(spark, texts, max_df):
    """With 1-token segments, after discarding docs left EMPTY by the
    first pass (the standard pipeline step after dedup), a second pass
    drops nothing: a surviving token's doc frequency can only have
    decreased, so no new segment crosses the max_doc_freq threshold.
    (Keeping empty docs breaks this — their synthesized "" floor
    segment can newly exceed the threshold as more docs empty out;
    hypothesis found exactly that. Not a theorem for k>1 either, where
    re-chunking realigns windows.)"""
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = (
        C.segment_dedup(df, seg_tokens=1, max_doc_freq=max_df)
        .filter(F.col("cleaned_text") != "")
    )
    again = C.segment_dedup(
        once.select(
            "doc_id", F.col("cleaned_text").alias("text")
        ),
        seg_tokens=1,
        max_doc_freq=max_df,
    )
    out = again.collect()
    assert all(r.n_dropped == 0 for r in out)
    first = {r.doc_id: r.cleaned_text for r in once.collect()}
    assert {r.doc_id: r.cleaned_text for r in out} == first


@SLOW
@given(
    counts=st.dictionaries(
        st.sampled_from(["web", "code", "books", "wiki"]),
        st.integers(min_value=1, max_value=10_000),
        min_size=1,
        max_size=4,
    ),
    weights=st.dictionaries(
        st.sampled_from(["web", "code", "books", "wiki"]),
        st.floats(min_value=0.05, max_value=1.0),
        min_size=1,
        max_size=4,
    ),
)
def test_mixture_rates_properties(counts, weights):
    """Pure-function invariants: rates in [0,1]; the bottleneck domain
    (smallest count/weight) keeps 100%; expected kept counts are
    proportional to the target weights for every domain with data."""
    if any(not counts.get(d) for d, w in weights.items() if w > 0):
        # Downsample-only cannot hit the target proportions when a
        # target domain has no data — must raise, never silently
        # produce an empty mixture.
        with pytest.raises(ValueError):
            C.mixture_rates(counts, weights)
        return
    rates = C.mixture_rates(counts, weights)
    assert set(rates) == set(weights)
    assert all(0.0 <= r <= 1.0 for r in rates.values())
    bottleneck = min(weights, key=lambda d: counts[d] / weights[d])
    assert rates[bottleneck] == pytest.approx(1.0)
    ratios = {
        d: rates[d] * counts[d] / weights[d] for d in weights
    }
    first = next(iter(ratios.values()))
    for v in ratios.values():
        assert v == pytest.approx(first, rel=1e-9)


@SLOW
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5_000),
            st.sampled_from(["web", "code", "books", "other"]),
        ),
        min_size=1,
        max_size=80,
        unique_by=lambda t: t[0],
    ),
)
def test_mixture_sample_deterministic_subset(spark, rows):
    """Sampling invariants that hold EXACTLY (no tolerance): output is
    a subset of input; domains without a target weight are dropped;
    the selected id set is identical under re-run and under a
    different partition layout (hash-threshold selection is
    layout-free)."""
    # Weight only the domains that actually occur in this generated
    # corpus (a zero-count target domain now raises by design).
    present = {d for _, d in rows}
    base = {"web": 0.5, "code": 0.3, "books": 0.2}
    weights = {d: w for d, w in base.items() if d in present}
    if not weights:
        return  # corpus is all "other" — nothing to target
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    pick = lambda d: {r.doc_id for r in d.collect()}  # noqa: E731
    got = pick(C.mixture_sample(df, "domain", weights, "doc_id"))
    assert got <= {i for i, _ in rows}
    dom = dict(rows and [(i, d) for i, d in rows])
    assert all(dom[i] != "other" for i in got)
    again = pick(C.mixture_sample(df, "domain", weights, "doc_id"))
    assert again == got
    repart = pick(
        C.mixture_sample(df.repartition(7), "domain", weights, "doc_id")
    )
    assert repart == got


# ---------------------------------------------------------------------
# Exact substring dedup (sliding k-gram repeats)
# ---------------------------------------------------------------------


def test_substring_dedup_any_alignment_and_within_doc(spark):
    """The repeated passage sits at DIFFERENT offsets in each doc (the
    case fixed-window segment dedup misses) and also repeats within a
    single doc; every covered token goes, overlaps merge."""
    from deftunes_spark.ext.curation import substring_dedup

    shared = "one two three four five six"
    docs = spark.createDataFrame(
        [
            (1, f"{shared} tail-a unique-a"),
            (2, f"lead-b {shared} tail-b"),
            # within-doc repeat, overlapping coverage:
            (3, f"{shared} {shared} solo-c"),
            (4, "entirely separate words nothing repeats here ever"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in substring_dedup(docs, k=6, min_repeat=2).collect()
    }
    assert out[1].cleaned_text == "tail-a unique-a"
    assert out[2].cleaned_text == "lead-b tail-b"
    assert out[3].cleaned_text == "solo-c"
    assert out[3].n_removed == 12
    assert out[4].cleaned_text.startswith("entirely separate")
    assert out[4].n_removed == 0


def test_substring_dedup_hash_paths_agree(spark):
    """xxhash64 (production) and md5 (oracle) paths excise identically
    — the hash only names the gram."""
    from deftunes_spark.ext.curation import substring_dedup

    docs = spark.createDataFrame(
        [
            (i, f"common run of tokens number {'x ' * (i % 3)}shared "
                f"common run of tokens number end{i}")
            for i in range(1, 8)
        ],
        "doc_id long, text string",
    )
    a = {
        r.doc_id: (r.cleaned_text, r.n_removed)
        for r in substring_dedup(docs, k=5, hash_fn="xxhash64").collect()
    }
    b = {
        r.doc_id: (r.cleaned_text, r.n_removed)
        for r in substring_dedup(docs, k=5, hash_fn="md5").collect()
    }
    assert a == b
    assert any(v[1] > 0 for v in a.values())


def test_substring_dedup_short_docs_pass_through(spark):
    """Docs shorter than k tokens contribute no grams and survive
    unchanged (even if identical to each other — exact_dedup's job)."""
    from deftunes_spark.ext.curation import substring_dedup

    docs = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc"), (3, "")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in substring_dedup(docs, k=6).collect()
    }
    assert out[1].cleaned_text == "tiny doc"
    assert out[2].n_removed == 0
    assert out[3].cleaned_text == "" and out[3].n_tokens == 0


def test_mixture_temperature_flattens_toward_uniform(spark):
    """τ=0 equalizes domain counts (up to bucket granularity); τ=1 is
    the identity (natural mixture == target); 0<τ<1 sits between:
    tail domains keep a HIGHER fraction than head domains."""
    from deftunes_spark.ext.curation import mixture_sample_temperature

    rows = [(i, "head") for i in range(400)] + [
        (10_000 + i, "tail") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    tau1 = mixture_sample_temperature(df, "source", 1.0, "doc_id")
    assert tau1.count() == 500  # identity: every row kept

    tau0 = {
        r.source: r.n
        for r in mixture_sample_temperature(df, "source", 0.0, "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # Equal targets: head downsamples toward the tail's 100 rows.
    assert tau0["tail"] == 100
    assert abs(tau0["head"] - 100) <= 20  # md5-bucket granularity

    tau_half = {
        r.source: r.n
        for r in mixture_sample_temperature(df, "source", 0.5, "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    keep_head = tau_half["head"] / 400
    keep_tail = tau_half["tail"] / 100
    assert keep_tail == 1.0 and keep_head < 1.0  # tail favored
    # τ=0.5 target ratio head:tail = sqrt(400):sqrt(100) = 2:1.
    assert abs(tau_half["head"] / tau_half["tail"] - 2.0) < 0.3


def test_mixture_temperature_deterministic_rerun(spark):
    from deftunes_spark.ext.curation import mixture_sample_temperature

    rows = [(i, f"s{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    a = {r.doc_id for r in mixture_sample_temperature(df, "source", 0.3, "doc_id").collect()}
    b = {r.doc_id for r in mixture_sample_temperature(df.repartition(7), "source", 0.3, "doc_id").collect()}
    assert a == b and a


def test_segment_dedup_null_text_both_shapes_agree(spark):
    """A NULL-text row must neither crash the large-hot-set UDF shape
    nor diverge from the literal-array shape (regression: ' '.join on
    a NULL segment raised TypeError once the hot set crossed
    literal_max)."""
    from deftunes_spark.ext.curation import segment_dedup

    rows = [(i, "alpha beta gamma delta " * 3) for i in range(6)]
    rows += [(97, None), (98, "unique text here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {}
    for lit_max in (256, 0):  # literal-array shape, then UDF shape
        got = {
            r.doc_id: (r.cleaned_text, r.n_segments, r.n_dropped)
            for r in segment_dedup(
                df, "doc_id", "text", seg_tokens=4, max_doc_freq=2,
                literal_max=lit_max,
            ).collect()
        }
        out[lit_max] = got
    assert out[256] == out[0]
    assert 97 in out[0]  # null row survives end-to-end


def test_semantic_dedup_grouped_matches_expr(spark):
    """The blocked-BLAS grouped kernel and the pure-expression engine
    must make IDENTICAL keep/drop decisions — including pairs with
    similarity near the threshold (cross-checked by planting exact
    duplicates, near-duplicates, and orthogonal vectors)."""
    import numpy as np

    from deftunes_spark.ext.curation import semantic_dedup

    rng = np.random.RandomState(3)
    dim = 16
    base = rng.randn(40, dim)
    rows = []
    vid = 0
    for i in range(40):
        rows.append((vid, [float(x) for x in base[i]])); vid += 1
        if i % 4 == 0:  # exact duplicate
            rows.append((vid, [float(x) for x in base[i]])); vid += 1
        if i % 5 == 0:  # near duplicate (tiny perturbation)
            p = base[i] + rng.randn(dim) * 1e-3
            rows.append((vid, [float(x) for x in p])); vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [[float(x) for x in c] for c in rng.randn(4, dim)]
    got = {}
    for method in ("grouped", "expr"):
        got[method] = {
            r.vec_id: (r.cluster, r.kept)
            for r in semantic_dedup(
                df, cents, threshold=0.98, method=method
            ).collect()
        }
    assert got["grouped"] == got["expr"]
    # The planted exact dups must actually be dropped (same cluster,
    # cosine 1.0) — the test has teeth.
    dropped = [v for v, (_, k) in got["grouped"].items() if not k]
    assert len(dropped) >= 10


def test_semantic_dedup_grouped_blocking(spark):
    """Column blocking must not change decisions (block smaller than
    the cluster forces the multi-block path)."""
    import numpy as np

    from deftunes_spark.ext.curation import (
        _semantic_dominated_grouped,
        semantic_dedup,
    )
    from deftunes_spark.ext.similarity import ivf_assign

    rng = np.random.RandomState(7)
    dim = 8
    V = rng.randn(30, dim)
    V[10] = V[3]; V[20] = V[3] + 1e-4  # planted dup chain
    df = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    cents = [[0.0] * dim]  # ONE cluster: everything pairs
    assigned = ivf_assign(df, cents, "embedding", "cluster").select(
        "vec_id", "embedding", "cluster"
    )
    small = {
        r.vec_id
        for r in _semantic_dominated_grouped(
            assigned, "vec_id", "embedding", 0.99, block=7
        ).collect()
    }
    big = {
        r.vec_id
        for r in _semantic_dominated_grouped(
            assigned, "vec_id", "embedding", 0.99, block=4096
        ).collect()
    }
    assert small == big
    assert {10, 20} <= small
