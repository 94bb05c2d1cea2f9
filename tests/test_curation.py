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
    # Missing domain → impossible mixture → empty selection.
    assert set(
        C.mixture_rates(counts, {"web": 0.5, "absent": 0.5}).values()
    ) == {0.0}


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
