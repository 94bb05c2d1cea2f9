"""source_overlap_minhash ε-accuracy against the exact operator: the
KMV sketch must reproduce containment / Jaccard / cardinalities within
the 1/√k statistical envelope, on both a controlled synthetic corpus
and the real sf0.01 documents table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def _collect(df):
    return {
        (r.group_a, r.group_b): r
        for r in df.collect()
    }


def test_sketch_matches_exact_on_synthetic(spark):
    """Three sources with engineered overlap: B ⊂ A (containment 1),
    C disjoint. Vocabulary >> k so the sketch actually estimates."""
    from deftunes_spark.ext.curation import (
        source_overlap,
        source_overlap_minhash,
    )

    def doc(lo, hi):
        return " ".join(f"w{i}" for i in range(lo, hi))

    rows = []
    for d in range(40):
        rows.append((f"a{d}", "A", doc(d * 100, d * 100 + 103)))
    for d in range(10):
        rows.append((f"b{d}", "B", doc(d * 100, d * 100 + 103)))
    for d in range(20):
        rows.append((f"c{d}", "C", doc(50_000 + d * 100, 50_000 + d * 100 + 103)))
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    exact = _collect(source_overlap(df, "source", "text", n=3))
    est = _collect(source_overlap_minhash(df, "source", "text", n=3, k=256))
    assert set(exact) == set(est)
    for key, e in exact.items():
        s = est[key]
        assert s.jaccard == pytest.approx(e.jaccard, abs=0.08)
        assert s.containment == pytest.approx(e.containment, abs=0.12)
        # KMV cardinality σ ≈ n/√k (~6% at k=256); the single fixed
        # hash permutation is one deterministic draw, so the bound is
        # 3σ, not 1σ.
        for f in ("n_a", "n_b"):
            assert getattr(s, f) == pytest.approx(
                getattr(e, f), rel=0.20
            )
    ab = est[("A", "B")]
    assert ab.containment == pytest.approx(1.0, abs=0.05)  # B inside A
    # Disjoint pairs are ABSENT, matching the exact operator's inner
    # shingle join (no zero-overlap rows).
    assert ("A", "C") not in est and ("B", "C") not in est


def test_sketch_exact_when_unsaturated(spark):
    """Vocabulary < k: the sketch IS the distinct-shingle set, so
    every number must equal the exact operator's."""
    from deftunes_spark.ext.curation import (
        source_overlap,
        source_overlap_minhash,
    )

    rows = [
        ("a1", "A", "x y z w q r"),
        ("b1", "B", "x y z k l m"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    exact = _collect(source_overlap(df, "source", "text", n=3))
    est = _collect(source_overlap_minhash(df, "source", "text", n=3, k=256))
    for key, e in exact.items():
        s = est[key]
        assert (s.n_shared, s.n_a, s.n_b) == (e.n_shared, e.n_a, e.n_b)
        assert s.jaccard == e.jaccard
        assert s.containment == e.containment


def test_sketch_epsilon_on_sf001_documents(spark):
    """The driver fixture: every pair's Jaccard within ±0.08 and
    containment within ±0.12 of exact; cardinalities within 15%."""
    import os

    if not os.path.exists(f"{SF_DIR}/documents.parquet"):
        pytest.skip("testdata not present")
    from deftunes_spark.ext.curation import (
        source_overlap,
        source_overlap_minhash,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    exact = _collect(source_overlap(docs, "source", "text", n=3))
    est = _collect(
        source_overlap_minhash(docs, "source", "text", n=3, k=256)
    )
    assert set(exact) == set(est)
    for key, e in exact.items():
        s = est[key]
        assert s.jaccard == pytest.approx(e.jaccard, abs=0.08), key
        assert s.containment == pytest.approx(
            e.containment, abs=0.12
        ), key
        assert s.n_a == pytest.approx(e.n_a, rel=0.15), key
        assert s.n_b == pytest.approx(e.n_b, rel=0.15), key


def test_md5_variant_epsilon_and_parity(spark):
    """hash_fn="md5" (the oracle family, r10 verdict #8) carries the
    identical estimator algebra: same pair set as the xxhash64 twin,
    same ε-envelope vs exact. The two hash families are independent
    permutations, so values agree statistically, not bitwise."""
    from deftunes_spark.ext.curation import (
        source_overlap,
        source_overlap_minhash,
    )

    def doc(lo, hi):
        return " ".join(f"w{i}" for i in range(lo, hi))

    rows = []
    for d in range(40):
        rows.append((f"a{d}", "A", doc(d * 100, d * 100 + 103)))
    for d in range(10):
        rows.append((f"b{d}", "B", doc(d * 100, d * 100 + 103)))
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    exact = _collect(source_overlap(df, "source", "text", n=3))
    md5 = _collect(
        source_overlap_minhash(df, "source", "text", n=3, k=256,
                               hash_fn="md5")
    )
    xxh = _collect(source_overlap_minhash(df, "source", "text", n=3, k=256))
    assert set(exact) == set(md5) == set(xxh)
    for key, e in exact.items():
        s = md5[key]
        assert s.jaccard == pytest.approx(e.jaccard, abs=0.08)
        assert s.containment == pytest.approx(e.containment, abs=0.12)
        for f in ("n_a", "n_b"):
            assert getattr(s, f) == pytest.approx(
                getattr(e, f), rel=0.20
            )


def test_md5_variant_rejects_unknown_hash(spark):
    from deftunes_spark.ext.curation import source_overlap_minhash

    df = spark.createDataFrame(
        [("a", "A", "x y z")], ["doc_id", "source", "text"]
    )
    with pytest.raises(ValueError):
        source_overlap_minhash(df, "source", "text", hash_fn="sha1")
