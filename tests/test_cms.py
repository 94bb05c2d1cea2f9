"""Count-min sketch properties: one-sided error (estimates never
undercount), exact recovery when the sketch is collision-free, and the
sample→sketch heavy-hitter composition finding the true head."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _items(spark):
    # Zipf-ish: item "h0" appears 60x, "h1" 30x, tail 50 singletons.
    rows = []
    rid = 0
    for _ in range(60):
        rows.append((rid, "h0")); rid += 1
    for _ in range(30):
        rows.append((rid, "h1")); rid += 1
    for i in range(50):
        rows.append((rid, f"tail{i}")); rid += 1
    return spark.createDataFrame(rows, ["doc_id", "item"])


def test_cms_never_undercounts(spark):
    from deftunes_spark.ext.profile import cms_build, cms_estimate

    df = _items(spark)
    truth = {
        r.item: r.cnt
        for r in df.groupBy("item").agg(F.count("*").alias("cnt")).collect()
    }
    sketch = cms_build(df.select("item"), "item", depth=3, width=64)
    est = cms_estimate(
        df.select("item").distinct(), sketch, "item", depth=3, width=64
    )
    for r in est.collect():
        assert r.est_count >= truth[r.item], r.item


def test_cms_exact_when_wide(spark):
    """Width >> distinct items: collisions vanish, estimates exact."""
    from deftunes_spark.ext.profile import cms_build, cms_estimate

    df = _items(spark)
    truth = {
        r.item: r.cnt
        for r in df.groupBy("item").agg(F.count("*").alias("cnt")).collect()
    }
    sketch = cms_build(df.select("item"), "item", depth=3, width=8192)
    est = cms_estimate(
        df.select("item").distinct(), sketch, "item", depth=3, width=8192
    )
    got = {r.item: r.est_count for r in est.collect()}
    assert got == truth


def test_heavy_hitters_finds_true_head(spark):
    from deftunes_spark.ext.profile import heavy_hitters_cms

    df = _items(spark)
    top = heavy_hitters_cms(
        df, "doc_id", "item", k=2, depth=3, width=4096,
        sample_hex_threshold="80000000",  # ~50% sample
    ).collect()
    assert [r.item for r in top] == ["h0", "h1"]
    assert top[0].est_count >= 60 and top[1].est_count >= 30


def test_cms_validation(spark):
    from deftunes_spark.ext.profile import cms_build, heavy_hitters_cms

    df = _items(spark)
    with pytest.raises(ValueError):
        cms_build(df.select("item"), "item", depth=0)
    with pytest.raises(ValueError):
        heavy_hitters_cms(df, "doc_id", "item", k=0)


# ---------------------------------------------------------------------
# Weighted sampling (ext.sampling.weighted_sample)
# ---------------------------------------------------------------------


def test_weighted_sample_props(spark):
    from deftunes_spark.ext.sampling import weighted_sample

    rows = [(i, 1.0 if i else 1e9) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    out = weighted_sample(df, "doc_id", "w", k=10).collect()
    assert len(out) == 10
    # The ~infinite-weight row's clock fires ~immediately: always in.
    assert 0 in {r.doc_id for r in out}
    # Deterministic under re-execution / repartitioning.
    out2 = weighted_sample(
        df.repartition(13), "doc_id", "w", k=10
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_weighted_sample_excludes_nonpositive(spark):
    from deftunes_spark.ext.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 2.0), (2, 0.0), (3, -1.0), (4, None)],
        ["doc_id", "w"],
    )
    out = weighted_sample(df, "doc_id", "w", k=10).collect()
    assert [r.doc_id for r in out] == [1]
