import numpy as np
import pytest

from deftunes_spark.ext import similarity as S


@pytest.fixture(scope="module")
def vectors(spark):
    """3 gaussian clusters in 16d, 120 vectors, deterministic."""
    rng = np.random.RandomState(7)
    centers = rng.randn(3, 16) * 3
    rows = []
    for i in range(120):
        c = i % 3
        v = centers[c] + rng.randn(16) * 0.3
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    return df, rows


def _exact_topk(rows, q, k):
    qv = np.asarray(q)
    sims = []
    for vid, v in rows:
        x = np.asarray(v)
        sims.append(
            (float(qv @ x / (np.linalg.norm(qv) * np.linalg.norm(x))), vid)
        )
    sims.sort(key=lambda t: (-t[0], t[1]))
    return [vid for _, vid in sims[:k]]


def test_brute_force_topk_matches_numpy(vectors):
    df, rows = vectors
    q = rows[5][1]
    got = [r.vec_id for r in S.cosine_topk(df, q, k=10).collect()]
    assert got == _exact_topk(rows, q, 10)


def test_ann_recall(vectors):
    df, rows = vectors
    q = rows[11][1]
    exact = set(_exact_topk(rows, q, 10))
    approx = {
        r.vec_id
        for r in S.ann_topk(df, q, k=10, n_bits=8, n_probes=4).collect()
    }
    # Multi-probe LSH over clustered data: high recall expected.
    assert len(exact & approx) >= 7


def test_neardup_pairs_planted(spark):
    rng = np.random.RandomState(3)
    base = rng.randn(16)
    rows = [(0, [float(x) for x in base]),
            (1, [float(x) for x in base * 1.001])]  # same direction
    for i in range(2, 40):
        rows.append((i, [float(x) for x in rng.randn(16)]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = S.cosine_neardup_pairs(df, threshold=0.99, n_bits=6)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 1) in found
    assert all({a, b} == {0, 1} for a, b in found)


def test_norm_expr_matches_numpy(spark, vectors):
    df, rows = vectors
    from pyspark.sql import functions as F

    got = df.select(
        "vec_id", S.norm_expr(F.col("embedding")).alias("n")
    ).first()
    expected = float(np.linalg.norm(np.asarray(rows[0][1])))
    assert abs(got.n - expected) < 1e-9


def test_ivf_recall(vectors):
    df, rows = vectors
    q = rows[23][1]
    assigned, centroids = S.ivf_index(df, n_lists=6, max_iter=8)
    exact = set(_exact_topk(rows, q, 10))
    approx = {
        r.vec_id
        for r in S.ivf_topk(assigned, centroids, q, k=10, n_probe=2).collect()
    }
    # The query's own cluster must land in the probed lists: on 3
    # well-separated gaussian clusters recall should be near-perfect.
    assert len(exact & approx) >= 9


def test_ivf_lists_partition_data(vectors):
    df, _ = vectors
    assigned, centroids = S.ivf_index(df, n_lists=6, max_iter=8)
    assert assigned.count() == 120
    assert len(centroids) == 6
    n_lists_used = assigned.select("ivf_list").distinct().count()
    assert 2 <= n_lists_used <= 6
