"""nlist ∝ corpus as engineered behavior: ivf_index(n_lists="auto")
must scale the quantizer with the row count so expected inverted-list
size stays bounded — the scale rule the 10x stress identified as the
one remaining linear-growth risk."""

from __future__ import annotations

import numpy as np
import pytest


def _emb(spark, n, dim=8, seed=0):
    rng = np.random.RandomState(seed)
    rows = [
        (i, [float(x) for x in rng.randn(dim)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_auto_nlist_scales_with_corpus(spark):
    from deftunes_spark.ext.similarity import ivf_index

    small = _emb(spark, 200)
    big = _emb(spark, 2000)
    _, c_small = ivf_index(small, n_lists="auto", target_list_rows=100)
    _, c_big = ivf_index(big, n_lists="auto", target_list_rows=100)
    assert len(c_small) == 8  # max(8, ceil(200/100)) floor
    assert len(c_big) == 20  # ceil(2000/100)


def test_auto_nlist_bounds_mean_cluster_rows(spark):
    """The engineered invariant: mean rows per cluster stays near the
    target as the corpus grows 4x (k-means balance is statistical, so
    assert the mean, and a loose cap on the max)."""
    from deftunes_spark.ext.similarity import ivf_index

    for n in (500, 2000):
        assigned, cents = ivf_index(
            _emb(spark, n, seed=1), n_lists="auto", target_list_rows=100
        )
        sizes = [
            r["count"]
            for r in assigned.groupBy("ivf_list").count().collect()
        ]
        assert sum(sizes) == n
        assert sum(sizes) / len(cents) <= 100 + 1
        assert max(sizes) <= 10 * 100  # no runaway megacluster


def test_auto_nlist_clamped_to_tiny_corpus(spark):
    from deftunes_spark.ext.similarity import ivf_index

    tiny = _emb(spark, 3)
    assigned, cents = ivf_index(tiny, n_lists="auto")
    assert len(cents) <= 3
    assert assigned.count() == 3


def test_auto_rejects_bad_args(spark):
    from deftunes_spark.ext.similarity import ivf_index

    with pytest.raises(ValueError, match="n_lists"):
        ivf_index(_emb(spark, 10), n_lists="adaptive")
    with pytest.raises(ValueError, match="target_list_rows"):
        ivf_index(_emb(spark, 10), n_lists="auto", target_list_rows=0)


def test_semantic_dedup_auto_end_to_end(spark):
    """centroids='auto' trains in-operator and still yields the
    one-row-per-vector (cluster, kept) contract, with exact dup pairs
    (identical vectors) deduped to the min id."""
    from deftunes_spark.ext.curation import semantic_dedup

    rng = np.random.RandomState(7)
    base = [[float(x) for x in rng.randn(8)] for _ in range(50)]
    rows = [(i, base[i]) for i in range(50)]
    rows += [(100 + i, base[i]) for i in range(10)]  # exact dups
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = semantic_dedup(
        df, "auto", threshold=0.999, target_cluster_rows=20
    ).collect()
    assert len(out) == 60
    kept = {r.vec_id for r in out if r.kept}
    # Identical vectors always share a cluster (argmin over the same
    # distances), so each dup pair keeps exactly the lower id.
    for i in range(10):
        assert i in kept and (100 + i) not in kept


def test_knn_join_finds_identical_vectors_first(spark):
    """Identical vectors share a cluster and rank each other #1 with
    cosine 1.0; zero-norm rows never appear on either side."""
    from deftunes_spark.ext.similarity import knn_join

    import numpy as np

    rng = np.random.RandomState(3)
    cents = [[float(x) for x in rng.randn(4)] for _ in range(2)]
    base = [[float(x) for x in rng.randn(4)] for _ in range(20)]
    rows = [(i, base[i]) for i in range(20)]
    rows.append((100, base[0]))  # exact twin of vec 0
    rows.append((200, [0.0, 0.0, 0.0, 0.0]))  # zero norm
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = knn_join(df, cents, k=2)
    rows_out = out.collect()
    ids = {r.vec_id for r in rows_out}
    neigh = {r.neighbor_id for r in rows_out}
    assert 200 not in ids and 200 not in neigh
    top = {
        r.vec_id: r.neighbor_id for r in rows_out if r.rank == 1
    }
    assert top[0] == 100 and top[100] == 0
    import pytest as _pt

    sim1 = {
        (r.vec_id, r.neighbor_id): r.cosine_sim for r in rows_out
    }
    assert sim1[(0, 100)] == _pt.approx(1.0, abs=1e-6)
    with _pt.raises(ValueError):
        knn_join(df, cents, k=0)


def test_knn_grouped_matches_expr_path(spark):
    """The BLAS kernel and the expr/oracle path must produce the same
    (id, neighbor, rounded sim, rank) rows on separated vectors."""
    from deftunes_spark.ext.similarity import knn_join, knn_join_grouped

    import numpy as np

    rng = np.random.RandomState(11)
    cents = [[float(x) for x in rng.randn(6)] for _ in range(3)]
    rows = [
        (i, [float(x) for x in rng.randn(6)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    a = sorted(map(tuple, knn_join(df, cents, k=3).collect()))
    b = sorted(map(tuple, knn_join_grouped(df, cents, k=3).collect()))
    assert a == b


def test_knn_grouped_never_self_matches_duplicate_ids(spark):
    """Two rows sharing a vec_id must not become each other's (or
    their own) neighbor on EITHER path — the expr join's id != id
    drops them; the grouped kernel masks all equal-id columns."""
    from deftunes_spark.ext.similarity import knn_join, knn_join_grouped

    import numpy as np

    rng = np.random.RandomState(5)
    cents = [[0.0] * 4]
    rows = [(i, [float(x) for x in rng.randn(4)]) for i in range(8)]
    rows.append((3, [float(x) for x in rng.randn(4)]))  # dup id 3
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    for fn in (knn_join, knn_join_grouped):
        out = fn(df, cents, k=2).collect()
        assert all(r.vec_id != r.neighbor_id for r in out), fn.__name__
