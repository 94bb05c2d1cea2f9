"""Hot-cluster guard (r6 verdict directive #1): a duplicate-mass
corpus — the canonical dedup input — puts its entire identical-vector
mass in ONE k-means cluster, which nlist ∝ corpus cannot split. The
grouped-BLAS kernels must salt such clusters into bounded pair blocks
and two-stage-merge, with results identical to the unsplit/expr
paths."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _dup_mass_rows(n: int, dim: int, dup_frac: float, seed: int):
    """n vectors, >= dup_frac of them EXACTLY identical (plus noise
    rows), unique integer ids — k-means can never split the mass."""
    rng = np.random.RandomState(seed)
    n_dup = max(2, int(n * dup_frac))
    proto = rng.randn(dim)
    rows = []
    for i in range(n):
        if i < n_dup:
            v = proto
        else:
            v = rng.randn(dim)
        rows.append((i, [float(x) for x in v]))
    return rows


@pytest.fixture(scope="module")
def dup_mass_df(spark):
    return spark.createDataFrame(
        _dup_mass_rows(60, 8, 0.5, seed=11),
        "vec_id long, embedding array<double>",
    ).cache()


_ONE_CLUSTER = [[0.0] * 8]  # everything lands in cluster 0


def test_knn_split_parity_on_duplicate_mass(spark, dup_mass_df):
    """knn_join_grouped with a cap small enough to force an 8-way
    sub-split must return EXACTLY the expr path's rows — ids, sims,
    and ranks — on a 50%-identical fixture."""
    from deftunes_spark.ext.similarity import knn_join, knn_join_grouped

    expr_rows = sorted(
        map(tuple, knn_join(dup_mass_df, _ONE_CLUSTER, k=3).collect())
    )
    split_rows = sorted(
        map(
            tuple,
            knn_join_grouped(
                dup_mass_df, _ONE_CLUSTER, k=3, max_cluster_rows=8
            ).collect(),
        )
    )
    assert split_rows == expr_rows
    assert len(split_rows) == 60 * 3  # every row finds 3 neighbors


def test_knn_split_matches_unsplit(spark, dup_mass_df):
    """Cap >> cluster size (no split) and cap << cluster size (8-way
    split) must agree row-for-row."""
    from deftunes_spark.ext.similarity import knn_join_grouped

    unsplit = sorted(
        map(
            tuple,
            knn_join_grouped(
                dup_mass_df, _ONE_CLUSTER, k=3, max_cluster_rows=50_000
            ).collect(),
        )
    )
    split = sorted(
        map(
            tuple,
            knn_join_grouped(
                dup_mass_df, _ONE_CLUSTER, k=3, max_cluster_rows=8
            ).collect(),
        )
    )
    assert unsplit == split


def test_semantic_dedup_split_parity_on_duplicate_mass(
    spark, dup_mass_df
):
    """semantic_dedup grouped-with-split vs the expr path: identical
    kept flags on the 50%-identical fixture; all but the min-id
    member of the identical mass dropped."""
    from deftunes_spark.ext.curation import semantic_dedup

    def flags(**kw):
        return {
            r.vec_id: r.kept
            for r in semantic_dedup(
                dup_mass_df,
                _ONE_CLUSTER,
                threshold=0.95,
                **kw,
            ).collect()
        }

    expr = flags(method="expr")
    split = flags(method="grouped", max_cluster_rows=8)
    assert split == expr
    # The identical mass is ids 0..29: only id 0 survives of those.
    assert split[0] is True
    assert all(split[i] is False for i in range(1, 30))


def test_pair_blocks_bounded_per_task(spark, dup_mass_df):
    """The fan-out itself must bound per-group rows: with cap=8 on a
    60-row cluster the worst group holds one left salt + one right
    salt of rows — far under the unsplit 60 — and the split actually
    engages (ns > 1 => several groups)."""
    from deftunes_spark.ext.similarity import (
        _salted_pair_blocks,
        ivf_assign,
    )

    assigned = ivf_assign(
        dup_mass_df, _ONE_CLUSTER, "embedding", "cluster"
    ).select("vec_id", "embedding", "cluster")
    sizes = (
        _salted_pair_blocks(assigned, "vec_id", "embedding", 8)
        .groupBy("cluster", "_gl", "_gr")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    assert len(sizes) > 1  # split engaged
    # Salt imbalance allows some spread; 3x the cap is a hard ceiling
    # for hash-salted 60 rows over ceil(60/8)=8 salts.
    assert max(r.c for r in sizes) <= 3 * 8
    # Every cross pair is covered exactly once: sum of |L|x|R| over
    # blocks equals n^2 (diagonal blocks include self-pairs which the
    # kernels mask by id).
    per_salt = (
        assigned.withColumn(
            "_s",
            F.pmod(F.xxhash64(F.col("vec_id")), F.lit(8)).cast("int"),
        )
        .groupBy("_s")
        .count()
        .collect()
    )
    counts = {r._s: r["count"] for r in per_salt}
    expect_pairs = sum(
        counts[a] * counts[b] for a in counts for b in counts
    )
    assert expect_pairs == 60 * 60


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n=st.integers(min_value=10, max_value=50),
    dim=st.integers(min_value=3, max_value=8),
    k=st.integers(min_value=1, max_value=5),
    cap=st.integers(min_value=2, max_value=12),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_hot_cluster_parity_property(spark, n, dim, k, cap, seed):
    """Property: for ANY duplicate-heavy fixture and ANY cap, the
    split grouped kernels equal their expr twins exactly."""
    from deftunes_spark.ext.curation import semantic_dedup
    from deftunes_spark.ext.similarity import knn_join, knn_join_grouped

    df = spark.createDataFrame(
        _dup_mass_rows(n, dim, 0.5, seed),
        "vec_id long, embedding array<double>",
    )
    cents = [[0.0] * dim]
    expr_knn = sorted(map(tuple, knn_join(df, cents, k=k).collect()))
    split_knn = sorted(
        map(
            tuple,
            knn_join_grouped(
                df, cents, k=k, max_cluster_rows=cap
            ).collect(),
        )
    )
    assert split_knn == expr_knn
    expr_sd = {
        r.vec_id: r.kept
        for r in semantic_dedup(df, cents, 0.9, method="expr").collect()
    }
    split_sd = {
        r.vec_id: r.kept
        for r in semantic_dedup(
            df, cents, 0.9, method="grouped", max_cluster_rows=cap
        ).collect()
    }
    assert split_sd == expr_sd


def test_short_circuit_skips_guard_stages(spark, dup_mass_df):
    """r7 verdict #2: when no cluster can exceed the cap, the guard's
    fan-out + merge window must not appear in the plan (ranks come
    from the kernel); with a sub-cap it must."""
    from deftunes_spark.ext.similarity import knn_join_grouped

    fast = knn_join_grouped(
        dup_mass_df, _ONE_CLUSTER, k=3, max_cluster_rows=1000
    )
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    guarded = knn_join_grouped(
        dup_mass_df, _ONE_CLUSTER, k=3, max_cluster_rows=8
    )
    plan_g = guarded._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan_g


def test_short_circuit_knn_parity(spark, dup_mass_df):
    """Short-circuited (cap above corpus) and guarded (tiny cap) runs
    return identical rows including rank."""
    from deftunes_spark.ext.similarity import knn_join_grouped

    fast = sorted(
        map(
            tuple,
            knn_join_grouped(
                dup_mass_df, _ONE_CLUSTER, k=3, max_cluster_rows=1000
            ).collect(),
        )
    )
    guarded = sorted(
        map(
            tuple,
            knn_join_grouped(
                dup_mass_df, _ONE_CLUSTER, k=3, max_cluster_rows=8
            ).collect(),
        )
    )
    assert fast == guarded
