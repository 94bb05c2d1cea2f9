"""Regression tests for the round-8 advisor findings: arrow/expr
null-semantics parity in ivf_assign, the sft_role_audit whitespace
class, guard-probe counts reuse, and the incremental ANN store's
first-run init race."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F


def _assigned_lists(df, id_col="vec_id"):
    return {
        r[id_col]: r["ivf_list"]
        for r in df.select(id_col, "ivf_list").collect()
    }


def test_ivf_assign_arrow_null_semantics_match_expr(spark):
    """r8 advice #1: a NULL embedding (or a vector whose length
    differs from the centroid dim) must assign NULL on BOTH methods —
    the arrow path used to crash on the object-array matmul, a
    failure-mode switch that method='auto' flips silently at scale."""
    from deftunes_spark.ext.similarity import ivf_assign

    cents = [[0.0, 0.0], [10.0, 10.0]]
    df = spark.createDataFrame(
        [
            (1, [0.1, 0.2]),
            (2, None),
            (3, [9.0, 9.0]),
            (4, [1.0]),          # ragged: shorter than dim
            (5, [1.0, 2.0, 3.0]),  # ragged: longer than dim
        ],
        "vec_id long, embedding array<double>",
    )
    got_e = _assigned_lists(ivf_assign(df, cents, method="expr"))
    got_a = _assigned_lists(ivf_assign(df, cents, method="arrow"))
    assert got_e == {1: 0, 2: None, 3: 1, 4: None, 5: None}
    assert got_a == got_e


def test_ivf_assign_arrow_empty_input(spark):
    """Empty batches must yield a typed empty result, not a 1-D
    matmul operand error."""
    from deftunes_spark.ext.similarity import ivf_assign

    df = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    out = ivf_assign(df, [[0.0, 0.0], [1.0, 1.0]], method="arrow")
    assert out.count() == 0
    # all-NULL batch exercises the no-valid-rows branch
    df2 = spark.createDataFrame(
        [(1, None), (2, None)], "vec_id long, embedding array<double>"
    )
    got = _assigned_lists(
        ivf_assign(df2, [[0.0, 0.0], [1.0, 1.0]], method="arrow")
    )
    assert got == {1: None, 2: None}


def test_sft_role_audit_flags_tab_newline_only_turns(spark):
    """r8 advice #2: a tab/newline-only turn is zero-token under the
    repo-wide whitespace class and must count as empty — F.trim
    (ASCII-space-only) let it pass n_empty while contributing 0
    tokens, so a zero-token 'trainable' turn could carry
    audit_ok=true into training."""
    from deftunes_spark.ext.sft import sft_role_audit

    df = spark.createDataFrame(
        [
            (1, [("user", "hi"), ("assistant", "\t\n")]),
            (2, [("user", "hi"), ("assistant", " ")]),
            (3, [("user", "hi"), ("assistant", "ok")]),
        ],
        "dialog_id long, messages array<struct<role:string,"
        "content:string>>",
    )
    rows = {
        r["dialog_id"]: r for r in sft_role_audit(df).collect()
    }
    assert rows[1]["n_empty"] == 1 and not rows[1]["audit_ok"]
    assert rows[2]["n_empty"] == 1 and not rows[2]["audit_ok"]
    assert rows[3]["n_empty"] == 0 and rows[3]["audit_ok"]
    # invariant the advice names: zero-token turns are NEVER unflagged
    assert rows[1]["total_tokens"] == 1  # only the "hi"


def test_guard_probe_returns_materialized_counts(spark):
    """r8 advice #3 (+ r9 review): when the guard engages, the probe
    must hand _salted_pair_blocks an ALREADY-MATERIALIZED counts
    relation — driver-collected over-cap slice, no CacheManager pin
    to leak — so the dominant assignment compute does not run a third
    time. Under-cap clusters carry no row (their salt count is 1 by
    construction) and the sparse LEFT join reproduces the full guard
    output."""
    from deftunes_spark.ext.similarity import (
        _cluster_guard_probe,
        _salted_pair_blocks,
    )

    df = spark.createDataFrame(
        [(i, [float(i % 3), 0.0]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    assigned = df.withColumn(
        "cluster", (F.col("vec_id") % 2).cast("int")
    )
    needs, counts = _cluster_guard_probe(df, assigned, cap=8)
    assert needs is True
    assert counts is not None
    assert not counts.storageLevel.useMemory  # local, never pinned
    got = {r["cluster"]: r["_crows"] for r in counts.collect()}
    assert got == {0: 20, 1: 20}
    # sparse-counts path == full-counts path, block for block
    cols = ["cluster", "_gl", "_gr", "vec_id", "_role"]
    full = {
        tuple(r)
        for r in _salted_pair_blocks(
            assigned, "vec_id", "embedding", 8
        ).select(*cols).collect()
    }
    sparse = {
        tuple(r)
        for r in _salted_pair_blocks(
            assigned, "vec_id", "embedding", 8, counts=counts
        ).select(*cols).collect()
    }
    assert sparse == full
    # a sparse table that OMITS an under-cap cluster still salts it 1:
    small = assigned.filter(F.col("cluster") == 0).limit(3)
    mixed = small.unionByName(
        assigned.filter(F.col("cluster") == 1)
    )
    over_only = counts.filter(F.col("cluster") == 1)
    blocks = _salted_pair_blocks(
        mixed, "vec_id", "embedding", 8, counts=over_only
    )
    c0 = blocks.filter(F.col("cluster") == 0)
    assert c0.count() == 3  # ns=1: one diagonal row per input row
    assert {r["_role"] for r in c0.collect()} == {2}
    # under-cap corpus: tier-1 short-circuit, no counts
    needs3, counts3 = _cluster_guard_probe(
        df.limit(5), assigned.limit(5), cap=8
    )
    assert needs3 is False and counts3 is None


def test_incremental_ivf_first_run_race_single_writer(spark, tmp_path):
    """r8 advice #4: two concurrent first runs on the same store path
    must not both append a version-1 centroid set. The O_EXCL init
    marker admits exactly one fitter; the loser waits for version 1
    and assigns against it — afterwards the store has EXACTLY one
    version."""
    from deftunes_spark.ext.similarity import incremental_ivf_assign
    from deftunes_spark.io.versioned import list_versions

    store = str(tmp_path / "store")
    batch = spark.createDataFrame(
        [(i, [float(i % 2) * 10, 0.0]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    cents = [[0.0, 0.0], [10.0, 0.0]]
    results, errs = [], []

    def run():
        try:
            out = incremental_ivf_assign(
                spark, batch, store, centroids=cents
            )
            results.append(out.count())
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    threads = [threading.Thread(target=run) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    assert results == [20, 20, 20]
    assert len(list_versions(spark, store)) == 1


def test_incremental_ivf_stranded_marker_fails_loudly(spark, tmp_path):
    """A marker with no committed version (the winner died mid-init)
    must surface as a loud, named error — never a silent wait-forever
    or a second centroid set."""
    from deftunes_spark.ext import similarity as S

    store = str(tmp_path / "store2")
    import os

    os.makedirs(store, exist_ok=True)
    open(os.path.join(store, "_ivf_init.marker"), "w").close()
    batch = spark.createDataFrame(
        [(1, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    import time as time_mod

    orig = time_mod.time
    calls = {"n": 0}

    def fast_clock():
        # first call sets the deadline; subsequent calls jump past it
        calls["n"] += 1
        return orig() if calls["n"] == 1 else orig() + 1e6

    time_mod_time = time_mod.time
    time_mod.time = fast_clock
    try:
        with pytest.raises(RuntimeError, match="init race"):
            S.incremental_ivf_assign(
                spark, batch, store, centroids=[[0.0, 0.0]]
            )
    finally:
        time_mod.time = time_mod_time
