"""Round-9 operator tests: prefix-guard tier-1 short-circuit,
preference-pair audit/dedup, distributed BPE encode, Hamming
band-probe mode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_prefix_guard_tier1_skips_gate_on_benign_universe(spark):
    """r8 verdict #7: a benign shingle universe (rich 4-gram space,
    rare prefix tokens) must NOT carry the Σc² gate — no raise_error
    in the executed plan — while the answer stays identical to the
    unguarded run."""
    from deftunes_spark.ext.dedup import prefix_filter_pairs

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    out = prefix_filter_pairs(
        docs, "doc_id", "text", n=4, threshold=0.7, cache=False
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "raise_error" not in plan
    got = {(r.id_a, r.id_b) for r in out.collect()}
    ref = {
        (r.id_a, r.id_b)
        for r in prefix_filter_pairs(
            docs,
            "doc_id",
            "text",
            n=4,
            threshold=0.7,
            cache=False,
            max_candidate_factor=None,
        ).collect()
    }
    assert got == ref and len(got) > 0


def test_prefix_guard_tier1_attaches_gate_when_in_doubt(spark):
    """A universe the sampled probe cannot clear must still carry the
    EXACT in-plan gate — the probe decides plan shape, never the
    fail-fast value."""
    from deftunes_spark.ext.dedup import prefix_filter_pairs

    texts = ["common words shared by every document"] * 10
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = prefix_filter_pairs(
        df,
        "doc_id",
        "text",
        n=1,
        threshold=0.5,
        cache=False,
        max_candidate_factor=1.0,
        min_candidate_floor=50,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "raise_error" in plan
    # est (400) > floor (50): the exact gate fires
    with pytest.raises(Exception, match="stopword-dense"):
        out.collect()
