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


def test_preference_pair_audit_flags(spark):
    """r8 verdict #2: every violation class — degenerate pair, empty /
    whitespace-only sides, prompt drift in a group, non-positive
    margin — is flagged; clean pairs pass."""
    from deftunes_spark.ext.preference import preference_pair_audit

    rows = [
        # clean pair
        (1, 10, "Pick the better answer", "good long answer", "bad", 0.9, 0.1),
        # degenerate (whitespace-normalized equal)
        (2, 10, "Pick the better answer", "same  answer", "same\nanswer", 0.8, 0.2),
        # whitespace-only rejected (explicit class, not just spaces)
        (3, 11, "Other prompt", "fine", "\t\n", 0.7, 0.3),
        # prompt drift within group 11
        (4, 11, "Other prompt (v2)", "fine", "meh", 0.6, 0.2),
        # non-positive margin
        (5, 12, "Third prompt", "alpha beta", "gamma", 0.2, 0.5),
        # NULL chosen
        (6, 12, "Third prompt", None, "gamma", 0.9, 0.1),
    ]
    df = spark.createDataFrame(
        rows,
        "pair_id long, prompt_id long, prompt string, chosen string, "
        "rejected string, reward_chosen double, reward_rejected double",
    )
    out = {
        r["pair_id"]: r
        for r in preference_pair_audit(
            df,
            reward_chosen_col="reward_chosen",
            reward_rejected_col="reward_rejected",
        ).collect()
    }
    assert out[1]["audit_ok"]
    assert out[1]["len_ratio"] == 3.0 and out[1]["margin"] == 0.8
    assert out[2]["degenerate_pair"] and not out[2]["audit_ok"]
    assert out[3]["rejected_empty"] and not out[3]["audit_ok"]
    assert out[4]["prompt_mismatch"] and not out[4]["audit_ok"]
    assert not out[3]["prompt_mismatch"]  # canonical is min = base
    assert out[5]["nonpositive_margin"] and not out[5]["audit_ok"]
    assert out[6]["chosen_empty"] and out[6]["n_tokens_chosen"] == 0


def test_preference_pair_audit_without_rewards(spark):
    """Rewards are optional metadata: without them margin is NULL and
    the margin flag never fires."""
    from deftunes_spark.ext.preference import preference_pair_audit

    df = spark.createDataFrame(
        [(1, 1, "p", "a", "b")],
        "pair_id long, prompt_id long, prompt string, chosen string, "
        "rejected string",
    )
    row = preference_pair_audit(df).collect()[0]
    assert row["margin"] is None
    assert not row["nonpositive_margin"] and row["audit_ok"]


def test_preference_prompt_dedup_collapses_pair_rows(spark):
    """The pair relation repeats each prompt once per response row —
    the dedup must distinct them first (no self-pairs) and find the
    planted near-dup prompt across groups."""
    from deftunes_spark.ext.preference import preference_prompt_dedup

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = []
    for resp in ("a", "b"):
        rows.append((100, base, resp))
        rows.append((200, base + " tail", resp))      # near-dup of 100
        rows.append((300, "completely different words everywhere", resp))
    df = spark.createDataFrame(
        rows, "prompt_id long, prompt string, resp string"
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in preference_prompt_dedup(
            df, "prompt_id", "prompt", n=3, threshold=0.5
        ).collect()
    }
    assert pairs == {(100, 200)}
