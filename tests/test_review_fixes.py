"""Regression tests for the code-review findings: each test pins the
exact failure scenario the review identified."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


def test_simhash_recall_holds_at_max_hamming(spark):
    """Hamming=4 pair with one flipped bit per 16-bit quarter: the old
    fixed-4-chunk join missed it at max_hamming>=4; the adaptive
    (max_hamming+1)-chunk split must find it."""
    from deftunes_spark.ext.dedup import simhash_near_pairs

    a = 0
    b = (1 << 0) | (1 << 16) | (1 << 32) | (1 << 48)  # 4 spread bits
    sim = spark.createDataFrame(
        [(1, a), (2, b), (3, 0x0FFF_FFFF_FFFF_FFF0)],
        ["doc_id", "simhash"],
    )
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_pairs(sim, "doc_id", max_hamming=8).collect()
    }
    assert pairs.get((1, 2)) == 4


def test_monthly_windows_roll_forward_not_back(spark):
    from deftunes_spark.pipeline.runner import monthly_windows

    w = monthly_windows("2024-01-15", "2024-02-28")
    assert w == [("2024-02-01", "2024-03-01")]  # never before Jan 15
    assert monthly_windows("2024-01-01", "2024-02-01") == [
        ("2024-01-01", "2024-02-01"),
        ("2024-02-01", "2024-03-01"),
    ]  # day-1 start unchanged


def test_column_values_eq_op_and_early_validation(spark):
    from deftunes_spark.quality.evaluator import evaluate_ruleset
    from deftunes_spark.quality.rules import ColumnValues

    df = spark.createDataFrame([(2.0,), (2.0,), (3.0,)], ["price"])
    [res] = evaluate_ruleset(df, [ColumnValues("price", 2.0, op="=")])
    assert not res.passed and res.metric == 1.0
    with pytest.raises(ValueError, match="ColumnValues op"):
        ColumnValues("price", 2.0, op="~")  # fails at load, not eval


def test_model_sql_braces_survive_rendering(spark):
    from deftunes_spark.models.registry import Model, ModelRegistry

    reg = ModelRegistry(variables={"src": "brace_src"})
    spark.createDataFrame([("ab123",)], ["c"]).createOrReplaceTempView(
        "brace_src"
    )
    reg.add(
        Model(
            name="brace_model",
            sql="SELECT regexp_extract(c, '[0-9]{3}', 0) AS d FROM {src}",
        )
    )
    [row] = reg.build_df(spark, "brace_model").collect()
    assert row.d == "123"


def test_lsh_band_arithmetic_guarded(spark):
    from deftunes_spark.ext.dedup import lsh_candidate_pairs

    sig = spark.createDataFrame([(1, 0, 0)], ["doc_id", "mh_0", "mh_1"])
    with pytest.raises(ValueError, match="bands"):
        lsh_candidate_pairs(sig, "doc_id", num_hashes=2, bands=4)
    with pytest.raises(ValueError, match="divide"):
        lsh_candidate_pairs(sig, "doc_id", num_hashes=32, bands=5)


def test_runner_reports_root_cause_task(spark):
    from deftunes_spark.pipeline.runner import (
        Pipeline,
        PipelineTask,
        TaskFailure,
    )

    p = Pipeline("root-cause")
    p.add(PipelineTask("extract", lambda ctx: 1 / 0, retries=0))
    p.add(
        PipelineTask(
            "transform", lambda ctx: "ok", depends_on=("extract",), retries=0
        )
    )
    p.add(
        PipelineTask(
            "aa_load", lambda ctx: "ok", depends_on=("transform",), retries=0
        )
    )
    with pytest.raises(TaskFailure) as exc:
        p.run_window(("2024-01-01", "2024-02-01"))
    # root cause, not the alphabetically-first failed member (aa_load)
    assert exc.value.task == "extract"
    assert "ZeroDivisionError" in str(exc.value)


def test_neardup_pairs_empty_corpus(spark):
    from deftunes_spark.ext.similarity import cosine_neardup_pairs

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert cosine_neardup_pairs(empty).count() == 0


def test_approx_uniqueness_exposes_sketch(spark):
    from deftunes_spark.ext.scale import approx_uniqueness

    df = spark.createDataFrame([(i % 100,) for i in range(1000)], ["u"])
    row = approx_uniqueness(df, "u").collect()[0]
    assert row.n_distinct_approx > 0  # the sketch value is in the output
    row = approx_uniqueness(df, "u", include_exact=True).collect()[0]
    assert row.approx_ok  # validation shape checks sketch vs exact
