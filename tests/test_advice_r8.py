"""Regression tests for the round-7 advisor findings: cache default
flipped to opt-in for the library entry points, bench sentinel host
identity, and the event_pattern_match delimiter guard."""

from __future__ import annotations

import inspect

import pytest
from pyspark.sql import functions as F


def test_cache_defaults_are_opt_in():
    """r7 advice #1: persist() pins accumulate in long-lived sessions
    (CacheManager has no TTL) — the library entry points must default
    to cache=False; the registry/bench builders opt in explicitly."""
    from deftunes_spark.ext.curation import dsir_logweights, semantic_dedup
    from deftunes_spark.ext.dedup import prefix_filter_pairs
    from deftunes_spark.ext.similarity import knn_join_grouped

    for fn in (
        knn_join_grouped,
        semantic_dedup,
        prefix_filter_pairs,
        dsir_logweights,
    ):
        assert (
            inspect.signature(fn).parameters["cache"].default is False
        ), fn.__name__


def test_bench_sentinel_records_host_identity():
    """r7 advice #2: SENTINEL_REF_SEC is a quiet-host constant for one
    box class; the sentinel block must carry host identity so scale
    readings are interpretable elsewhere."""
    import bench

    host = bench._host_identity()
    assert host["cores"] and host["cores"] > 0
    assert "cpu_model" in host
    assert bench.SENTINEL_REF_HOST


def test_event_pattern_match_rejects_delimiter_in_type(spark, tmp_path):
    """r7 advice #3: an event_type containing '<' or '>' would
    fabricate journey token boundaries and silently miscount — the
    query must fail loudly instead."""
    import datetime

    from deftunes_spark.registry import QUERIES

    rows = [
        (1, datetime.datetime(2024, 1, 1, 0, 0, i), 10, t, 1.0, "{}")
        for i, t in enumerate(["view", "click", "view><purchase"])
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    with pytest.raises(Exception) as exc:
        QUERIES["event_pattern_match"](spark, str(tmp_path)).collect()
    assert "event_type contains" in str(exc.value)


def test_event_pattern_match_clean_types_unaffected(spark, tmp_path):
    """The guard must not change results for well-formed types."""
    import datetime

    from deftunes_spark.registry import QUERIES

    rows = [
        (1, datetime.datetime(2024, 1, 1, 0, 0, 0), 10, "view", 1.0, "{}"),
        (2, datetime.datetime(2024, 1, 1, 0, 0, 1), 10, "click", 1.0, "{}"),
        (3, datetime.datetime(2024, 1, 1, 0, 0, 2), 10, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {
        r.user_id: (r.n_events, r.n_conversions)
        for r in QUERIES["event_pattern_match"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {10: (3, 1)}
