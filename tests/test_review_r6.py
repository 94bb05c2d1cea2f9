"""Regression tests for the round-6 review findings: the auto-nlist
fit-sample bound, null event types in pattern matching, large-weight
sampling order, and exception classing in the conditional-put commit."""

from __future__ import annotations

import datetime as dt
import math

import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_auto_nlist_bounded_by_fit_sample(spark):
    """auto must raise when the needed cluster count exceeds the
    k-means fit-sample cap (silently under-clustering would make list
    sizes linear again), but still CLAMP for corpora under the 8-list
    floor."""
    import numpy as np

    from deftunes_spark.ext.similarity import ivf_index

    rng = np.random.RandomState(0)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.randn(4)]) for i in range(300)],
        ["vec_id", "embedding"],
    )
    with pytest.raises(ValueError, match="fit sample"):
        ivf_index(
            df, n_lists="auto", target_list_rows=2, fit_max_rows=50
        )
    # Corpus-bound clamp still works (no raise for tiny corpora).
    tiny = df.limit(3)
    _, cents = ivf_index(tiny, n_lists="auto")
    assert len(cents) <= 3


def test_pattern_match_tolerates_null_event_type(spark, tmp_path):
    """A NULL event_type row must neither crash query construction
    nor diverge from the oracle (both engines drop it)."""
    import duckdb

    import __spark_entry__ as entry
    from deftunes_spark.driver_queries_analytics import (
        q_event_pattern_match,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("u1", t0, "e0", "view"),
        ("u1", t0 + dt.timedelta(minutes=1), "e1", None),
        ("u1", t0 + dt.timedelta(minutes=2), "e2", "purchase"),
    ]
    df = pd.DataFrame(
        rows, columns=["user_id", "ts", "event_id", "event_type"]
    )
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    df.to_parquet(tmp_path / "events.parquet", index=False)
    got = {
        r.user_id: (r.n_events, r.n_conversions, r.n_error_bursts)
        for r in q_event_pattern_match(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    sql = entry.oracle_sql()["event_pattern_match"]
    want = {
        u: (n, c, e) for u, n, c, e in con.execute(sql).fetchall()
    }
    assert got == want
    # The null event is dropped, view→purchase stays contiguous.
    assert got["u1"] == (2, 1, 0)


def test_pattern_match_is_lazy(spark):
    """Query construction must not run a Spark job (plan lint and
    bench build all registry queries; one eager builder taxes them
    all). Constructing against a nonexistent-but-unread path would
    fail eagerly only if an action ran."""
    from deftunes_spark.driver_queries_analytics import (
        q_event_pattern_match,
    )

    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    df = q_event_pattern_match(spark, "/root/testdata/sf0.001")
    after = tracker.getJobIdsForGroup(None)
    # Every builder pays ≤1 tiny job (the parquet footer/schema read
    # in spark.read); the distinct+collect SHUFFLE job is what must
    # be gone.
    assert len(after) - len(before) <= 1
    assert df.columns == [
        "user_id", "n_events", "n_conversions", "n_error_bursts",
    ]


def test_weighted_sample_orders_by_unrounded_key(spark):
    """Large weights push keys below 1e-6; fixed-dp rounding before
    the sort would collapse them into one tie bucket and pick by
    ascending id. The selection must match the exact E-S ranking."""
    from deftunes_spark.ext.sampling import weighted_sample

    import hashlib

    weights = {i: float(10**5 * (1 + (i * 37) % 90)) for i in range(60)}
    df = spark.createDataFrame(
        sorted(weights.items()), ["doc_id", "w"]
    )
    got = [r.doc_id for r in weighted_sample(df, "doc_id", "w", k=10).collect()]

    def key(i):
        h = int(hashlib.md5(f"ws-v1|{i}".encode()).hexdigest()[:15], 16)
        u = (h + 1.0) / float(1 << 60)
        return (-math.log(u) / weights[i], i)

    want = [i for i, _ in enumerate(weights)]
    want = sorted(weights, key=key)[:10]
    assert got == want


def test_cput_second_put_is_lost_race_first_wins(spark, tmp_path):
    """FileAlreadyExistsException (the class, not a message substring)
    is the one lost-race signal — and a table path CONTAINING 'exists'
    must not confuse the classifier."""
    from deftunes_spark.io.versioned import ConditionalPutCommitProtocol

    mdir = str(tmp_path / "pre_exists_dir" / "_manifests")
    proto = ConditionalPutCommitProtocol()
    assert proto.put_if_absent(spark, mdir, "m.json", b"one") is True
    assert proto.put_if_absent(spark, mdir, "m.json", b"two") is False
    with open(f"{mdir}/m.json", "rb") as f:
        assert f.read() == b"one"  # winner's payload intact
