"""event_pattern_match alphabet hardening: the journey encoding must
come from a deterministic distinct(event_type) map, so two event types
sharing a first letter (``purchase``/``pause``) never alias — pinned by
running the Spark query AND its DuckDB oracle on a collision fixture."""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pytest


def _write_events(tmp_path, rows):
    df = pd.DataFrame(
        rows, columns=["user_id", "ts", "event_id", "event_type"]
    )
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    df.to_parquet(tmp_path / "events.parquet", index=False)
    return str(tmp_path)


@pytest.fixture()
def collision_dir(tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # u1: view, click, purchase — one conversion; the 'pause' events
    # must NOT extend or break the pattern even though they share
    # purchase's first letter.
    seq = ["view", "click", "pause", "purchase", "pause", "view"]
    rows += [
        ("u1", t0 + dt.timedelta(minutes=i), f"e1{i}", t)
        for i, t in enumerate(seq)
    ]
    # u2: errors back-to-back around a pause
    seq2 = ["error", "error", "pause", "error", "purchase"]
    rows += [
        ("u2", t0 + dt.timedelta(minutes=i), f"e2{i}", t)
        for i, t in enumerate(seq2)
    ]
    return rows


def _run_both(spark, tmp_path, rows):
    import __spark_entry__ as entry
    from deftunes_spark.driver_queries_analytics import (
        q_event_pattern_match,
    )

    sf_dir = _write_events(tmp_path, rows)
    got = {
        r.user_id: (r.n_events, r.n_conversions, r.n_error_bursts)
        for r in q_event_pattern_match(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    sql = entry.oracle_sql()["event_pattern_match"]
    want = {
        u: (n, c, e) for u, n, c, e in con.execute(sql).fetchall()
    }
    return got, want

def test_collision_alphabet_matches_oracle(spark, tmp_path, collision_dir):
    got, want = _run_both(spark, tmp_path, collision_dir)
    assert got == want
    # And the semantics, independent of the oracle: the pause events
    # between view..purchase break contiguity, so u1 has 0
    # conversions under a correct per-type alphabet (a first-letter
    # encoding would see 'p' for pause AND purchase and miscount).
    assert got["u1"] == (6, 0, 0)
    assert got["u2"] == (5, 0, 1)  # 'ee' burst; pause splits the 3rd


def test_contiguous_conversion_still_counts(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("u3", t0 + dt.timedelta(minutes=i), f"e3{i}", t)
        for i, t in enumerate(
            ["view", "click", "click", "purchase", "view", "purchase"]
        )
    ]
    got, want = _run_both(spark, tmp_path, rows)
    assert got == want
    assert got["u3"] == (6, 2, 0)  # vccp and vp both convert
