"""Temporal joins vs ground truth: asof_join vs pandas.merge_asof,
range_join vs a naive inequality join."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from deftunes_spark.ext.joins import asof_join, range_join


@pytest.fixture(scope="module")
def trades_quotes(spark):
    base = dt.datetime(2024, 1, 1, 9, 30)
    trades, quotes = [], []
    for i in range(120):
        sym = ["AAA", "BBB", "CCC"][i % 3]
        trades.append((i, sym, base + dt.timedelta(seconds=7 * i + i % 5)))
        quotes.append(
            (sym, base + dt.timedelta(seconds=5 * i), 100.0 + i * 0.25)
        )
    # a symbol with trades but no quotes → NULL match
    trades.append((999, "DDD", base + dt.timedelta(seconds=50)))
    t = spark.createDataFrame(trades, ["trade_id", "sym", "trade_ts"])
    q = spark.createDataFrame(quotes, ["sym", "quote_ts", "px"])
    return t, q, trades, quotes


def _pandas_asof(trades, quotes, direction):
    t = pd.DataFrame(trades, columns=["trade_id", "sym", "trade_ts"]).sort_values(
        "trade_ts"
    )
    q = pd.DataFrame(quotes, columns=["sym", "quote_ts", "px"]).sort_values(
        "quote_ts"
    )
    m = pd.merge_asof(
        t,
        q,
        left_on="trade_ts",
        right_on="quote_ts",
        by="sym",
        direction=direction,
    )
    return {
        int(r.trade_id): (
            None if pd.isna(r.quote_ts) else r.quote_ts.to_pydatetime(),
            None if pd.isna(r.px) else float(r.px),
        )
        for r in m.itertuples()
    }


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_pandas(trades_quotes, direction):
    t, q, trades, quotes = trades_quotes
    got = {
        r.trade_id: (r.quote_ts, r.px)
        for r in asof_join(
            t, q, ["sym"], "trade_ts", "quote_ts", direction=direction
        ).collect()
    }
    assert got == _pandas_asof(trades, quotes, direction)


def test_asof_tolerance(spark):
    base = dt.datetime(2024, 1, 1)
    t = spark.createDataFrame(
        [(1, "A", base + dt.timedelta(minutes=90))],
        ["trade_id", "sym", "trade_ts"],
    )
    q = spark.createDataFrame(
        [("A", base, 1.0)], ["sym", "quote_ts", "px"]
    )
    hit = asof_join(
        t, q, ["sym"], "trade_ts", "quote_ts", tolerance_seconds=7200
    ).collect()[0]
    assert hit.px == 1.0
    miss = asof_join(
        t, q, ["sym"], "trade_ts", "quote_ts", tolerance_seconds=60
    ).collect()[0]
    assert miss.px is None


def test_asof_rejects_colliding_columns(trades_quotes):
    t, q, _, _ = trades_quotes
    with pytest.raises(ValueError, match="colliding"):
        asof_join(
            t.withColumn("px", F.lit(0.0)),
            q,
            ["sym"],
            "trade_ts",
            "quote_ts",
        )


def test_range_join_matches_naive(trades_quotes):
    t, q, _, _ = trades_quotes
    left = t.withColumn(
        "lo_ts", F.col("trade_ts") - F.expr("INTERVAL 30 SECONDS")
    )
    binned = {
        (r.trade_id, r.quote_ts)
        for r in range_join(
            left, q, "lo_ts", "trade_ts", "quote_ts",
            keys=["sym"], bin_seconds=30,
        ).collect()
    }
    naive = {
        (r.trade_id, r.quote_ts)
        for r in left.join(q, "sym")
        .where(
            (F.col("quote_ts") > F.col("lo_ts"))
            & (F.col("quote_ts") <= F.col("trade_ts"))
        )
        .collect()
    }
    assert binned == naive and len(naive) > 0
