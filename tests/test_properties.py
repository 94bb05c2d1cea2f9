"""Property-based tests (hypothesis): Spark operators vs plain-Python
references on generated inputs. Few examples, high value — each example
is a full Spark job, so max_examples stays small and deadlines are off.
"""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from deftunes_spark.ext.scale import salted_sum
from deftunes_spark.ext.text import with_token_count
from deftunes_spark.quality.rules import IsComplete
from deftunes_spark.quality.evaluator import evaluate_ruleset
from deftunes_spark.streaming.windows import session_stats_batch

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SLOW
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=-1000, max_value=1000),
        ),
        min_size=1,
        max_size=60,
    ),
    n_salt=st.integers(min_value=1, max_value=9),
)
def test_salted_sum_equals_plain_sum(spark, rows, n_salt):
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {
        r.k: r.v_sum
        for r in salted_sum(df, ["k"], "v", n_salt=n_salt).collect()
    }
    want = defaultdict(float)
    for k, v in rows:
        want[k] += v
    assert got == dict(want)


@SLOW
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab c\tx"),
            max_size=40,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_token_count_matches_python_split(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        r.doc_id: r.token_count for r in with_token_count(df).collect()
    }
    want = {i: len(t.split()) for i, t in enumerate(texts)}
    assert got == want


@SLOW
@given(
    vals=st.lists(
        st.one_of(st.none(), st.text(min_size=1, max_size=5)),
        min_size=1,
        max_size=40,
    )
)
def test_is_complete_iff_no_nulls(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "c string")
    [res] = evaluate_ruleset(df, [IsComplete("c")])
    assert res.passed == (None not in vals)


@SLOW
@given(
    gaps_min=st.lists(
        st.integers(min_value=1, max_value=120), min_size=1, max_size=30
    )
)
def test_sessionize_invariants(spark, gaps_min):
    """Session count == 1 + #gaps>threshold; event counts partition."""
    base = dt.datetime(2024, 1, 1)
    ts, cur = [base], base
    for g in gaps_min:
        cur = cur + dt.timedelta(minutes=g)
        ts.append(cur)
    df = spark.createDataFrame([(1, t) for t in ts], ["user_id", "ts"])
    stats = session_stats_batch(df, gap_minutes=30).collect()
    n_breaks = sum(1 for g in gaps_min if g > 30)
    assert len(stats) == 1 + n_breaks
    assert sum(r.n_events for r in stats) == len(ts)
    # Sessions tile the timeline in order, never overlapping.
    spans = sorted((r.session_start, r.session_end) for r in stats)
    for (s1, e1), (s2, _) in zip(spans, spans[1:]):
        assert e1 < s2


@SLOW
@given(
    lefts=st.lists(
        st.tuples(
            st.sampled_from(["x", "y"]),
            st.integers(min_value=0, max_value=500),
        ),
        min_size=1,
        max_size=25,
    ),
    rights=st.lists(
        st.tuples(
            st.sampled_from(["x", "y"]),
            st.integers(min_value=0, max_value=500),
        ),
        min_size=0,
        max_size=25,
        unique=True,
    ),
)
def test_asof_join_matches_pandas(spark, lefts, rights):
    import pandas as pd

    from deftunes_spark.ext.joins import asof_join

    base = dt.datetime(2024, 1, 1)
    lrows = [
        (i, k, base + dt.timedelta(seconds=s))
        for i, (k, s) in enumerate(lefts)
    ]
    rrows = [
        (k, base + dt.timedelta(seconds=s), float(s))
        for k, s in rights
    ]
    lt = spark.createDataFrame(lrows, ["lid", "k", "lts"])
    rt = spark.createDataFrame(
        rrows, "k string, rts timestamp, px double"
    ) if rrows else spark.createDataFrame([], "k string, rts timestamp, px double")
    got = {
        r.lid: (r.rts, r.px)
        for r in asof_join(lt, rt, ["k"], "lts", "rts").collect()
    }
    lp = pd.DataFrame(lrows, columns=["lid", "k", "lts"]).sort_values("lts")
    rp = pd.DataFrame(rrows, columns=["k", "rts", "px"]).sort_values("rts")
    if rrows:
        m = pd.merge_asof(lp, rp, left_on="lts", right_on="rts", by="k")
        want = {
            int(r.lid): (
                None if pd.isna(r.rts) else r.rts.to_pydatetime(),
                None if pd.isna(r.px) else float(r.px),
            )
            for r in m.itertuples()
        }
    else:
        want = {int(i): (None, None) for i, _, _ in lrows}
    assert got == want


@SLOW
@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1, max_size=40, unique=True,
    ),
    n_shards=st.integers(min_value=1, max_value=9),
)
def test_shuffle_shard_membership_is_pointwise(spark, ids, n_shards):
    """A row's (shuffle_key, shard) is a pure function of its id —
    adding or removing OTHER rows never moves it (the property that
    makes incremental corpus rebuilds order-stable)."""
    from deftunes_spark.ext.sampling import shuffle_shards

    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    full = {
        r.doc_id: (r.shuffle_key, r.shard)
        for r in shuffle_shards(df, "doc_id", n_shards=n_shards).collect()
    }
    half_ids = ids[: max(1, len(ids) // 2)]
    half = {
        r.doc_id: (r.shuffle_key, r.shard)
        for r in shuffle_shards(
            spark.createDataFrame([(i,) for i in half_ids], ["doc_id"]),
            "doc_id", n_shards=n_shards,
        ).collect()
    }
    for i in half_ids:
        assert half[i] == full[i]
    assert all(0 <= s < n_shards for _, s in full.values())


@SLOW
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),
            st.sampled_from(["en", "de", "fr"]),
        ),
        min_size=1, max_size=40, unique_by=lambda t: t[0],
    ),
    k=st.integers(min_value=1, max_value=5),
)
def test_reservoir_per_group_size_and_membership(spark, rows, k):
    from deftunes_spark.ext.sampling import reservoir_per_group

    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = reservoir_per_group(df, "lang", "doc_id", k=k).collect()
    by_group = defaultdict(set)
    for r in out:
        by_group[r.lang].add(r.doc_id)
    sizes = defaultdict(int)
    for _i, g in rows:
        sizes[g] += 1
    for g, n in sizes.items():
        assert len(by_group[g]) == min(k, n)
    all_ids = {i for i, _ in rows}
    assert all(i in all_ids for ids_ in by_group.values() for i in ids_)
    # Ranks are dense 1..|sample| per group.
    ranks = defaultdict(list)
    for r in out:
        ranks[r.lang].append(r.sample_rank)
    for g, rs in ranks.items():
        assert sorted(rs) == list(range(1, len(rs) + 1))
