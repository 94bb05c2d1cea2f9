"""Sequence-packing invariants (ext.training.sequence_pack_concat /
sequence_pack_bestfit): conservation, capacity, determinism, and the
waste bound of best-fit-decreasing against the concat baseline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

CAP = 20


def _docs(spark):
    rows = [
        (1, "a " * 7),      # 7 tokens
        (2, "b " * 13),     # 13
        (3, "c " * 6),      # 6
        (4, "d " * 25),     # 25 — oversize
        (5, ""),            # empty
        (6, None),          # null text
        (7, "e " * 14),     # 14
        (8, "f " * 5),      # 5
        (9, "g " * 20),     # exactly capacity
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_concat_pack_offsets_are_contiguous(spark):
    from deftunes_spark.ext.training import sequence_pack_concat

    out = sequence_pack_concat(
        _docs(spark), "doc_id", "text", capacity=CAP, shards=2
    ).collect()
    assert len(out) == 9  # no row disappears (empty + null included)
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.doc_id)
        off = 0
        for r in rows:
            assert r.start_offset == off  # end-to-end, id order
            off += r.token_count
            assert r.first_seq == r.start_offset // CAP
            span_end = r.start_offset + max(r.token_count, 1) - 1
            assert r.n_seqs == span_end // CAP - r.first_seq + 1
            assert r.n_seqs >= 1


def test_bestfit_invariants(spark):
    from deftunes_spark.ext.training import sequence_pack_bestfit

    out = sequence_pack_bestfit(
        _docs(spark), "doc_id", "text", capacity=CAP, shards=2
    ).collect()
    assert {r.doc_id for r in out} == set(range(1, 10))  # conservation
    bins: dict[tuple, int] = {}
    for r in out:
        bins[(r.shard, r.bin_id)] = (
            bins.get((r.shard, r.bin_id), 0) + r.token_count
        )
        assert r.oversize == (r.token_count > CAP)
    for (shard, b), total in bins.items():
        members = [
            r for r in out if (r.shard, r.bin_id) == (shard, b)
        ]
        if any(m.oversize for m in members):
            assert len(members) == 1  # oversize docs pack alone
        else:
            assert total <= CAP


def test_bestfit_deterministic_and_renumbered(spark):
    from deftunes_spark.ext.training import sequence_pack_bestfit

    a = sorted(
        map(
            tuple,
            sequence_pack_bestfit(
                _docs(spark).repartition(7),
                "doc_id",
                "text",
                capacity=CAP,
                shards=2,
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            sequence_pack_bestfit(
                _docs(spark).repartition(1),
                "doc_id",
                "text",
                capacity=CAP,
                shards=2,
            ).collect(),
        )
    )
    assert a == b  # partitioning-independent
    # bin ids per shard are dense 0..n_bins-1
    rows = [r for r in a]
    for shard in {r[1] for r in rows}:
        ids = sorted({r[3] for r in rows if r[1] == shard})
        assert ids == list(range(len(ids)))


def test_bestfit_waste_bounded_vs_concat(spark):
    """FFD waste is bounded: bins used <= ceil(total/(cap)) * 2 (loose
    classical bound; in practice near-optimal) — and utilization of
    non-oversize bins beats naive one-doc-per-bin."""
    from deftunes_spark.ext.training import sequence_pack_bestfit

    rows = [(i, "w " * (3 + (i * 7) % 15)) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = sequence_pack_bestfit(
        df, "doc_id", "text", capacity=CAP, shards=1
    ).collect()
    total = sum(r.token_count for r in out)
    n_bins = len({r.bin_id for r in out})
    assert n_bins <= -(-total // CAP) * 2
    assert total / (n_bins * CAP) > 0.5  # >50% utilization


def test_validation(spark):
    from deftunes_spark.ext.training import (
        sequence_pack_bestfit,
        sequence_pack_concat,
    )

    with pytest.raises(ValueError):
        sequence_pack_concat(_docs(spark), "doc_id", "text", capacity=0)
    with pytest.raises(ValueError):
        sequence_pack_bestfit(_docs(spark), "doc_id", "text", shards=0)


# ---------------------------------------------------------------------
# Property-based: packing invariants over arbitrary corpora
# ---------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_doc_texts = st.lists(
    st.one_of(
        st.none(),
        st.text(
            alphabet=st.sampled_from(" abcdef"), min_size=0, max_size=60
        ),
    ),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_doc_texts, cap=st.integers(min_value=1, max_value=12))
def test_packing_invariants_hold_for_any_corpus(spark, texts, cap):
    from deftunes_spark.ext.training import (
        sequence_pack_bestfit,
        sequence_pack_concat,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    concat = sequence_pack_concat(
        df, "doc_id", "text", capacity=cap, shards=2
    ).collect()
    assert {r.doc_id for r in concat} == set(range(len(texts)))
    by_shard: dict[int, list] = {}
    for r in concat:
        by_shard.setdefault(r.shard, []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r.doc_id)
        off = 0
        for r in rows:
            assert r.start_offset == off
            off += r.token_count
            assert r.n_seqs >= 1

    best = sequence_pack_bestfit(
        df, "doc_id", "text", capacity=cap, shards=2
    ).collect()
    assert {r.doc_id for r in best} == set(range(len(texts)))
    assert sum(r.token_count for r in best) == sum(
        r.token_count for r in concat
    )  # same tokenization on both paths (shared helper)
    bins: dict[tuple, list] = {}
    for r in best:
        bins.setdefault((r.shard, r.bin_id), []).append(r)
    for members in bins.values():
        if any(m.oversize for m in members):
            assert len(members) == 1
        else:
            assert sum(m.token_count for m in members) <= cap
