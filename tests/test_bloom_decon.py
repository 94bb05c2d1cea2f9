"""Bloom-filter decontamination properties: no false negatives vs the
exact operator, bounded false positives at proper sizing, literal vs
Arrow-bitset path parity, and xxhash64/md5 family equivalence of the
one-sided-error guarantee."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _corpus(spark):
    """Train docs 1..40 with disjoint vocab except docs 1-4, which
    copy eval text; eval docs 100-109."""
    rows = []
    for d in range(100, 110):
        rows.append((d, " ".join(f"ev{d}w{i}" for i in range(12))))
    eval_df = spark.createDataFrame(rows, ["doc_id", "text"])
    trows = []
    for d in range(1, 41):
        if d <= 4:
            src = 100 + d
            trows.append(
                (d, " ".join(f"ev{src}w{i}" for i in range(12)))
            )
        else:
            trows.append(
                (d, " ".join(f"tr{d}w{i}" for i in range(12)))
            )
    return spark.createDataFrame(trows, ["doc_id", "text"]), eval_df


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5"])
def test_no_false_negatives_and_bounded_fp(spark, hash_fn):
    from deftunes_spark.ext.curation import (
        decontaminate,
        decontaminate_bloom,
    )

    train, eval_df = _corpus(spark)
    exact = {
        r.doc_id: r.contaminated
        for r in decontaminate(train, eval_df, n=3, min_matches=1).collect()
    }
    bloom = {
        r.doc_id: r.contaminated
        for r in decontaminate_bloom(
            train, eval_df, n=3, min_matches=1,
            m_bits=1 << 14, k=3, hash_fn=hash_fn,
        ).collect()
    }
    assert set(exact) == set(bloom)
    for d, c in exact.items():
        if c:
            assert bloom[d], f"false negative on doc {d}"  # one-sided
    # ~100 inserted shingles in 16384 bits, k=3: FP rate << 1%.
    fps = [d for d in exact if bloom[d] and not exact[d]]
    assert len(fps) <= 2


def test_literal_and_arrow_paths_agree(spark):
    from deftunes_spark.ext.curation import decontaminate_bloom

    train, eval_df = _corpus(spark)
    kw = dict(n=3, min_matches=1, m_bits=1 << 14, k=3,
              hash_fn="xxhash64")
    lit = sorted(
        map(tuple, decontaminate_bloom(
            train, eval_df, literal_max_words=4096, **kw
        ).collect())
    )
    arrow = sorted(
        map(tuple, decontaminate_bloom(
            train, eval_df, literal_max_words=1, **kw
        ).collect())
    )
    assert lit == arrow  # same bits, same counts, either substrate


def test_validation(spark):
    from deftunes_spark.ext.curation import decontaminate_bloom

    train, eval_df = _corpus(spark)
    with pytest.raises(ValueError, match="m_bits"):
        decontaminate_bloom(train, eval_df, m_bits=100)
    with pytest.raises(ValueError, match="hash fn"):
        decontaminate_bloom(train, eval_df, hash_fn="sha1")
    with pytest.raises(ValueError, match="k must"):
        decontaminate_bloom(train, eval_df, k=0)
