"""Round-11 operators: byte-level (byte-fallback) BPE and the KMV
md5 overlap variant's registry wiring."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

WS = re.compile("[ \t\n\x0B\f\r]+")


def _norm(text: str) -> str:
    return " ".join(w for w in WS.split(text) if w)


FIXTURE = [
    (1, "Hello WORLD hello world"),
    (2, "café naïve über"),
    (3, "日本語 テ スト 中文"),
    (4, "emoji \U0001f600\U0001f680 mixéd \U0001f600"),
    (5, "ctrl\x01chars\x02here </w> literal"),
    (6, ""),
    (7, "  spaced\tout\nlines  "),
]


def _fixture_df(spark):
    return spark.createDataFrame(FIXTURE, "doc_id int, text string")


def test_byte_roundtrip_arbitrary_text(spark):
    """decode(encode(x)) == ws-normalized x for emoji, CJK, control
    bytes, mixed case, and the char-level EOW marker literal — with
    zero OOV (the byte-fallback property)."""
    from deftunes_spark.ext.tokenizer import (
        BYTE_ALPHABET,
        bpe_decode,
        bpe_encode,
        bpe_train,
    )

    df = _fixture_df(spark)
    merges = bpe_train(df, num_merges=12, byte_level=True)
    enc = bpe_encode(df, merges, byte_level=True)
    dec = bpe_decode(enc, merges, BYTE_ALPHABET, byte_level=True)
    rows = {r.doc_id: r for r in dec.collect()}
    for doc_id, text in FIXTURE:
        assert rows[doc_id].decoded == _norm(text), doc_id
        assert rows[doc_id].n_unk == 0, doc_id


def test_byte_nothing_oov_on_unseen_text(spark):
    """Encoding text DISJOINT from the training corpus still has
    n_unk == 0: the 256-byte base alphabet covers everything (the
    char-level path would emit -1 for unseen characters)."""
    from deftunes_spark.ext.tokenizer import (
        BYTE_ALPHABET,
        bpe_decode,
        bpe_encode,
        bpe_train,
    )

    train = _fixture_df(spark)
    merges = bpe_train(train, num_merges=8, byte_level=True)
    unseen = spark.createDataFrame(
        [(1, "Ωμέγα Ψψ unseen ЖЗИ \U0001f984")],
        "doc_id int, text string",
    )
    enc = bpe_encode(unseen, merges, byte_level=True)
    r = enc.collect()[0]
    assert r.n_unk == 0
    dec = bpe_decode(
        enc, merges, BYTE_ALPHABET, byte_level=True
    ).collect()[0]
    assert dec.decoded == "Ωμέγα Ψψ unseen ЖЗИ \U0001f984"


def test_byte_parity_with_char_level_on_ascii(spark):
    """On a lowercase-ASCII corpus every char is one byte and lower()
    is the identity, so the byte-level trainer must learn the SAME
    merge rules as the char-level trainer modulo the marker symbol,
    and both encodes must segment identically."""
    from deftunes_spark.ext.tokenizer import (
        BYTE_EOW,
        EOW,
        bpe_encode,
        bpe_train,
    )

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "cats and dogs and rats"),
        (4, "the the the matter chatter"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    char_merges = bpe_train(df, num_merges=10)
    byte_merges = bpe_train(df, num_merges=10, byte_level=True)

    def canon(merges, eow):
        return [
            (a.replace(eow, "<EOW>"), b.replace(eow, "<EOW>"), n)
            for a, b, n in merges
        ]

    assert canon(char_merges, EOW) == canon(byte_merges, BYTE_EOW)

    char_units = {
        r.doc_id: r.units
        for r in bpe_encode(df, char_merges, emit="units").collect()
    }
    byte_units = {
        r.doc_id: [
            u.replace(BYTE_EOW, EOW)
            for u in r.units
        ]
        for r in bpe_encode(
            df, byte_merges, emit="units", byte_level=True
        ).collect()
    }
    assert char_units == byte_units


def test_byte_train_rejects_distributed(spark):
    from deftunes_spark.ext.tokenizer import bpe_train

    df = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
    with pytest.raises(ValueError):
        bpe_train(df, byte_level=True, strategy="distributed")


def test_byte_decode_oov_id_yields_replacement_char(spark):
    """A corrupted id decodes to U+FFFD (via its latin-1 UTF-8 byte
    spelling) instead of vanishing or breaking the byte stream."""
    from deftunes_spark.ext.tokenizer import (
        BYTE_ALPHABET,
        bpe_decode,
    )

    df = spark.createDataFrame(
        [(1, [ord("h"), ord("i"), 99999])],
        "doc_id int, token_ids array<int>",
    )
    # ids 2c and 2c+1 are the plain/eow pair per sorted byte; build
    # from the real table instead of guessing:
    from deftunes_spark.ext.tokenizer import BYTE_EOW, bpe_vocab_ids

    ids = bpe_vocab_ids([], BYTE_ALPHABET, eow=BYTE_EOW)
    df = spark.createDataFrame(
        [(1, [ids["h"], ids["i" + BYTE_EOW], 99999])],
        "doc_id int, token_ids array<int>",
    )
    out = bpe_decode(df, [], BYTE_ALPHABET, byte_level=True).collect()
    assert out[0].decoded == "hi �"


# ---------------------------------------------------------------------
# pretrain_pipeline_e2e: single-job-graph composition
# ---------------------------------------------------------------------


def test_e2e_chain_is_one_plan_no_intermediate_action(spark):
    """Building the full chain (filter → dedup → mixture → encode →
    decode → pack) triggers ZERO Spark jobs — every stage composes
    lazily into one plan; the export write is the chain's only
    action. The physical plan must contain the encode's
    MapInPandas, the pack window, and joins, with no RDD scan /
    cached-table barrier splitting the graph."""
    import os

    from deftunes_spark.driver_queries_r11 import (
        build_pretrain_pipeline,
    )

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/documents.parquet"):
        import pytest

        pytest.skip("testdata not present")

    tracker = spark.sparkContext.statusTracker()
    # A fresh job group isolates the count from other tests' jobs.
    spark.sparkContext.setJobGroup("e2e-plan-test", "plan-only")
    try:
        chain = build_pretrain_pipeline(spark, sf)
        plan = chain._jdf.queryExecution().executedPlan().toString()
        jobs_in_group = tracker.getJobIdsForGroup("e2e-plan-test")
        # The parquet OPEN may run one scan-metadata job; no pipeline
        # STAGE may run one (dict_hashes-style dictionary
        # materialization would show up here as several).
        assert len(jobs_in_group or []) <= 1, (
            "chain construction ran Spark jobs: %s" % (jobs_in_group,)
        )
    finally:
        spark.sparkContext.setJobGroup("default", "")
    assert "MapInPandas" in plan          # the tokenize stage
    assert "Window" in plan               # the pack stage
    assert "Scanned RDD" not in plan and "ExistingRDD" not in plan
    assert "InMemoryTableScan" not in plan


def test_e2e_manifest_invariants(spark):
    """The exported manifest accounts for every surviving doc exactly
    once: shard ids dense in [0, 8), positive rows, n_seqs >=
    ceil(byte_tokens/512) per shard aggregate."""
    import os

    import pytest

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/documents.parquet"):
        pytest.skip("testdata not present")
    from deftunes_spark.driver_queries_r11 import (
        build_pretrain_pipeline,
        q_pretrain_pipeline_e2e,
    )

    man = {r.shard: r for r in q_pretrain_pipeline_e2e(spark, sf).collect()}
    n_docs = build_pretrain_pipeline(spark, sf).count()
    assert sum(r.n_rows for r in man.values()) == n_docs
    assert all(0 <= s < 8 for s in man)
    for r in man.values():
        assert r.n_rows > 0
        assert r.n_seqs >= r.n_rows  # every doc spans >= 1 sequence
