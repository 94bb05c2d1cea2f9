"""Round-8 operators: perceptual-hash image dedup, SFT conversation
flatten/audit, incremental ANN index maintenance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------
# image_phash / phash_near_pairs
# ---------------------------------------------------------------------


def test_phash_deterministic_and_matches_python(spark):
    """The fake-decode phash must equal a driver-side recomputation of
    the documented definition (sha256 hex-chain pixels, strict-mean
    bits, two's-complement long)."""
    import hashlib

    from deftunes_spark.ext.multimodal import _fake_pixels, image_phash

    texts = [(1, b"hello world"), (2, b"other payload")]
    df = spark.createDataFrame(
        texts, "doc_id long, payload binary"
    )
    got = {r.doc_id: r.phash for r in image_phash(df).collect()}

    def expect(data: bytes) -> int:
        px = _fake_pixels(data, 64)
        s = sum(px)
        h = 0
        for i, v in enumerate(px):
            if 64 * v > s:
                h |= 1 << i
        return h - (1 << 64) if h >= 1 << 63 else h

    assert got == {1: expect(b"hello world"), 2: expect(b"other payload")}
    # and the pixel chain is the documented hex chain
    h1 = hashlib.sha256(b"hello world|8x8").hexdigest()
    h2 = hashlib.sha256(h1.encode()).hexdigest()
    assert _fake_pixels(b"hello world", 64) == list(
        bytes.fromhex(h1) + bytes.fromhex(h2)
    )


def test_phash_near_pairs_planted_duplicates(spark):
    """Exact payload duplicates hash identically (hamming 0); distinct
    payloads under the fake decoder are avalanche-far apart and must
    produce no pair at hamming <= 4."""
    from deftunes_spark.ext.multimodal import image_phash, phash_near_pairs

    df = spark.createDataFrame(
        [
            (1, b"the same image bytes"),
            (2, b"the same image bytes"),
            (3, b"completely different"),
        ],
        "doc_id long, payload binary",
    )
    pairs = phash_near_pairs(image_phash(df), max_hamming=4).collect()
    assert {(r.id_a, r.id_b, r.hamming) for r in pairs} == {(1, 2, 0)}


def test_phash_near_pairs_hamming_banding(spark):
    """Synthetic hashes: flipping k <= max_hamming bits must be found
    with the exact Hamming distance; k > max_hamming must not."""
    from deftunes_spark.ext.multimodal import phash_near_pairs

    base = 0x123456789ABCDEF0
    flip3 = base ^ 0b10110  # 3 bits
    flip6 = base ^ 0x3F  # 6 bits
    df = spark.createDataFrame(
        [(1, base), (2, flip3), (3, flip6)],
        "doc_id long, phash long",
    )
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in phash_near_pairs(df, max_hamming=4).collect()
    }
    assert pairs[(1, 2)] == 3
    assert (1, 3) not in pairs


def test_phash_real_decode_gated(spark):
    """fake_decode=False must run PIL when available and raise the
    documented NotImplementedError otherwise."""
    from deftunes_spark.ext import multimodal as M

    df = spark.createDataFrame(
        [(1, b"not an image")], "doc_id long, payload binary"
    )
    if M.codec_available():
        with pytest.raises(Exception):  # invalid image bytes
            M.image_phash(df, fake_decode=False).collect()
    else:
        with pytest.raises(Exception) as exc:
            M.image_phash(df, fake_decode=False).collect()
        assert "image codec not available" in str(exc.value)


# ---------------------------------------------------------------------
# SFT flatten / role audit
# ---------------------------------------------------------------------


def _dialog_df(spark):
    rows = [
        # clean dialog: system lead, alternating, non-empty
        (1, [("system", "be helpful"), ("user", "hi there"),
             ("assistant", "hello friend")]),
        # violations: double user, empty content, misplaced system,
        # unknown role
        (2, [("user", "a b c"), ("user", "dup role"),
             ("assistant", "   "), ("system", "late system"),
             ("tool", "unknown")]),
    ]
    return spark.createDataFrame(
        rows,
        "dialog_id long, messages array<struct<role:string,"
        "content:string>>",
    )


def test_sft_turn_flatten_shape_and_order(spark):
    from deftunes_spark.ext.sft import sft_turn_flatten

    out = sorted(
        map(tuple, sft_turn_flatten(_dialog_df(spark)).collect())
    )
    assert out[:3] == [
        (1, 0, "system", "be helpful"),
        (1, 1, "user", "hi there"),
        (1, 2, "assistant", "hello friend"),
    ]
    assert len(out) == 8


def test_sft_role_audit_seeded_violations(spark):
    from deftunes_spark.ext.sft import sft_role_audit

    got = {
        r.dialog_id: r.asDict()
        for r in sft_role_audit(_dialog_df(spark)).collect()
    }
    clean = got[1]
    assert clean["n_turns"] == 3
    assert clean["n_alt_violations"] == 0
    assert clean["n_empty"] == 0
    assert clean["n_system_misplaced"] == 0
    assert clean["n_unknown_role"] == 0
    assert clean["total_tokens"] == 2 + 2 + 2
    assert clean["audit_ok"] is True
    bad = got[2]
    assert bad["n_turns"] == 5
    assert bad["n_alt_violations"] == 1  # user,user
    assert bad["n_empty"] == 1  # whitespace-only assistant
    assert bad["n_system_misplaced"] == 1
    assert bad["n_unknown_role"] == 1  # 'tool'
    assert bad["total_tokens"] == 3 + 2 + 0 + 2 + 1
    assert bad["audit_ok"] is False


def test_sft_audit_no_shuffle(spark):
    """The audit is HOF-only — its plan over a source relation must
    contain no Exchange."""
    from deftunes_spark.ext.sft import sft_role_audit

    out = sft_role_audit(_dialog_df(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------
# incremental_ivf_assign
# ---------------------------------------------------------------------


def test_ann_incremental_matches_from_scratch_assign(spark, tmp_path):
    """Batch-2 assignment against the stored quantizer must equal a
    from-scratch ivf_assign with the same centroids (determinism of
    the stored version), and the drift ratio must be the documented
    integer-product division."""
    from deftunes_spark.ext.similarity import (
        incremental_ivf_assign,
        ivf_assign,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    old = emb.filter(F.col("vec_id") % 3 != 0)
    new = emb.filter(F.col("vec_id") % 3 == 0)
    cents = [[1.0] + [0.0] * 63, [0.0, 1.0] + [0.0] * 62]
    store = f"{tmp_path}/store"
    incremental_ivf_assign(
        spark, old, store, centroids=cents
    ).limit(0).collect()
    out = incremental_ivf_assign(spark, new, store)
    got = {r.vec_id: r.ivf_list for r in out.collect()}
    want = {
        r.vec_id: r.ivf_list
        for r in ivf_assign(new, cents).select(
            "vec_id", "ivf_list"
        ).collect()
    }
    assert got == want

    # drift arithmetic: b*ft / (f*bt), one division, rounded 6
    fit = {
        r.ivf_list: r.fit_list_rows for r in out.collect()
    }
    rows = out.collect()
    ft = old.count()
    bt = new.count()
    for r in rows:
        if r.fit_list_rows > 0:
            expect = round(
                (r.batch_list_rows * ft) / (r.fit_list_rows * bt), 6
            )
            assert abs(r.occupancy_ratio - expect) < 1e-9
        else:
            assert r.occupancy_ratio is None
    assert fit  # store round-tripped


def test_ann_incremental_drift_signal(spark, tmp_path):
    """A batch concentrated in one list must read ratio > 1 there and
    NULL for a list empty at fit time."""
    from deftunes_spark.ext.similarity import incremental_ivf_assign

    cents = [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]
    old = spark.createDataFrame(
        [(1, [1.0, 0.1]), (2, [0.1, 1.0]), (3, [0.9, 0.0]),
         (4, [0.0, 0.8])],
        "vec_id long, embedding array<double>",
    )
    # new batch: all near centroid 0, plus one in never-seen list 2
    new = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.95, 0.05]), (12, [0.8, 0.9])],
        "vec_id long, embedding array<double>",
    )
    store = f"{tmp_path}/store"
    incremental_ivf_assign(
        spark, old, store, centroids=cents
    ).limit(0).collect()
    out = {r.vec_id: r for r in
           incremental_ivf_assign(spark, new, store).collect()}
    assert out[10].ivf_list == 0 and out[10].occupancy_ratio > 1.0
    assert out[12].ivf_list == 2
    assert out[12].fit_list_rows == 0
    assert out[12].occupancy_ratio is None


def test_ann_incremental_auto_fit(spark, tmp_path):
    """centroids='auto' on first run trains the quantizer and later
    runs reuse the stored version untouched (same store row count,
    deterministic assignment across two identical calls)."""
    from deftunes_spark.ext.similarity import incremental_ivf_assign
    from deftunes_spark.io.versioned import read_version

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    old = emb.filter(F.col("vec_id") % 3 != 0)
    new = emb.filter(F.col("vec_id") % 3 == 0)
    store = f"{tmp_path}/store"
    incremental_ivf_assign(
        spark, old, store, centroids="auto", target_list_rows=50
    ).limit(0).collect()
    v1 = read_version(spark, store).count()
    a = sorted(
        map(tuple, incremental_ivf_assign(spark, new, store).collect())
    )
    b = sorted(
        map(tuple, incremental_ivf_assign(spark, new, store).collect())
    )
    assert a == b
    assert read_version(spark, store).count() == v1  # no refit


# ---------------------------------------------------------------------
# ivf_assign arrow path (100x stress fix)
# ---------------------------------------------------------------------


def test_ivf_assign_arrow_matches_expr(spark):
    """The Arrow-batched assignment must agree with the expr path on
    every vector of the fixture (ulp-tie flips are measure-zero on
    real data), across a quantizer big enough to trip the auto
    cutoff."""
    import numpy as np

    from deftunes_spark.ext.similarity import (
        IVF_EXPR_MAX_COEFFS,
        ivf_assign,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    n_lists = IVF_EXPR_MAX_COEFFS // dim + 8  # force past the cutoff
    cents = [
        [float(x) for x in row]
        for row in np.random.RandomState(7).randn(n_lists, dim)
    ]
    expr = {
        r.vec_id: r.ivf_list
        for r in ivf_assign(emb, cents, method="expr").select(
            "vec_id", "ivf_list"
        ).collect()
    }
    arrow = {
        r.vec_id: r.ivf_list
        for r in ivf_assign(emb, cents, method="arrow").select(
            "vec_id", "ivf_list"
        ).collect()
    }
    assert expr == arrow
    # auto picks arrow past the cutoff and expr under it
    auto = ivf_assign(emb, cents)  # auto
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    small = ivf_assign(emb, cents[:8])
    plan_s = small._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan_s


def test_shingles_mapside_parity(spark):
    """Per-row array_distinct shingling must equal the exploded
    distinct variant on unique-id inputs (incl. short docs and \x0B
    whitespace)."""
    from deftunes_spark.ext.dedup import shingles, shingles_mapside

    df = spark.createDataFrame(
        [
            (1, "a b c a b c a"),
            (2, "x"),
            (3, "p\x0bq p\x0bq r"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, shingles(df, "doc_id", "text", 2).collect()))
    b = sorted(
        map(tuple, shingles_mapside(df, "doc_id", "text", 2).collect())
    )
    assert a == b and a
    plan = (
        shingles_mapside(df, "doc_id", "text", 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_sft_loss_mask_spans(spark):
    """Spans partition the dialog's token stream exactly: contiguous,
    0-started, end == total tokens; only assistant turns trainable;
    the whole plan is shuffle-free."""
    from deftunes_spark.ext.sft import sft_loss_mask_spans

    out = sft_loss_mask_spans(_dialog_df(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    rows = sorted(
        out.collect(), key=lambda r: (r.dialog_id, r.turn_idx)
    )
    d1 = [r for r in rows if r.dialog_id == 1]
    # dialog 1: system "be helpful"(2), user "hi there"(2),
    # assistant "hello friend"(2)
    assert [(r.start_tok, r.end_tok, r.trainable) for r in d1] == [
        (0, 2, False),
        (2, 4, False),
        (4, 6, True),
    ]
    d2 = [r for r in rows if r.dialog_id == 2]
    # contiguity invariant: each start == previous end, first is 0
    assert d2[0].start_tok == 0
    for prev, cur in zip(d2, d2[1:]):
        assert cur.start_tok == prev.end_tok
    # whitespace-only content counts 0 tokens (span is empty)
    empty = [r for r in d2 if r.n_tokens == 0]
    assert len(empty) == 1 and empty[0].start_tok == empty[0].end_tok
