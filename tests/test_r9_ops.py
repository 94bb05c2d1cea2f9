"""Round-9 operator tests: prefix-guard tier-1 short-circuit,
preference-pair audit/dedup, distributed BPE encode, Hamming
band-probe mode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_prefix_guard_tier1_skips_gate_on_benign_universe(spark):
    """r8 verdict #7: a benign shingle universe (rich 4-gram space,
    rare prefix tokens) must NOT carry the Σc² gate — no raise_error
    in the executed plan — while the answer stays identical to the
    unguarded run."""
    from deftunes_spark.ext.dedup import prefix_filter_pairs

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    out = prefix_filter_pairs(
        docs, "doc_id", "text", n=4, threshold=0.7, cache=False
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "raise_error" not in plan
    got = {(r.id_a, r.id_b) for r in out.collect()}
    ref = {
        (r.id_a, r.id_b)
        for r in prefix_filter_pairs(
            docs,
            "doc_id",
            "text",
            n=4,
            threshold=0.7,
            cache=False,
            max_candidate_factor=None,
        ).collect()
    }
    assert got == ref and len(got) > 0


def test_prefix_guard_tier1_attaches_gate_when_in_doubt(spark):
    """A universe the sampled probe cannot clear must still carry the
    EXACT in-plan gate — the probe decides plan shape, never the
    fail-fast value."""
    from deftunes_spark.ext.dedup import prefix_filter_pairs

    texts = ["common words shared by every document"] * 10
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = prefix_filter_pairs(
        df,
        "doc_id",
        "text",
        n=1,
        threshold=0.5,
        cache=False,
        max_candidate_factor=1.0,
        min_candidate_floor=50,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "raise_error" in plan
    # est (400) > floor (50): the exact gate fires
    with pytest.raises(Exception, match="stopword-dense"):
        out.collect()


def test_preference_pair_audit_flags(spark):
    """r8 verdict #2: every violation class — degenerate pair, empty /
    whitespace-only sides, prompt drift in a group, non-positive
    margin — is flagged; clean pairs pass."""
    from deftunes_spark.ext.preference import preference_pair_audit

    rows = [
        # clean pair
        (1, 10, "Pick the better answer", "good long answer", "bad", 0.9, 0.1),
        # degenerate (whitespace-normalized equal)
        (2, 10, "Pick the better answer", "same  answer", "same\nanswer", 0.8, 0.2),
        # whitespace-only rejected (explicit class, not just spaces)
        (3, 11, "Other prompt", "fine", "\t\n", 0.7, 0.3),
        # prompt drift within group 11
        (4, 11, "Other prompt (v2)", "fine", "meh", 0.6, 0.2),
        # non-positive margin
        (5, 12, "Third prompt", "alpha beta", "gamma", 0.2, 0.5),
        # NULL chosen
        (6, 12, "Third prompt", None, "gamma", 0.9, 0.1),
    ]
    df = spark.createDataFrame(
        rows,
        "pair_id long, prompt_id long, prompt string, chosen string, "
        "rejected string, reward_chosen double, reward_rejected double",
    )
    out = {
        r["pair_id"]: r
        for r in preference_pair_audit(
            df,
            reward_chosen_col="reward_chosen",
            reward_rejected_col="reward_rejected",
        ).collect()
    }
    assert out[1]["audit_ok"]
    assert out[1]["len_ratio"] == 3.0 and out[1]["margin"] == 0.8
    assert out[2]["degenerate_pair"] and not out[2]["audit_ok"]
    assert out[3]["rejected_empty"] and not out[3]["audit_ok"]
    assert out[4]["prompt_mismatch"] and not out[4]["audit_ok"]
    assert not out[3]["prompt_mismatch"]  # canonical is min = base
    assert out[5]["nonpositive_margin"] and not out[5]["audit_ok"]
    assert out[6]["chosen_empty"] and out[6]["n_tokens_chosen"] == 0


def test_preference_pair_audit_null_group_id_not_dropped(spark):
    """A NULL prompt_id must not silently vanish through the group
    join — the malformed rows are exactly what the audit surfaces."""
    from deftunes_spark.ext.preference import preference_pair_audit

    df = spark.createDataFrame(
        [(1, None, "p", "a", "b"), (2, 5, "p", "a", "b")],
        "pair_id long, prompt_id long, prompt string, chosen string, "
        "rejected string",
    )
    rows = {r["pair_id"]: r for r in preference_pair_audit(df).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["prompt_mismatch"]  # canonical NULL vs 'p'


def test_preference_pair_audit_without_rewards(spark):
    """Rewards are optional metadata: without them margin is NULL and
    the margin flag never fires."""
    from deftunes_spark.ext.preference import preference_pair_audit

    df = spark.createDataFrame(
        [(1, 1, "p", "a", "b")],
        "pair_id long, prompt_id long, prompt string, chosen string, "
        "rejected string",
    )
    row = preference_pair_audit(df).collect()[0]
    assert row["margin"] is None
    assert not row["nonpositive_margin"] and row["audit_ok"]


def test_preference_prompt_dedup_collapses_pair_rows(spark):
    """The pair relation repeats each prompt once per response row —
    the dedup must distinct them first (no self-pairs) and find the
    planted near-dup prompt across groups."""
    from deftunes_spark.ext.preference import preference_prompt_dedup

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = []
    for resp in ("a", "b"):
        rows.append((100, base, resp))
        rows.append((200, base + " tail", resp))      # near-dup of 100
        rows.append((300, "completely different words everywhere", resp))
    df = spark.createDataFrame(
        rows, "prompt_id long, prompt string, resp string"
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in preference_prompt_dedup(
            df, "prompt_id", "prompt", n=3, threshold=0.5
        ).collect()
    }
    assert pairs == {(100, 200)}


def _random_fingerprints(n, n_planted, h, seed=7):
    import random

    random.seed(seed)

    def to_signed(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    raw = [random.getrandbits(64) for _ in range(n)]
    rows = [(i, to_signed(v)) for i, v in enumerate(raw)]
    for j in range(n_planted):
        flipped = raw[j]  # flip in the unsigned domain
        for b in random.sample(range(64), random.randint(0, h)):
            flipped ^= 1 << b
        rows.append((1_000_000 + j, to_signed(flipped)))
    return rows


def test_hamming_probes_mode_exactness(spark):
    """r8 verdict #4: probes mode (fewer, wider chunks + bit-flip
    probe enumeration) must return EXACTLY the banded join's pairs —
    the pigeonhole recall guarantee survives the re-chunking — across
    every feasible chunk count, including the m = h+1 degenerate case
    (≡ bands)."""
    from deftunes_spark.ext.dedup import (
        _probe_plan,
        simhash_near_pairs,
    )

    h = 6
    df = spark.createDataFrame(
        _random_fingerprints(400, 12, h), "doc_id long, simhash long"
    )
    ref = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_near_pairs(df, "doc_id", h, mode="bands").collect()
    }
    assert len(ref) >= 12  # planted pairs all found
    for m in _probe_plan(h):
        got = {
            (r.id_a, r.id_b, r.hamming)
            for r in simhash_near_pairs(
                df, "doc_id", h, mode="probes", n_chunks=m
            ).collect()
        }
        assert got == ref, f"m={m}"


def test_hamming_probes_shrink_adversarial_candidates(spark):
    """The engineered claim: on collision-free random fingerprints
    (the band birthday term's regime) probes mode generates MATERIALLY
    fewer candidates than the banded join at the same full recall."""
    from deftunes_spark.ext.dedup import simhash_candidates

    h = 8
    df = spark.createDataFrame(
        _random_fingerprints(2000, 20, h), "doc_id long, simhash long"
    )
    cb = simhash_candidates(df, "doc_id", h, mode="bands").count()
    cp = simhash_candidates(df, "doc_id", h, mode="probes").count()
    assert cp * 3 < cb, (cb, cp)


def test_hamming_auto_routes_by_birthday_estimate(spark):
    """mode='auto' must stay banded under the candidate budget and
    switch to probes above it (monkeypatched budget — the estimate is
    n²(h+1)/2^(64/(h+1)), one scalar), with identical answers."""
    from deftunes_spark.ext import dedup as D

    df = spark.createDataFrame(
        _random_fingerprints(300, 8, 6), "doc_id long, simhash long"
    )
    ref = {
        (r.id_a, r.id_b)
        for r in D.simhash_near_pairs(df, "doc_id", 6, mode="bands").collect()
    }
    orig = D._BANDS_CANDIDATE_BUDGET
    try:
        D._BANDS_CANDIDATE_BUDGET = 1.0  # force the probes route
        got = {
            (r.id_a, r.id_b)
            for r in D.simhash_near_pairs(
                df, "doc_id", 6, mode="auto"
            ).collect()
        }
    finally:
        D._BANDS_CANDIDATE_BUDGET = orig
    assert got == ref


def test_hamming_probes_pinned_chunks_bounded(spark):
    """r9 review: a PINNED n_chunks must obey the planner's mask
    bound (m=2 at h=15 would enumerate ~4.5M literals), and the m=1
    whole-fingerprint chunk must not overflow signed-long literals
    (the 1<<63 flip mask)."""
    from deftunes_spark.ext.dedup import simhash_near_pairs

    df = spark.createDataFrame(
        _random_fingerprints(50, 4, 1), "doc_id long, simhash long"
    )
    # m=1, h=1: radius-1 probes over the full 64-bit chunk → includes
    # the sign-bit mask; must run, and match bands.
    ref = {
        (r.id_a, r.id_b)
        for r in simhash_near_pairs(df, "doc_id", 1, mode="bands").collect()
    }
    got = {
        (r.id_a, r.id_b)
        for r in simhash_near_pairs(
            df, "doc_id", 1, mode="probes", n_chunks=1
        ).collect()
    }
    assert got == ref and len(ref) >= 1
    # unbounded enumeration rejected loudly, naming the knob
    with pytest.raises(ValueError, match="_PROBE_MASKS_MAX"):
        simhash_near_pairs(
            df, "doc_id", 15, mode="probes", n_chunks=2
        )


def test_ivf_assign_arrow_null_element_matches_expr(spark):
    """r9 review: a correct-length vector containing a NULL element
    assigns NULL on the expr path; the Arrow boundary turns the null
    into NaN inside the UDF, so the element-null mask must live
    OUTSIDE the UDF. True-NaN elements assign index 0 on BOTH paths
    (NaN distances; argmin/array_position first index)."""
    from deftunes_spark.ext.similarity import ivf_assign

    cents = [[0.0, 0.0], [10.0, 10.0]]
    df = spark.createDataFrame(
        [
            (1, [1.0, None]),
            (2, [float("nan"), 1.0]),
            (3, [9.0, 9.0]),
        ],
        "vec_id long, embedding array<double>",
    )

    def got(method):
        return {
            r["vec_id"]: r["ivf_list"]
            for r in ivf_assign(df, cents, method=method)
            .select("vec_id", "ivf_list")
            .collect()
        }

    e, a = got("expr"), got("arrow")
    assert e == {1: None, 2: 0, 3: 1}
    assert a == e


def test_phash_near_pairs_probes_passthrough(spark):
    """phash near-dup accepts mode='probes' and returns the banded
    answer (the multimodal twin of the simhash guarantee)."""
    from deftunes_spark.ext.multimodal import phash_near_pairs

    rows = [
        (i, v)
        for i, v in _random_fingerprints(200, 6, 4)
    ]
    df = spark.createDataFrame(rows, "doc_id long, phash long")
    ref = {
        (r.id_a, r.id_b)
        for r in phash_near_pairs(df, max_hamming=4).collect()
    }
    got = {
        (r.id_a, r.id_b)
        for r in phash_near_pairs(
            df, max_hamming=4, mode="probes", n_chunks=2
        ).collect()
    }
    assert got == ref and len(ref) >= 6


def test_best_of_n_selection_ties_nulls_gap(spark):
    """BoN: highest reward wins, ties to the LOWEST sample id, NULL
    rewards never win, reward_gap = winner - runner-up (NULL for
    singleton groups)."""
    from deftunes_spark.ext.preference import best_of_n_selection

    rows = [
        (1, 10, "a", 0.5),
        (1, 11, "b", 0.9),
        (1, 12, "c", 0.9),   # tie with 11 → 11 wins
        (2, 20, "d", None),
        (2, 21, "e", 0.1),   # NULL never wins
        (3, 30, "f", 0.7),   # singleton → gap NULL
        (4, 40, "g", None),  # all-NULL group → lowest id, reward NULL
        (4, 41, "h", None),
    ]
    df = spark.createDataFrame(
        rows,
        "prompt_id long, sample_id long, response string, "
        "reward double",
    )
    out = {
        r["prompt_id"]: r for r in best_of_n_selection(df).collect()
    }
    assert len(out) == 4
    assert out[1]["sample_id"] == 11 and out[1]["reward_gap"] == 0.0
    assert out[1]["n_samples"] == 3
    assert out[2]["sample_id"] == 21
    assert out[2]["reward_gap"] is None  # runner-up unscored
    assert out[3]["sample_id"] == 30 and out[3]["reward_gap"] is None
    assert out[4]["sample_id"] == 40 and out[4]["reward"] is None


def test_reward_margin_calibration_bins(spark):
    """Calibration: equal-width |margin| bins with clip, agreement =
    margin > 0, NULL-reward pairs in bin -1 (counted, not dropped)."""
    from deftunes_spark.ext.preference import reward_margin_calibration

    rows = [
        (0.9, 0.1),   # margin 0.8 → bin 4 (n_bins=5), agree
        (0.1, 0.9),   # margin -0.8 → bin 4, disagree
        (0.55, 0.5),  # margin 0.05 → bin 0, agree
        (None, 0.5),  # NULL → bin -1
        (2.5, 0.0),   # margin 2.5 → clipped to bin 4, agree
    ]
    df = spark.createDataFrame(
        rows, "reward_chosen double, reward_rejected double"
    )
    out = {
        r["margin_bin"]: r
        for r in reward_margin_calibration(df, n_bins=5).collect()
    }
    assert out[4]["n_pairs"] == 3 and out[4]["n_agree"] == 2
    assert out[4]["agree_rate"] == round(2 / 3, 6)
    assert out[0]["n_pairs"] == 1 and out[0]["agree_rate"] == 1.0
    assert out[-1]["n_pairs"] == 1 and out[-1]["n_agree"] == 0
    assert out[-1]["bin_lo"] is None
    assert out[4]["bin_lo"] == 0.8


def test_fim_transform_partitions_and_rates(spark):
    """FIM: applied docs carry all three sentinels and the three
    spans reassemble the original text exactly; unapplied docs pass
    through untouched; fim_rate=0/1 gate everything off/on; the
    transform is deterministic."""
    from deftunes_spark.ext.training import (
        FIM_MID,
        FIM_PRE,
        FIM_SUF,
        fim_transform,
    )

    texts = {i: f"document number {i} with some filler body" for i in range(40)}
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in fim_transform(df).collect()}
    applied = [r for r in rows.values() if r["fim_applied"]]
    passthru = [r for r in rows.values() if not r["fim_applied"]]
    assert applied and passthru  # 60% gate hits both classes at n=40
    for r in passthru:
        assert r["fim_format"] == "none"
        assert r["fim_text"] == texts[r["doc_id"]]
    for r in applied:
        t = r["fim_text"]
        assert t.startswith(FIM_PRE) and FIM_MID in t and FIM_SUF in t
        if r["fim_format"] == "psm":
            pre, rest = t[len(FIM_PRE):].split(FIM_SUF, 1)
            suf, mid = rest.split(FIM_MID, 1)
            assert pre + mid + suf == texts[r["doc_id"]]
        else:
            rest = t[len(FIM_PRE) + len(FIM_SUF):]
            suf, premid = rest.split(FIM_MID, 1)
            orig = texts[r["doc_id"]]
            # SPM: prefix and middle are joined; their concat plus the
            # suffix must reassemble the text
            assert premid + suf == orig
    # rate gates
    all_on = fim_transform(df, fim_rate=1.0).collect()
    assert all(r["fim_applied"] for r in all_on)
    all_off = fim_transform(df, fim_rate=0.0).collect()
    assert not any(r["fim_applied"] for r in all_off)
    # determinism
    again = {r["doc_id"]: r["fim_text"] for r in fim_transform(df).collect()}
    assert again == {k: r["fim_text"] for k, r in rows.items()}
    # NULL text passes through
    null_row = fim_transform(
        spark.createDataFrame([(99, None)], "doc_id long, text string"),
        fim_rate=1.0,
    ).collect()[0]
    assert not null_row["fim_applied"]
    assert null_row["fim_format"] == "none" and null_row["fim_text"] is None


def test_bpe_encode_parity_with_reference_encoder(spark):
    """r8 verdict #3: the distributed encode must segment and id
    exactly as the driver-local reference (trainer-fold semantics) on
    planted words — same merges, same left-to-right non-overlapping
    application, same id table."""
    from deftunes_spark.ext.tokenizer import (
        EOW,
        _apply_merges,
        bpe_encode,
        bpe_train,
        bpe_vocab_ids,
        corpus_alphabet,
    )

    texts = [
        "low lower lowest",
        "low low low newer newest",
        "wider wide wider low",
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    merges = bpe_train(df, num_merges=6, min_freq=2)
    assert merges  # planted repeats guarantee at least one merge
    alphabet = corpus_alphabet(df)
    ids = bpe_vocab_ids(merges, alphabet)
    rules = [(a, b, a + b) for a, b, _ in merges]
    out = {
        r["doc_id"]: r
        for r in bpe_encode(
            df, merges, alphabet=alphabet
        ).collect()
    }
    for i, t in enumerate(texts):
        units = []
        for w in t.lower().split():
            units.extend(_apply_merges(w, rules))
        expect = [ids[u] for u in units]
        assert out[i]["token_ids"] == expect, t
        assert out[i]["n_tokens"] == len(units)
        assert out[i]["n_unk"] == 0
    # ids are deterministic: base alphabet sorted, merges in rank order
    n_base = 2 * len(set(alphabet))
    for rank, (a, b, _n) in enumerate(merges):
        assert ids[a + b] >= n_base or (a + b) in (
            c + EOW for c in alphabet
        )


def test_bpe_encode_unknown_symbols_flagged(spark):
    """Symbols outside the pinned vocabulary encode as -1 and are
    counted, never silently dropped — the fixed-vocabulary ingest
    contract for encoding NEW batches."""
    from deftunes_spark.ext.tokenizer import bpe_encode, bpe_train

    train = spark.createDataFrame(
        [(0, "abc abc abd")], "doc_id long, text string"
    )
    merges = bpe_train(train, num_merges=2, min_freq=1)
    new = spark.createDataFrame(
        [(1, "abc xyz")], "doc_id long, text string"
    )
    row = bpe_encode(
        new, merges, alphabet=["a", "b", "c", "d"]
    ).collect()[0]
    assert row["n_unk"] >= 1
    assert -1 in row["token_ids"]
    assert row["n_tokens"] == len(row["token_ids"])


def test_bpe_encode_roundtrip_reconstruction(spark):
    """Lossless segmentation: concatenated units with EOW → space
    equals the normalized text, including tab/newline whitespace and
    empty docs."""
    from deftunes_spark.ext.tokenizer import EOW, bpe_encode, bpe_train

    texts = ["Hello  World", "a\tb\nc", "", None, "single"]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    merges = bpe_train(
        df.filter("text is not null"), num_merges=3, min_freq=1
    )
    out = {
        r["doc_id"]: r
        for r in bpe_encode(df, merges, emit="units").collect()
    }
    for i, t in enumerate(texts):
        joined = "".join(out[i]["units"]).replace(EOW, " ").strip()
        norm = " ".join((t or "").lower().split())
        assert joined == norm, (t, out[i]["units"])
