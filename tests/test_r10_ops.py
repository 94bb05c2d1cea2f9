"""Round-10 regressions: the checker's nested-column rejection, the
bpe_decode inverse (OOV handling + roundtrip), and the rotation's
err-demotion (an errored artifact row is not coverage)."""

from __future__ import annotations

import json
import sys

from pyspark.sql import functions as F


# ---------------------------------------------------------------------
# tools/check_correctness.py must reject rows-only outputs with nested
# columns (r9 verdict #1: the driver's canonicalizer crashes on them,
# while the local stand-in happily collected tuples — the stand-in was
# more permissive than the hard signal it stands in for).
# ---------------------------------------------------------------------

def test_checker_rejects_planted_array_output_query(
    spark, monkeypatch, capsys
):
    sys.path.insert(0, "/root/repo/tools")
    import check_correctness as cc

    from deftunes_spark.driver_queries import QUERIES

    def planted(s, sf_dir):
        return s.range(3).select(
            "id", F.array(F.lit(1), F.lit(2)).alias("vals")
        )

    monkeypatch.setitem(QUERIES, "_planted_array_q", planted)
    monkeypatch.setattr(
        sys, "argv",
        ["check_correctness.py", "/root/testdata/sf0.001",
         "_planted_array_q"],
    )
    rc = cc.main()
    out = capsys.readouterr().out
    assert rc == 1
    assert "FAIL _planted_array_q" in out
    assert "non-canonicalizable" in out


def test_checker_still_accepts_flat_rows_only(spark, monkeypatch, capsys):
    sys.path.insert(0, "/root/repo/tools")
    import check_correctness as cc

    from deftunes_spark.driver_queries import QUERIES

    def planted(s, sf_dir):
        return s.range(3).select(
            "id", F.lit("x").alias("s")
        )

    monkeypatch.setitem(QUERIES, "_planted_flat_q", planted)
    monkeypatch.setattr(
        sys, "argv",
        ["check_correctness.py", "/root/testdata/sf0.001",
         "_planted_flat_q"],
    )
    assert cc.main() == 0
    assert "rows-only (3 rows)" in capsys.readouterr().out


# ---------------------------------------------------------------------
# bpe_decode: inverse id mapping, OOV witness, lossless roundtrip.
# ---------------------------------------------------------------------

def _train_fixture(spark):
    from deftunes_spark.ext.tokenizer import bpe_train, corpus_alphabet

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the hat"), (3, "a cat hat"),
         (4, "the the the cat")],
        "doc_id bigint, text string",
    )
    merges = bpe_train(docs, num_merges=4, min_freq=2)
    return docs, merges, corpus_alphabet(docs)


def test_bpe_decode_roundtrips_normalized_text(spark):
    from deftunes_spark.ext.tokenizer import bpe_decode, bpe_encode

    docs, merges, alphabet = _train_fixture(spark)
    enc = bpe_encode(docs, merges, alphabet=alphabet)
    dec = bpe_decode(enc, merges, alphabet)
    rows = {r["doc_id"]: r["decoded"] for r in dec.collect()}
    assert rows == {
        1: "the cat sat", 2: "the hat", 3: "a cat hat",
        4: "the the the cat",
    }


def test_bpe_decode_oov_ids_become_unk_not_dropped(spark):
    from deftunes_spark.ext.tokenizer import bpe_decode, bpe_encode

    docs, merges, _ = _train_fixture(spark)
    # Restrict the alphabet so 's' (only in "sat") is out-of-vocab:
    # encode emits -1 there, and decode must WITNESS it as the
    # replacement char rather than silently dropping the position.
    alphabet = sorted(set("theca "))  # no 's'
    enc = bpe_encode(docs, merges, alphabet=alphabet)
    unk_row = enc.filter(F.col("doc_id") == 1).collect()[0]
    assert unk_row["n_unk"] >= 1
    assert -1 in unk_row["token_ids"]
    dec = bpe_decode(enc, merges, alphabet)
    decoded = {r["doc_id"]: r["decoded"] for r in dec.collect()}
    assert "�" in decoded[1]
    # Non-OOV docs still roundtrip exactly.
    assert decoded[2] == "the hat"
    # Token positions preserved: one unk marker per -1 id.
    assert decoded[1].count("�") == sum(
        1 for i in unk_row["token_ids"] if i < 0
    )


def test_bpe_decode_null_and_empty_ids(spark):
    from deftunes_spark.ext.tokenizer import bpe_decode

    _, merges, alphabet = _train_fixture(spark)
    df = spark.createDataFrame(
        [(1, [0, 1]), (2, []), (3, None)],
        "doc_id bigint, token_ids array<int>",
    )
    rows = {
        r["doc_id"]: r["decoded"]
        for r in bpe_decode(df, merges, alphabet).collect()
    }
    assert rows[2] == ""
    assert rows[3] is None


# ---------------------------------------------------------------------
# Rotation: an errored artifact row must not count as coverage, while
# the driver's rows-only marker (err == "no_oracle") must.
# ---------------------------------------------------------------------

def test_rotation_err_rows_are_not_coverage(tmp_path, monkeypatch):
    import __spark_entry__ as e

    def art(n, data):
        with open(tmp_path / f"CORRECTNESS_r{n:02d}.json", "w") as f:
            json.dump(data, f)

    art(5, {"q_green": {"err": None},
            "q_rows_only": {"err": "no_oracle"},
            "q_err": {"err": "TypeError: boom"}})
    art(6, {"q_err": {"err": "TypeError: boom"}})
    monkeypatch.setattr(e, "_REPO_DIR", str(tmp_path))
    covered = e._last_covered_round()
    assert covered["q_green"] == 5
    assert covered["q_rows_only"] == 5   # successful rows-only check
    assert "q_err" not in covered        # errored twice -> never covered


def test_rotation_new_queries_slot_after_stalest_tier(
    tmp_path, monkeypatch
):
    """Never-covered queries must sort just AFTER the oldest covered
    tier: a batch of new registrations must never crowd the
    stalest-artifact queries out of the driver's fixed 50-query
    sample (the rotation's no-artifact-older-than-N guarantee is
    about those), while still outranking every fresher tier."""
    import __spark_entry__ as e

    with open(tmp_path / "CORRECTNESS_r05.json", "w") as f:
        json.dump({"q_old": {"err": None}}, f)
    with open(tmp_path / "CORRECTNESS_r09.json", "w") as f:
        json.dump({"q_fresh": {"err": None}}, f)
    monkeypatch.setattr(e, "_REPO_DIR", str(tmp_path))
    fake = {"q_fresh": object(), "q_new": object(), "q_old": object()}
    monkeypatch.setattr(
        "deftunes_spark.registry.QUERIES", fake
    )
    names = list(e.queries())
    assert names == ["q_old", "q_new", "q_fresh"]


# ---------------------------------------------------------------------
# unigram_encode: the SentencePiece-family twin of bpe_encode —
# parity with the local Viterbi reference, marker roundtrip, OOV ids.
# ---------------------------------------------------------------------

_UNI_DOCS = [
    (1, "the cat sat"),
    (2, "THE  hat\n"),
    (3, "a cat hat"),
    (4, ""),
    (5, None),
]


def _uni_fixture(spark):
    from deftunes_spark.ext.tokenizer import unigram_train

    docs = spark.createDataFrame(
        [(i, t) for i, t in _UNI_DOCS if t is not None],
        "doc_id bigint, text string",
    ).union(
        spark.createDataFrame(
            [(5, None)], "doc_id bigint, text string"
        )
    )
    vocab = unigram_train(docs, vocab_size=12, seed_size=30)
    return docs, vocab


def test_unigram_encode_parity_with_reference_segmenter(spark):
    from deftunes_spark.ext.tokenizer import (
        WORD_MARK,
        _unigram_seg_word,
        _ws_tokens,
        unigram_encode,
    )

    docs, vocab = _uni_fixture(spark)
    scores = dict(vocab)
    max_len = max(len(p) for p in scores)
    unk = min(scores.values()) - 10.0
    got = {
        r["doc_id"]: r["units"]
        for r in unigram_encode(docs, vocab).collect()
    }
    for i, t in _UNI_DOCS:
        if t is None:
            continue
        want = []
        for w in _ws_tokens(t):
            seg = _unigram_seg_word(w, scores, max_len, unk)
            want.extend(
                [(WORD_MARK + p) if j == 0 else p
                 for j, p in enumerate(seg)]
            )
        assert got[i] == want, i


def test_unigram_encode_marker_roundtrip_and_counts(spark):
    from deftunes_spark.ext.tokenizer import WORD_MARK, unigram_encode

    docs, vocab = _uni_fixture(spark)
    rows = {
        r["doc_id"]: r for r in unigram_encode(docs, vocab).collect()
    }
    for i, t in _UNI_DOCS:
        if t is None:
            continue
        norm = " ".join((t or "").lower().split())
        units = rows[i]["units"]
        assert (
            "".join(units).replace(WORD_MARK, " ").strip() == norm
        )
        assert rows[i]["n_pieces"] == len(units)
        n_words = sum(1 for u in units if u.startswith(WORD_MARK))
        assert n_words == len(norm.split())
    # Empty text → empty unit stream, not a crash or a phantom word.
    assert rows[4]["units"] == [] and rows[4]["n_pieces"] == 0


def test_unigram_encode_ids_oov_counted_not_dropped(spark):
    from deftunes_spark.ext.tokenizer import (
        unigram_encode,
        unigram_vocab_ids,
    )

    docs, _ = _uni_fixture(spark)
    # Hand vocabulary WITHOUT 's': "sat" forces single-char fallback
    # pieces outside the id table → -1 ids counted in n_unk.
    vocab = [(p, -1.0) for p in
             ["t", "h", "e", "c", "a", "the", "cat", "hat"]]
    ids = unigram_vocab_ids(vocab)
    enc = {
        r["doc_id"]: r
        for r in unigram_encode(docs, vocab, emit="ids").collect()
    }
    r1 = enc[1]  # "the cat sat"
    assert -1 in r1["piece_ids"]
    assert r1["n_unk"] == sum(1 for x in r1["piece_ids"] if x < 0)
    assert r1["n_unk"] >= 1
    # Word-initial pieces carry the MARKED id (boundaries live in the
    # id stream — the SentencePiece convention that makes decode
    # lossless); word-internal pieces the plain id.
    from deftunes_spark.ext.tokenizer import WORD_MARK

    assert r1["piece_ids"][0] == ids[WORD_MARK + "the"]
    assert enc[3]["n_unk"] == 0  # "a cat hat" fully covered


def test_unigram_decode_inverts_encode(spark):
    from deftunes_spark.ext.tokenizer import (
        unigram_decode,
        unigram_encode,
    )

    docs, vocab = _uni_fixture(spark)
    # The trainer retains every single char of its corpus, so encode
    # over the SAME corpus has n_unk == 0 and decode must reproduce
    # the whitespace-normalized lowercased text exactly.
    enc = unigram_encode(docs, vocab, emit="ids")
    got = {
        r["doc_id"]: r["decoded"]
        for r in unigram_decode(enc, vocab).collect()
    }
    for i, t in _UNI_DOCS:
        if t is None:
            continue
        assert got[i] == " ".join(t.lower().split()), i


def test_unigram_decode_oov_witnessed_not_dropped(spark):
    from deftunes_spark.ext.tokenizer import (
        unigram_decode,
        unigram_encode,
    )

    docs, _ = _uni_fixture(spark)
    vocab = [(p, -1.0) for p in
             ["t", "h", "e", "c", "a", "the", "cat", "hat"]]
    enc = unigram_encode(docs, vocab, emit="ids")
    dec = {
        r["doc_id"]: r
        for r in unigram_decode(enc, vocab).collect()
    }
    # "the cat sat": 's' is OOV → its -1 decodes to the replacement
    # char, one per negative id, never silently dropped.
    r1 = {r["doc_id"]: r for r in enc.collect()}[1]
    assert dec[1]["decoded"].count("�") == sum(
        1 for x in r1["piece_ids"] if x < 0
    ) >= 1
    # Fully-covered docs still roundtrip exactly.
    assert dec[2]["decoded"] == "the hat"


def test_unigram_decode_null_and_empty_ids(spark):
    from deftunes_spark.ext.tokenizer import unigram_decode

    vocab = [("a", -1.0), ("b", -2.0)]
    df = spark.createDataFrame(
        [(1, [1, 0]), (2, []), (3, None)],
        "doc_id bigint, piece_ids array<int>",
    )
    rows = {
        r["doc_id"]: r["decoded"]
        for r in unigram_decode(df, vocab).collect()
    }
    assert rows[2] == ""
    assert rows[3] is None


def test_unigram_vocab_ids_pure_function_of_pieces():
    from deftunes_spark.ext.tokenizer import unigram_vocab_ids

    a = unigram_vocab_ids([("b", -1.0), ("a", -2.0), ("c", -0.5)])
    b = unigram_vocab_ids([("c", -9.0), ("a", -1.0), ("b", -3.0)])
    # Dual-id design (e290150): each piece gets a plain (word-internal)
    # id and a WORD_MARK-prefixed (word-initial) id, in sorted-piece
    # order — scores never participate, so any score permutation yields
    # the identical table.
    assert a == b == {"a": 0, "▁a": 1, "b": 2, "▁b": 3, "c": 4, "▁c": 5}


# ---------------------------------------------------------------------
# unigram_kl_by_group: sparse decomposition == dense definition.
# ---------------------------------------------------------------------


def test_unigram_kl_matches_dense_numpy(spark):
    import math
    from collections import Counter

    from deftunes_spark.ext.curation import unigram_kl_by_group

    rows = [
        (1, "en", "the cat sat on the mat"),
        (2, "en", "the dog sat"),
        (3, "de", "der hund sitzt auf der matte"),
        (4, "de", "die katze"),
        (5, None, "ignored group"),
        (6, "en", None),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, lang string, text string"
    )
    got = {
        r["lang"]: r
        for r in unigram_kl_by_group(df, "lang", alpha=0.5).collect()
    }
    # Dense reference: full group x vocab grid.
    by_g: dict[str, Counter] = {}
    for _i, g, t in rows:
        if g is None or t is None:
            continue
        by_g.setdefault(g, Counter()).update(t.lower().split())
    vocab = sorted(set().union(*by_g.values()))
    v = len(vocab)
    tot = Counter()
    for c in by_g.values():
        tot.update(c)
    n_tot = sum(tot.values())
    a = 0.5
    for g, cg in by_g.items():
        n_g = sum(cg.values())
        kl = 0.0
        for w in vocab:
            p = (cg.get(w, 0) + a) / (n_g + a * v)
            q = (tot[w] + a) / (n_tot + a * v)
            kl += p * math.log(p / q)
        assert got[g]["n_words"] == n_g
        assert got[g]["vocab_size"] == v
        assert abs(got[g]["kl"] - round(kl, 6)) < 2e-6, g
        assert got[g]["kl"] >= 0.0  # Gibbs: KL of proper dists
    assert set(got) == {"en", "de"}  # NULL group/text excluded


def test_unigram_kl_single_group_is_zero(spark):
    from deftunes_spark.ext.curation import unigram_kl_by_group

    df = spark.createDataFrame(
        [(1, "en", "a b c"), (2, "en", "a b")],
        "doc_id bigint, lang string, text string",
    )
    [r] = unigram_kl_by_group(df, "lang").collect()
    # One group IS the corpus mixture → KL exactly 0 after rounding.
    assert r["kl"] == 0.0


# ---------------------------------------------------------------------
# ngram_novelty: planted duplicates score 0, unique content scores 1.
# ---------------------------------------------------------------------


def test_ngram_novelty_planted(spark):
    from deftunes_spark.ext.curation import ngram_novelty

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),  # exact dup of 1
            (3, "zeta eta theta iota kappa"),       # fully unique
            (4, "xy zz"),                           # < n tokens
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in ngram_novelty(df, n=3).collect()}
    # Duplicated docs: every shingle has df=2 → zero novelty.
    assert got[1]["novelty"] == 0.0 and got[2]["novelty"] == 0.0
    assert got[1]["n_shingles"] == 3 and got[1]["n_novel"] == 0
    # Unique doc: every shingle df=1 → novelty 1.
    assert got[3]["novelty"] == 1.0 and got[3]["n_novel"] == 3
    # Short doc contributes its full token string as ONE shingle
    # (the canonical shingle contract) — unique here.
    assert got[4]["n_shingles"] == 1 and got[4]["novelty"] == 1.0


def test_ngram_novelty_repeated_shingle_within_doc_counts_once(spark):
    from deftunes_spark.ext.curation import ngram_novelty

    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "c d e")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in ngram_novelty(df, n=2).collect()}
    # "a b" appears 3x in doc 1 but is ONE distinct shingle; both its
    # shingles ("a b", "b a") are corpus-unique → novelty 1.
    assert got[1]["n_shingles"] == 2
    assert got[1]["novelty"] == 1.0
