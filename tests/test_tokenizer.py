"""BPE vocabulary induction (ext/tokenizer.py) vs a plain-Python
reference implementation of Sennrich-style BPE."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from deftunes_spark.ext.tokenizer import (
    EOW,
    bpe_segment_udf,
    bpe_train,
    word_vocab,
)


def _ref_bpe(texts: list[str], num_merges: int):
    """Reference trainer: same tokenization, same tiebreak
    (-freq, left, right), same left-to-right non-overlapping fold."""
    vocab = Counter()
    for t in texts:
        for w in (t or "").lower().split():
            vocab[w] += 1
    seqs = {
        w: (list(w[:-1]) + [w[-1] + EOW], f) for w, f in vocab.items()
    }

    def fold(syms, a, b):
        out = []
        for x in syms:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        return out

    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, f in seqs.values():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (a, b), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < 2:
            break
        merges.append((a, b, n))
        seqs = {w: (fold(s, a, b), f) for w, (s, f) in seqs.items()}
    return merges, seqs


TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wider wide wide widest",
    "low newer wide lowest",
    "",
]


def test_bpe_train_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = bpe_train(df, num_merges=8)
    want, _ = _ref_bpe(TEXTS, 8)
    assert got == want
    # Sanity on the learned structure: frequent suffix/stem merges
    # appear, frequencies are non-increasing.
    freqs = [n for _, _, n in got]
    assert freqs == sorted(freqs, reverse=True)
    assert len(got) == 8


def test_bpe_train_local_and_distributed_parity(spark):
    """Both merge-loop strategies produce identical merge lists (the
    auto rule picks local for driver-sized vocabularies; distributed
    is the fallback above local_vocab_max)."""
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    local = bpe_train(df, num_merges=8, strategy="local")
    dist = bpe_train(df, num_merges=8, strategy="distributed")
    want, _ = _ref_bpe(TEXTS, 8)
    assert local == dist == want
    # auto with a tiny threshold must fall back to distributed and
    # still agree.
    assert (
        bpe_train(df, num_merges=8, local_vocab_max=2) == want
    )


def test_bpe_train_local_many_merges_exhausts(spark):
    """The local loop handles merge budgets far past exhaustion (the
    realistic-vocab mode: 32k merges must not mean 32k Spark jobs) and
    stops exactly where the reference stops."""
    texts = [
        " ".join(f"tok{i % 37}abcdefgh"[: 5 + i % 9] for i in range(200))
    ] * 3
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = bpe_train(df, num_merges=1000, strategy="local")
    want, _ = _ref_bpe(texts, 1000)
    assert got == want
    assert len(got) < 1000  # exhausted, not truncated


def test_bpe_train_early_stop_on_tiny_corpus(spark):
    df = spark.createDataFrame([("ab",)], "text string")
    # Single word occurrence: no pair reaches freq 2 -> no merges.
    assert bpe_train(df, num_merges=5) == []


def test_bpe_segment_matches_training_segmentation(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    merges = bpe_train(df, num_merges=8)
    want_merges, seqs = _ref_bpe(TEXTS, 8)
    assert merges == want_merges

    seg = bpe_segment_udf(merges)
    out = {
        r.text: r.units
        for r in df.select("text", seg("text").alias("units")).collect()
    }
    for t in TEXTS:
        expect = []
        for w in (t or "").lower().split():
            expect.extend(seqs[w][0])
        assert out[t] == expect, t
    # Round-trip: concatenating units and stripping EOW restores the
    # lowercased text tokens.
    joined = "".join(out["low lower lowest low low"]).replace(EOW, " ")
    assert joined.strip() == "low lower lowest low low"


def test_word_vocab_min_freq(spark):
    df = spark.createDataFrame([("a a a b b c",)], "text string")
    v = {r.word: r.freq for r in word_vocab(df, min_freq=2).collect()}
    assert v == {"a": 3, "b": 2}


def test_unigram_train_deterministic_and_covers(spark):
    from deftunes_spark.ext.tokenizer import (
        unigram_segment_udf,
        unigram_train,
    )

    rows = [(i, "the hugging bug hugged the jug " * 3) for i in range(4)]
    rows += [(9, "bugs jugged the hug")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    v1 = unigram_train(df, vocab_size=20, seed_size=50, max_piece_len=4)
    v2 = unigram_train(
        df.repartition(7), vocab_size=20, seed_size=50, max_piece_len=4
    )
    assert v1 == v2  # pure function of the corpus
    pieces = {p for p, _ in v1}
    # Coverage guarantee: every corpus character survives as a piece.
    chars = set("".join(w for _, t in rows for w in t.split()))
    assert chars <= pieces
    # Frequent substrings should have been learned as multi-char pieces.
    assert any(len(p) > 1 for p in pieces)
    # Segmentation reconstructs every word exactly.
    seg = unigram_segment_udf(v1, max_piece_len=4)
    out = df.select("text", seg(F.col("text")).alias("units")).collect()
    for r in out:
        assert "".join(r.units) == r.text.replace(" ", "")


def test_unigram_segment_handles_unknown_chars(spark):
    from deftunes_spark.ext.tokenizer import (
        unigram_segment_udf,
        unigram_train,
    )

    df = spark.createDataFrame([(1, "aa ab ba")], ["doc_id", "text"])
    v = unigram_train(df, vocab_size=10, seed_size=10, max_piece_len=2)
    seg = unigram_segment_udf(v, max_piece_len=2)
    out = (
        spark.createDataFrame([(1, "aa zq ab")], ["doc_id", "text"])
        .select(seg(F.col("text")).alias("u"))
        .collect()[0]
        .u
    )
    assert "".join(out) == "aazqab"  # unknown chars fall back per-char
