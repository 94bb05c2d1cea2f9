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
