"""Semi-structured / UDTF / ranking / resample operator tests
(driver_queries_semistruct.py). Oracle parity runs in the driver gate;
these pin the semantics on crafted fixtures."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from deftunes_spark.driver_queries_semistruct import (
    _BM25_B,
    _BM25_K1,
    _CHUNK,
    _chunk_text_udtf,
)


def test_variant_get_typed_and_missing(spark):
    df = spark.createDataFrame(
        [
            ('{"k": 7, "tag": "x"}',),
            ('{"k": "not-an-int"}',),
            ('{"other": 1}',),
            (None,),
        ],
        "props string",
    )
    out = df.select(
        F.try_variant_get(
            F.try_parse_json("props"), "$.k", "bigint"
        ).alias("k")
    ).collect()
    vals = [r.k for r in out]
    # typed hit, type miss -> NULL, path miss -> NULL, null row -> NULL
    assert vals == [7, None, None, None]


def test_udtf_chunks_reconstruct_text(spark):
    text = "abcdefghij" * 30 + "tail"  # 304 chars -> 3 chunks
    spark.udtf.register("chunk_text_t", _chunk_text_udtf())
    docs = spark.createDataFrame(
        [(1, text), (2, ""), (3, None)], "doc_id int, text string"
    )
    rows = spark.sql(
        "SELECT d.doc_id, c.* FROM {d} d, LATERAL chunk_text_t(d.text) c",
        d=docs,
    ).collect()
    assert all(r.doc_id == 1 for r in rows)  # empty/null yield nothing
    frags = sorted(rows, key=lambda r: r.frag_idx)
    assert "".join(r.frag for r in frags) == text
    assert [r.frag_len for r in frags] == [_CHUNK, _CHUNK, 304 - 2 * _CHUNK]
    assert [r.frag_idx for r in frags] == [0, 1, 2]


def test_bm25_single_doc_matches_formula(spark, tmp_path):
    # 3 docs; "window" appears twice in doc 1, once in doc 2, never in 3.
    docs = spark.createDataFrame(
        [
            (1, "window a window b"),
            (2, "window c d e"),
            (3, "f g h i"),
        ],
        "doc_id long, text string",
    )
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    dl = {r.doc_id: r.n for r in
          tok.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    n_docs, avgdl = 3, sum(dl.values()) / 3
    df_term = 2  # docs 1 and 2 contain "window"
    idf = math.log(1 + (n_docs - df_term + 0.5) / (df_term + 0.5))

    def bm25(tf, d):
        return idf * tf * (_BM25_K1 + 1) / (
            tf + _BM25_K1 * (1 - _BM25_B + _BM25_B * d / avgdl)
        )

    from deftunes_spark.driver_queries_semistruct import q_bm25_rank

    # run the real query body against a temp parquet dir shaped like
    # the testdata layout (documents.parquet)
    d = str(tmp_path)
    docs.write.mode("overwrite").parquet(d + "/documents.parquet")
    out = {r.doc_id: r.bm25 for r in q_bm25_rank(spark, d).collect()}
    assert set(out) == {1, 2}
    assert out[1] == pytest.approx(round(bm25(2, dl[1]), 6), abs=1e-6)
    assert out[2] == pytest.approx(round(bm25(1, dl[2]), 6), abs=1e-6)
    assert out[1] > out[2]


def test_gapfill_zero_fills_missing_cells(spark, tmp_path):
    events = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 10, "click", 500.0, "{}"),
            (2, "2024-01-03 10:00:00", 11, "click", 500.0, "{}"),
            (3, "2024-01-02 10:00:00", 12, "view", 500.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    d = str(tmp_path)
    events.write.mode("overwrite").parquet(d + "/events.parquet")

    from deftunes_spark.driver_queries_semistruct import q_gapfill_daily

    rows = q_gapfill_daily(spark, d).collect()
    # 3-day span x 2 types = 6 cells, 3 non-empty
    assert len(rows) == 6
    filled = {(r.event_type, str(r.d)): r.n for r in rows}
    assert filled[("click", "2024-01-01")] == 1
    assert filled[("click", "2024-01-02")] == 0
    assert filled[("view", "2024-01-03")] == 0
    assert sum(filled.values()) == 3


def test_median_interpolates_and_mode_breaks_ties_low(spark, tmp_path):
    li = spark.createDataFrame(
        # flag A: even count -> interpolated median (1,2,3,4 -> 2.5);
        # modes tie (each value once) -> smallest value wins (1.0)
        # flag B: clear mode 7 (x3), median of [5,7,7,7,9] = 7
        [("A", 1.0), ("A", 2.0), ("A", 3.0), ("A", 4.0),
         ("B", 5.0), ("B", 7.0), ("B", 7.0), ("B", 7.0), ("B", 9.0)],
        "l_returnflag string, l_quantity double",
    )
    d = str(tmp_path)
    li.write.mode("overwrite").parquet(d + "/lineitem.parquet")

    from deftunes_spark.driver_queries_semistruct import q_exact_median_mode

    out = {r.l_returnflag: r for r in q_exact_median_mode(spark, d).collect()}
    assert out["A"].median_qty == pytest.approx(2.5)
    assert out["A"].mode_qty == 1.0 and out["A"].mode_count == 1
    assert out["B"].median_qty == pytest.approx(7.0)
    assert out["B"].mode_qty == 7.0 and out["B"].mode_count == 3
