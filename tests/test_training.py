"""Unit tests for ext.training: chunking coverage/overlap invariants,
negative-sampling determinism and shape, winsorize bound semantics,
quantization round-trip error, dataset-card arithmetic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deftunes_spark.ext import training as TR


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, " ".join(f"w{i}" for i in range(30)), "s0"),
        (1, " ".join(f"x{i}" for i in range(12)), "s0"),
        (2, "single", "s1"),
        (3, "", "s1"),
        (4, " ".join(f"y{i}" for i in range(13)), "s2"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


class TestChunking:
    def test_full_token_coverage_and_overlap(self, spark, docs):
        out = TR.chunk_documents(
            docs, "doc_id", "text", chunk_tokens=12, stride=8
        ).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        # doc 0: 30 tokens → ceil(18/8)+1 = 4 chunks
        c0 = sorted(by_doc[0], key=lambda r: r["chunk_id"])
        assert len(c0) == 4
        # every token appears in some chunk, in order
        rebuilt = []
        for r in c0:
            toks = r["chunk_text"].split()
            start = r["chunk_id"] * 8
            assert toks == [f"w{i}" for i in range(start, min(start + 12, 30))]
            rebuilt.extend(toks)
        assert set(rebuilt) == {f"w{i}" for i in range(30)}
        # consecutive chunks overlap by chunk-stride = 4 tokens
        assert c0[0]["chunk_text"].split()[8:] == c0[1][
            "chunk_text"
        ].split()[:4]

    def test_exact_fit_and_degenerates(self, spark, docs):
        out = TR.chunk_documents(
            docs, "doc_id", "text", chunk_tokens=12, stride=8
        )
        rows = {
            (r["doc_id"], r["chunk_id"]): r for r in out.collect()
        }
        # doc 1 has exactly 12 tokens → one chunk, no ghost second
        assert (1, 0) in rows and (1, 1) not in rows
        assert rows[(1, 0)]["chunk_tokens"] == 12
        # one-token and empty docs still yield exactly one chunk each
        assert rows[(2, 0)]["chunk_text"] == "single"
        assert rows[(3, 0)]["chunk_text"] == ""
        assert rows[(3, 0)]["chunk_tokens"] == 0
        # doc 4: 13 tokens → 2 chunks; second holds the 5-token tail
        assert rows[(4, 1)]["chunk_text"].split() == [
            f"y{i}" for i in range(8, 13)
        ]

    def test_validation(self, docs):
        with pytest.raises(ValueError):
            TR.chunk_documents(docs, "doc_id", "text", chunk_tokens=0)


class TestNegativePairs:
    def test_shape_and_determinism(self, spark):
        docs = spark.range(0, 200).select(
            F.col("id").alias("doc_id")
        )
        a = TR.negative_pairs(docs, "doc_id", k=3, n_buckets=4)
        r1 = sorted(map(tuple, a.collect()))
        r2 = sorted(map(tuple, a.collect()))
        assert r1 == r2  # md5 rank → retry/run deterministic
        per_anchor = {}
        for anchor, neg, rank in r1:
            assert anchor != neg
            assert (anchor - neg) % 4 == 0  # bucket co-membership
            per_anchor.setdefault(anchor, []).append(rank)
        assert len(per_anchor) == 200
        assert all(sorted(v) == [1, 2, 3] for v in per_anchor.values())

    def test_anchor_predicate_filters_anchors_not_candidates(
        self, spark
    ):
        docs = spark.range(0, 40).select(F.col("id").alias("doc_id"))
        out = TR.negative_pairs(
            docs,
            "doc_id",
            k=2,
            n_buckets=2,
            anchor_pred=F.col("doc_id") < 4,
        ).collect()
        anchors = {r["anchor_id"] for r in out}
        assert anchors == {0, 1, 2, 3}
        # candidates come from the full corpus
        assert any(r["neg_id"] >= 4 for r in out)


class TestWinsorize:
    def test_clips_to_percentile_band(self, spark):
        df = spark.createDataFrame(
            [(float(i),) for i in range(1, 101)], ["v"]
        )
        out = TR.winsorize(df, "v", 0.10, 0.90, keep_bounds=True)
        rows = out.collect()
        lo = rows[0]["_lo_bound"]
        hi = rows[0]["_hi_bound"]
        # exact interpolated percentiles of 1..100
        assert lo == pytest.approx(10.9)
        assert hi == pytest.approx(90.1)
        assert all(lo <= r["v_w"] <= hi for r in rows)
        # interior values untouched
        assert all(
            r["v_w"] == r["v"] for r in rows if lo <= r["v"] <= hi
        )

    def test_validation(self, spark):
        df = spark.createDataFrame([(1.0,)], ["v"])
        with pytest.raises(ValueError):
            TR.winsorize(df, "v", 0.9, 0.1)


class TestQuantization:
    def test_stats_and_roundtrip_error(self, spark):
        import numpy as np

        rng = np.random.default_rng(7)
        vecs = rng.uniform(-1.0, 1.0, size=(50, 8))
        emb = spark.createDataFrame(
            [(i, [float(x) for x in row]) for i, row in enumerate(vecs)],
            ["vec_id", "embedding"],
        )
        stats = TR.quantization_stats(emb, "embedding")
        srows = {r["dim"]: r for r in stats.collect()}
        assert set(srows) == set(range(8))
        for d in range(8):
            assert srows[d]["dim_min"] == pytest.approx(vecs[:, d].min())
            assert srows[d]["dim_max"] == pytest.approx(vecs[:, d].max())
        q = TR.quantize_embeddings(emb, "vec_id", "embedding", stats)
        qrows = {r["vec_id"]: r["codes"] for r in q.collect()}
        assert all(len(c) == 8 for c in qrows.values())
        assert all(0 <= x <= 255 for c in qrows.values() for x in c)
        # dequantized error bounded by scale/2 per dimension
        for i, row in enumerate(vecs):
            for d in range(8):
                s = srows[d]["scale"]
                recon = srows[d]["dim_min"] + qrows[i][d] * s
                assert abs(recon - row[d]) <= s / 2 + 1e-9

    def test_constant_dimension_maps_to_zero(self, spark):
        emb = spark.createDataFrame(
            [(0, [1.0, 5.0]), (1, [1.0, 7.0])],
            ["vec_id", "embedding"],
        )
        q = TR.quantize_embeddings(emb)
        codes = {r["vec_id"]: r["codes"] for r in q.collect()}
        assert codes[0][0] == 0 and codes[1][0] == 0  # zero-width dim
        assert codes[0][1] == 0 and codes[1][1] == 255


def test_dataset_card(spark, docs):
    rows = {
        r["source"]: r
        for r in TR.dataset_card(docs, "source", "text").collect()
    }
    assert rows["s0"]["n_docs"] == 2
    assert rows["s0"]["total_tokens"] == 42
    assert rows["s1"]["total_tokens"] == 1  # "single" + empty doc
    s1_avg = (len("single") + 0) / 2
    assert rows["s1"]["avg_chars"] == pytest.approx(s1_avg)
