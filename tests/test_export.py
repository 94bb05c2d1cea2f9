"""Training-shard export (ext/export.py): deterministic assignment,
idempotent rewrite, one file per shard, manifest integrity."""

from __future__ import annotations

import glob
import os

import pytest

from deftunes_spark.ext.export import (
    shard_export,
    shard_manifest,
)


@pytest.fixture()
def docs(spark):
    rows = [
        (i, f"word{i} alpha beta" if i % 7 else None)
        for i in range(1, 101)
    ]
    # One empty-string doc: must hash differently from NULL text.
    rows.append((200, ""))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _manifest_rows(spark, path):
    return sorted(
        (r["shard"], r["n_rows"], r["n_tokens"], r["content_hash"])
        for r in shard_manifest(spark.read.parquet(path)).collect()
    )


def test_idempotent_rewrite(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    shard_export(docs, path, n_shards=8)
    first = _manifest_rows(spark, path)
    shard_export(docs, path, n_shards=8)  # overwrite, same input
    second = _manifest_rows(spark, path)
    assert first == second
    total = sum(r[1] for r in second)
    assert total == docs.count()  # nothing dropped or duplicated


def test_one_file_per_shard(spark, docs, tmp_path):
    path = str(tmp_path / "shards1f")
    shard_export(docs, path, n_shards=8)
    for d in glob.glob(os.path.join(path, "shard=*")):
        files = [
            f for f in os.listdir(d) if f.endswith(".parquet")
        ]
        assert len(files) == 1, f"{d}: {files}"


def test_assignment_deterministic_and_membership_stable(
    spark, docs, tmp_path
):
    p1 = str(tmp_path / "a")
    p2 = str(tmp_path / "b")
    shard_export(docs, p1, n_shards=8)
    # Different row order, same relation -> identical membership.
    shard_export(docs.orderBy("text"), p2, n_shards=8)
    m1 = {
        r["doc_id"]: r["shard"]
        for r in spark.read.parquet(p1).collect()
    }
    m2 = {
        r["doc_id"]: r["shard"]
        for r in spark.read.parquet(p2).collect()
    }
    assert m1 == m2
    assert set(m1) == {r["doc_id"] for r in docs.collect()}


def test_null_text_distinct_from_empty(spark, tmp_path):
    a = spark.createDataFrame(
        [(1, None)], "doc_id bigint, text string"
    )
    b = spark.createDataFrame([(1, "")], "doc_id bigint, text string")
    pa, pb = str(tmp_path / "n"), str(tmp_path / "e")
    shard_export(a, pa, n_shards=1)
    shard_export(b, pb, n_shards=1)
    ha = _manifest_rows(spark, pa)[0][3]
    hb = _manifest_rows(spark, pb)[0][3]
    assert ha != hb


def test_n_shards_validation(spark, docs, tmp_path):
    with pytest.raises(ValueError, match="n_shards"):
        shard_export(docs, str(tmp_path / "x"), n_shards=0)
