"""Round-11 operators.

- ``source_overlap_kmv_md5``: the oracle-mirrorable twin of
  ``source_overlap_minhash`` (r10 verdict #8) — the KMV bottom-k
  sketch over the repo's established md5→int hash family, so the FULL
  estimator algebra (bottom-k sketch build, merge, Jaccard /
  cardinality / containment estimators) is value-hash-checked against
  a pure-SQL DuckDB replication. The xxhash64 entry stays the benched
  production path.
- ``bpe_byte_roundtrip``: byte-fallback BPE (r10 verdict #6) —
  decode(encode(x)) == whitespace-normalized x for ARBITRARY text,
  with no lowercasing and no marker-literal exclusion.

Each entry follows the registry contract: a Spark builder plus a
DuckDB value-hash oracle mirroring the full chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401

from deftunes_spark.driver_queries import _t_cpu, query

_WS = "[ \\t\\n\\x0B\\f\\r]+"

# =====================================================================
# KMV source overlap under the md5 oracle family (r10 verdict #8)
# =====================================================================

_KMV_N = 3
_KMV_K = 256
_KMV_SCALE = float(2**60)  # md5 15-hex-digit hash → (0,1] divisor

# Full KMV replication in SQL: distinct shingles → md5 60-bit hashes →
# per-group bottom-k (window rank) → pairwise sketch merge → the
# Bar-Yossef / Beyer estimators with the identical operand order the
# Spark side evaluates, so doubles agree bit-for-bit before round().
_KMV_MD5_ORACLE = f"""
WITH toks AS (
    SELECT source,
           regexp_split_to_array(trim(text), '{_WS}') AS tk
    FROM documents WHERE text IS NOT NULL
), sh AS (
    SELECT DISTINCT source,
           array_to_string(tk[i:i+{_KMV_N - 1}], ' ') AS shingle
    FROM toks,
         unnest(range(1, greatest(len(tk) - {_KMV_N - 1}, 1) + 1))
             AS t(i)
), hv AS (
    SELECT DISTINCT source,
           ('0x' || substr(md5('kmv|' || shingle), 1, 15))::BIGINT AS h
    FROM sh
), rk AS (
    SELECT source, h,
           row_number() OVER (PARTITION BY source ORDER BY h) AS rn
    FROM hv
), sk AS (
    SELECT source AS g, list(h ORDER BY h) AS sk
    FROM rk WHERE rn <= {_KMV_K} GROUP BY 1
), pr AS (
    SELECT a.g AS ga, b.g AS gb, a.sk AS ska, b.sk AS skb,
           list_sort(list_distinct(a.sk || b.sk))[1:{_KMV_K}] AS mk
    FROM sk a JOIN sk b ON a.g < b.g
), est AS (
    SELECT ga, gb, ska, skb, mk,
           len(mk) AS kk,
           len(list_intersect(mk, list_intersect(ska, skb))) AS m
    FROM pr
), fin AS (
    SELECT ga, gb, kk, m,
           m / CAST(kk AS DOUBLE) AS j,
           CASE WHEN kk < {_KMV_K} THEN CAST(kk AS DOUBLE)
                ELSE {float(_KMV_K - 1)!r}
                     / ((mk[kk] + 1.0) / {_KMV_SCALE!r})
           END AS u_hat,
           CASE WHEN len(ska) < {_KMV_K}
                THEN CAST(len(ska) AS DOUBLE)
                ELSE {float(_KMV_K - 1)!r}
                     / ((ska[len(ska)] + 1.0) / {_KMV_SCALE!r})
           END AS na_hat,
           CASE WHEN len(skb) < {_KMV_K}
                THEN CAST(len(skb) AS DOUBLE)
                ELSE {float(_KMV_K - 1)!r}
                     / ((skb[len(skb)] + 1.0) / {_KMV_SCALE!r})
           END AS nb_hat
    FROM est WHERE m > 0
)
SELECT ga AS group_a, gb AS group_b,
       CAST(round(j * u_hat) AS BIGINT) AS n_shared,
       CAST(round(na_hat) AS BIGINT) AS n_a,
       CAST(round(nb_hat) AS BIGINT) AS n_b,
       round(least(1.0, (j * u_hat) / least(na_hat, nb_hat)), 6)
           AS containment,
       round(j, 6) AS jaccard
FROM fin
"""


@query("source_overlap_kmv_md5", _KMV_MD5_ORACLE)
def q_source_overlap_kmv_md5(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """KMV-sketch source overlap under the md5 oracle hash family
    (ext.curation.source_overlap_minhash(hash_fn="md5")): identical
    sketch/estimator algebra to the xxhash64 production twin, but the
    15-hex-digit md5→bigint hash mirrors into ANSI SQL, so the oracle
    replays the ENTIRE pipeline — per-group bottom-k sketch, pairwise
    merge, and the (k-1)/u_k cardinality, bottom-k Jaccard, and
    containment estimators — and the value-hash match proves the
    estimator algebra itself, not just the plumbing (the
    dedup_minhash / dedup_minhash_fast pattern applied to the one
    sketch op that still lacked it, r10 verdict #8)."""
    from deftunes_spark.ext import curation as C

    docs = _t_cpu(spark, sf_dir, "documents")
    return C.source_overlap_minhash(
        docs, "source", "text", n=_KMV_N, k=_KMV_K, hash_fn="md5"
    )


# =====================================================================
# Byte-level (byte-fallback) BPE roundtrip (r10 verdict #6)
# =====================================================================

# No lower(), no marker-literal exclusion: byte-level BPE round-trips
# ARBITRARY text (emoji, CJK, control bytes, even the char-level
# path's "</w>" marker literal) — the only normalization is the
# whitespace-class split/join both tokenizer families share.
_BYTE_BPE_ORACLE = f"""
SELECT doc_id,
       array_to_string(list_filter(regexp_split_to_array(
           text, '{_WS}'), x -> x <> ''), ' ') AS decoded,
       CAST(len(list_filter(regexp_split_to_array(
           text, '{_WS}'), x -> x <> '')) AS BIGINT) AS n_words
FROM documents
WHERE text IS NOT NULL
"""


def _byte_merges_cached(spark: SparkSession, sf_dir: str):
    """Train-once-per-session byte-level merge table (the r9
    _bpe_merges_cached pattern: training is one-time setup, so the
    benched region times encode/decode, not the trainer)."""
    key = ("_byte_bpe_merges", sf_dir)
    cache = getattr(spark, "_deftunes_bpe_cache", None)
    if cache is None:
        cache = {}
        spark._deftunes_bpe_cache = cache
    if key not in cache:
        from deftunes_spark.ext.tokenizer import bpe_train

        docs = _t_cpu(spark, sf_dir, "documents")
        cache[key] = bpe_train(
            docs.filter(F.col("text").isNotNull()),
            num_merges=8,
            min_freq=2,
            byte_level=True,
        )
    return cache[key]


@query("bpe_byte_roundtrip", _BYTE_BPE_ORACLE)
def q_bpe_byte_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Byte-fallback BPE encode→decode closure
    (ext.tokenizer.bpe_train/bpe_encode/bpe_decode(byte_level=True)):
    every UTF-8 byte of each word becomes a latin-1 unit symbol over
    the FIXED 256-symbol base alphabet, so nothing is ever OOV
    (n_unk structurally 0) and decode(encode(x)) == the whitespace-
    normalized ORIGINAL text — case, emoji, CJK, control bytes, and
    the char-level marker literal included. A strictly stronger
    invariant than the char-level roundtrip (which lowercases and
    must exclude marker-literal docs), value-checked against the
    pure-SQL normalization with NO exclusion filter. Encode is the
    same zero-shuffle Arrow mapInPandas riding the scan; decode stays
    a pure codegen projection (map literal + ISO-8859-1→UTF-8
    recode, both JVM built-ins)."""
    from deftunes_spark.ext.tokenizer import (
        BYTE_ALPHABET,
        bpe_decode,
        bpe_encode,
    )

    merges = _byte_merges_cached(spark, sf_dir)
    docs = _t_cpu(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    enc = bpe_encode(docs, merges, byte_level=True)
    dec = bpe_decode(enc, merges, BYTE_ALPHABET, byte_level=True)
    # decoded is single-space-joined words, so its space-split size IS
    # the word count (empty text → 0) — the same derivation the
    # oracle applies to the source text, reached through the full
    # encode→ids→decode chain.
    return dec.select(
        "doc_id",
        "decoded",
        F.when(F.col("decoded") == "", F.lit(0))
        .otherwise(F.size(F.split(F.col("decoded"), " ")))
        .cast("bigint")
        .alias("n_words"),
    )
