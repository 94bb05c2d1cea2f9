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


# =====================================================================
# End-to-end pretraining pipeline composition (r10 verdict #5)
# =====================================================================

_E2E_CAP = 512
_E2E_PACK_SHARDS = 16
_E2E_EXPORT_SHARDS = 8
_E2E_MIX_BUCKETS = 16_777_216  # 24-bit md5 bucket space
_E2E_STOP_SQL = (
    "['the','be','to','of','and','that','have','with','a']"
)


def _e2e_oracle() -> str:
    """Replay the WHOLE chain in DuckDB: gopher subset filter →
    md5-minhash near-dup keep-set → in-plan uniform-target mixture
    downsample → byte tokenizer (token_count = UTF-8 octets of the
    whitespace words; decode == case-preserving normalized text, the
    identity `bpe_byte_roundtrip` proves independently) → concat-pack
    window → export-shard manifest aggregate."""
    from deftunes_spark.driver_queries_ext import _minhash_oracle

    mh = _minhash_oracle(relation="g")
    return f"""
WITH g AS (
    SELECT doc_id, source, text
    FROM documents
    WHERE text IS NOT NULL AND (
        len(list_filter(regexp_split_to_array(lower(trim(text)),
            '{_WS}'), x -> x <> '')) BETWEEN 50 AND 100000
        AND len(list_intersect(list_distinct(
            list_filter(regexp_split_to_array(lower(trim(text)),
                '{_WS}'), x -> x <> '')), {_E2E_STOP_SQL})) >= 2
    )
), dup AS (
    SELECT DISTINCT id_b FROM ({mh}) mh_pairs
), dd AS (
    SELECT g.* FROM g
    LEFT JOIN dup ON g.doc_id = dup.id_b
    WHERE dup.id_b IS NULL
), cnt AS (
    SELECT source, count(*) AS n FROM dd GROUP BY 1
), mn AS (
    SELECT min(n) AS mn FROM cnt
), rt AS (
    SELECT source,
           CASE WHEN CAST(mn AS DOUBLE) / n >= 1.0 - 1e-9 THEN 1.0
                ELSE CAST(mn AS DOUBLE) / n END AS rate
    FROM cnt CROSS JOIN mn
), mix AS (
    SELECT dd.doc_id, dd.text FROM dd JOIN rt USING (source)
    WHERE ('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)),
               1, 6))::BIGINT
          < CAST(floor(rate * {_E2E_MIX_BUCKETS}.0) AS BIGINT)
), enc AS (
    SELECT doc_id,
           array_to_string(list_filter(regexp_split_to_array(
               text, '{_WS}'), x -> x <> ''), ' ') AS decoded,
           CAST(strlen(array_to_string(list_filter(
               regexp_split_to_array(text, '{_WS}'), x -> x <> ''),
               '')) AS BIGINT) AS token_count
    FROM mix
), p AS (
    SELECT doc_id, decoded, token_count,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                ::BIGINT % {_E2E_PACK_SHARDS} AS INT) AS pack_shard
    FROM enc
), q AS (
    SELECT doc_id, decoded, token_count,
           CAST(coalesce(sum(token_count) OVER (
                    PARTITION BY pack_shard ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0) AS BIGINT) AS start_offset
    FROM p
), r AS (
    SELECT doc_id, decoded, token_count,
           CAST(floor((start_offset + greatest(token_count, 1) - 1)
                      / {_E2E_CAP}.0)
                - floor(start_offset / {_E2E_CAP}.0) + 1 AS BIGINT)
               AS n_seqs,
           CAST(('0x' || substr(md5('exp|' || CAST(doc_id AS VARCHAR)),
                1, 8))::BIGINT % {_E2E_EXPORT_SHARDS} AS INT) AS shard
    FROM q
)
SELECT shard,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(len(list_filter(regexp_split_to_array(trim(decoded),
            '{_WS}'), x -> x <> ''))) AS BIGINT) AS n_tokens,
       CAST(sum(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|V|'
            || decoded), 1, 10))::BIGINT) AS BIGINT) AS content_hash,
       CAST(sum(token_count) AS BIGINT) AS byte_tokens,
       CAST(sum(n_seqs) AS BIGINT) AS n_seqs
FROM r GROUP BY 1
"""


def build_pretrain_pipeline(
    spark: SparkSession, sf_dir: str, stopword_rule: bool = True
):
    """The lazy end-to-end plan (everything up to the export write):
    curation filter → md5-minhash keep-set → in-plan mixture
    downsample → byte-level tokenize (mapInPandas) → decode → pack —
    composed as ONE DataFrame with no intermediate action (mixture
    rates come from an in-plan groupBy + scalar-min broadcast, not a
    driver collect). Split out so the plan test can assert the
    single-job-graph property on exactly what the query runs."""
    from deftunes_spark.ext import dedup as D
    from deftunes_spark.ext.text import gopher_quality_flags
    from deftunes_spark.ext.tokenizer import (
        BYTE_ALPHABET,
        bpe_decode,
        bpe_encode,
    )
    from deftunes_spark.ext.training import sequence_pack_concat

    docs = _t_cpu(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    flags = gopher_quality_flags(docs).select(
        "doc_id", "pass_word_count", "pass_stopwords"
    )
    keep = F.col("pass_word_count")
    if stopword_rule:
        # The stress replicas suffix every token (the_r3), which no
        # English stopword survives — the scaled harness passes
        # stopword_rule=False so the chain it measures is non-empty;
        # the registered query keeps the full subset.
        keep = keep & F.col("pass_stopwords")
    g = (
        docs.join(flags, "doc_id")
        .filter(keep)
        .select("doc_id", "source", "text")
    )
    pairs = D.minhash_dedup_pairs(
        g,
        "doc_id",
        "text",
        n=2,
        num_hashes=32,
        bands=8,
        threshold=0.3,
        hash_fn="md5",
        hash_band_key=False,
        # dict_hashes=True materializes the distinct-shingle hash
        # dictionary with driver jobs, and the default signature
        # checkpoint localCheckpoints the signature table — both
        # intermediate actions, which the e2e contract forbids
        # (single job graph). The lazy path yields the identical pair
        # set; branch reuse of the signature exchange is Catalyst's
        # ReusedExchange inside the one plan.
        dict_hashes=False,
        signature_materialize=False,
    )
    dup = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    dd = g.join(dup, "doc_id", "left_anti")
    # In-plan mixture rates (uniform target): per-source counts +
    # a scalar min, broadcast back — no driver collect, so the chain
    # stays one job graph.
    cnt = dd.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    mn = cnt.agg(F.min("n").alias("mn"))
    rate = (
        F.when(
            F.col("mn").cast("double") / F.col("n") >= 1.0 - 1e-9,
            F.lit(1.0),
        )
        .otherwise(F.col("mn").cast("double") / F.col("n"))
    )
    rt = (
        cnt.crossJoin(F.broadcast(mn))
        .select("source", rate.alias("rate"))
    )
    bucket = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("mix|"), F.col("doc_id").cast("string")
                )
            ),
            1,
            6,
        ),
        16,
        10,
    ).cast("bigint")
    mix = (
        dd.join(F.broadcast(rt), "source")
        .filter(
            bucket
            < F.floor(
                F.col("rate") * F.lit(float(_E2E_MIX_BUCKETS))
            ).cast("bigint")
        )
        .select("doc_id", "text")
    )
    # Byte tokenizer (merges=[]: the ByT5-style vocab-256 byte
    # tokenizer) — the one encode whose token stream is SQL-derivable
    # (token_count == UTF-8 octets of the words), which is what makes
    # the END-TO-END manifest value-hash-checkable; the trained-merge
    # encode path is proven by its own queries (bpe_encode_roundtrip,
    # bpe_byte_roundtrip).
    enc = bpe_encode(mix, merges=[], byte_level=True)
    dec = bpe_decode(enc, [], BYTE_ALPHABET, byte_level=True)
    packed = sequence_pack_concat(
        dec.select("doc_id", "n_tokens"),
        "doc_id",
        text_col="",
        capacity=_E2E_CAP,
        shards=_E2E_PACK_SHARDS,
        count_col="n_tokens",
    )
    return (
        dec.select("doc_id", F.col("decoded").alias("text"))
        .join(packed.select("doc_id", "token_count", "n_seqs"), "doc_id")
    )


@query("pretrain_pipeline_e2e", _e2e_oracle())
def q_pretrain_pipeline_e2e(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The full pretraining ingest as ONE composed plan (r10 verdict
    #5): gopher-rule curation subset → md5-minhash near-dup keep-set →
    in-plan uniform-target mixture downsample → byte-level tokenize
    (zero-shuffle Arrow mapInPandas) → codegen decode → concat-pack
    window → deterministic shard export (ext.export.shard_export, the
    chain's only action) → manifest computed from the WRITTEN FILES
    READ BACK. The DuckDB oracle recomputes the per-shard manifest —
    row count, token count, order-independent content hash, byte-token
    total, sequence total — from the SOURCE relation through the same
    stages in pure SQL, so one value-hash match proves the entire
    composition end-to-end (tests/test_r11_ops.py asserts the chain
    builds as a single job graph: no intermediate action, no
    materialization barrier between stages)."""
    return run_pretrain_pipeline(spark, sf_dir)


def run_pretrain_pipeline(
    spark: SparkSession, sf_dir: str, stopword_rule: bool = True
) -> DataFrame:
    """Chain build → export → read-back manifest; split out so the
    scale harness can run the replica-compatible variant
    (``stopword_rule=False`` — the replica protocol suffixes every
    token, which no English stopword survives).

    Export lands at a FIXED path keyed on (sf_dir, variant), wiped
    before each write (r11 advice: the old per-invocation mkdtemp was
    never removed, and this query runs in bench warm-ups + adaptive
    runs + both stress tiers — repeated sweeps accumulated unbounded
    exported-corpus copies under /tmp). Disk use is now bounded at
    one export per (corpus, variant). Consequence to document: a
    DataFrame returned by an EARLIER invocation of the same
    (sf_dir, variant) goes stale once a new invocation rewrites the
    path — every harness (driver, bench, sweep, pytest) collects the
    manifest before re-invoking, so this trade is safe here."""
    from deftunes_spark.ext.export import shard_export
    from deftunes_spark.io.scratch import scratch_dir

    chain = build_pretrain_pipeline(
        spark, sf_dir, stopword_rule=stopword_rule
    )
    # Per-user 0700 root + PID-scoped directory (r12 advice): the old
    # fixed /tmp/deftunes_e2e_export/<key> could be rmtree'd mid-read
    # by a concurrent harness process on the same (sf_dir, variant),
    # and a pre-created path by another /tmp user would be followed.
    key = "%s-%s" % (sf_dir, "stop" if stopword_rule else "nostop")
    path = scratch_dir("e2e-export", key, wipe=True) + "/shards"
    shard_export(
        chain, path, n_shards=_E2E_EXPORT_SHARDS, text_col="text"
    )
    # Explicit schema on read-back: a fully-filtered corpus exports
    # ZERO data files (partitionBy writes nothing for an empty
    # relation) and schema inference would throw where the correct
    # answer is an empty manifest matching the oracle's zero rows.
    back_schema = chain.schema.add("shard", "integer")
    back = spark.read.schema(back_schema).parquet(path)
    ws_toks = F.size(
        F.filter(
            F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), _WS),
            lambda t: t != "",
        )
    ).cast("long")
    fp = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit("|V|"),
                    F.col("text"),
                )
            ),
            1,
            10,
        ),
        16,
        10,
    ).cast("bigint")
    return (
        back.groupBy(F.col("shard").cast("int").alias("shard"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(ws_toks).cast("bigint").alias("n_tokens"),
            F.sum(fp).cast("bigint").alias("content_hash"),
            F.sum("token_count").cast("bigint").alias("byte_tokens"),
            F.sum("n_seqs").cast("bigint").alias("n_seqs"),
        )
    )
