"""Round-10 operators: deterministic training-shard export + manifest
(the pipeline's missing last stage — r9 verdict #6).

Each entry follows the registry contract: a Spark builder plus a
DuckDB value-hash oracle mirroring the full chain."""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

from deftunes_spark.driver_queries import _t_cpu, query

_N_SHARDS = 16

_WS = "[ \\t\\n\\x0B\\f\\r]+"

# The oracle recomputes the manifest from the SOURCE relation with the
# same engine-portable md5 derivations the export writes with; the
# Spark side computes it from the WRITTEN FILES READ BACK — a hash
# match therefore proves shard assignment, write/read integrity, token
# accounting, and content identity in one check.
_SHARD_MANIFEST_ORACLE = f"""
SELECT CAST(('0x' || substr(md5('exp|' || CAST(doc_id AS VARCHAR)),
           1, 8))::BIGINT % {_N_SHARDS} AS INT) AS shard,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(len(list_filter(regexp_split_to_array(
           trim(coalesce(text, '')), '{_WS}'), x -> x <> '')))
           AS BIGINT) AS n_tokens,
       CAST(sum(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|'
           || CASE WHEN text IS NULL THEN 'N' ELSE 'V' END || '|'
           || coalesce(text, '')), 1, 10))::BIGINT) AS BIGINT)
           AS content_hash
FROM documents
GROUP BY 1
"""


@query("shard_export_manifest", _SHARD_MANIFEST_ORACLE)
def q_shard_export_manifest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Training-shard export roundtrip (ext.export): write the
    documents table as {n} deterministic md5-hash-mod parquet shards
    (one pass, ONE shuffle keyed on the shard id, exactly one file
    per shard), read the shard directory back, and emit the manifest
    — per-shard row count, whitespace-token count, and the
    order-independent 40-bit-md5-sum content hash. The oracle
    recomputes all four columns from the source relation in pure SQL,
    so the value-hash match proves the written files carry exactly
    the source rows (nothing dropped, duplicated, re-sharded, or
    altered). Idempotent-rewrite + one-file-per-shard pinned in
    tests/test_export.py."""
    from deftunes_spark.ext.export import shard_export, shard_manifest

    docs = _t_cpu(spark, sf_dir, "documents").select("doc_id", "text")
    path = tempfile.mkdtemp(prefix="deftunes_shardexp_") + "/docs"
    shard_export(docs, path, n_shards=_N_SHARDS)
    return shard_manifest(spark.read.parquet(path))


# =====================================================================
# Unigram-LM encode (tokenizer-family symmetry: the SentencePiece
# twin of the r9 BPE encode loop)
# =====================================================================

from pyspark.sql import functions as F  # noqa: E402

from deftunes_spark.ext.tokenizer import WORD_MARK as _UNI_MARK  # noqa: E402

_UNIGRAM_ROUNDTRIP_ORACLE = f"""
SELECT doc_id,
       array_to_string(list_filter(regexp_split_to_array(
           lower(trim(text)), '{_WS}'), x -> x <> ''), ' ')
           AS reconstructed,
       CAST(len(list_filter(regexp_split_to_array(
           lower(trim(text)), '{_WS}'), x -> x <> '')) AS BIGINT)
           AS n_words
FROM documents
WHERE text IS NOT NULL AND strpos(text, '{_UNI_MARK}') = 0
"""


def _unigram_vocab_cached(spark: SparkSession, sf_dir: str):
    """Train once per (session, sf_dir) — the ``_bpe_merges_cached``
    discipline: the encode query must measure the ENCODE stage, not
    re-pay the trainer's corpus pass per invocation, and it must pin
    the same (vocab_size=80, seed_size=400) table the ``unigram_vocab``
    trainer query registers."""
    from deftunes_spark.ext.tokenizer import unigram_train

    key = ("_unigram_vocab", sf_dir)
    cache = getattr(spark, "_deftunes_bpe_cache", None)
    if cache is None:
        cache = {}
        spark._deftunes_bpe_cache = cache
    if key not in cache:
        docs = _t_cpu(spark, sf_dir, "documents")
        cache[key] = unigram_train(
            docs, vocab_size=80, seed_size=400
        )
    return cache[key]


@query("unigram_encode_roundtrip", _UNIGRAM_ROUNDTRIP_ORACLE)
def q_unigram_encode_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Corpus-scale unigram-LM APPLY (ext.tokenizer.unigram_encode) —
    the SentencePiece-family twin of ``bpe_encode``, completing the
    tokenizer loop for the repo's second trainer: ship the trained
    piece-score table in the task closure, Viterbi-segment every
    document in one Arrow-batched mapInPandas stage (zero shuffle,
    linear in tokens), and emit units with Kudo's U+2581 word-boundary
    marker prefixed to each word-initial piece. Because Viterbi spans
    partition each word exactly and unknown characters fall back to
    single-char pieces, concatenating the units and turning markers
    back into spaces MUST reconstruct the whitespace-normalized
    lowercased text, and the marker count MUST equal the word count —
    both value-checked against the SQL oracle (the
    ``bpe_encode_roundtrip`` pattern; segmentation itself is
    parity-pinned against the local Viterbi reference in
    tests/test_r10_ops.py). Docs containing the reserved marker
    literal are excluded on both sides."""
    from deftunes_spark.ext.tokenizer import (
        WORD_MARK,
        unigram_encode,
    )

    vocab = _unigram_vocab_cached(spark, sf_dir)
    docs = _t_cpu(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
        & (F.instr(F.col("text"), WORD_MARK) == 0)
    )
    enc = unigram_encode(docs, vocab, emit="units")
    return enc.select(
        "doc_id",
        F.trim(
            F.regexp_replace(
                F.array_join(F.col("units"), ""), WORD_MARK, " "
            )
        ).alias("reconstructed"),
        F.size(
            F.filter(
                F.col("units"),
                lambda u: u.startswith(WORD_MARK),
            )
        ).cast("bigint").alias("n_words"),
    )


# =====================================================================
# Corpus divergence: per-language unigram KL vs the corpus mixture
# =====================================================================

_KL_ALPHA = 0.5

# The oracle computes the DENSE textbook definition (full group x
# vocab grid); the Spark side computes the sparse observed-cells
# decomposition — the value-hash match proves the decomposition
# algebra itself every round (the probes/bands proof pattern).
_KL_ORACLE = f"""
WITH w AS (
    SELECT lang AS grp, unnest(list_filter(regexp_split_to_array(
        lower(trim(text)), '{_WS}'), x -> x <> '')) AS word
    FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
), wc AS (
    SELECT grp, word, CAST(count(*) AS DOUBLE) AS c
    FROM w GROUP BY 1, 2
), wt AS (
    SELECT word, sum(c) AS cw FROM wc GROUP BY 1
), gt AS (
    SELECT grp, sum(c) AS ng FROM wc GROUP BY 1
), tot AS (
    SELECT sum(cw) AS nt, CAST(count(*) AS DOUBLE) AS v FROM wt
), grid AS (
    SELECT g.grp, g.ng, t.cw, coalesce(c.c, 0.0) AS c,
           tot.nt, tot.v
    FROM gt g CROSS JOIN wt t CROSS JOIN tot
    LEFT JOIN wc c ON c.grp = g.grp AND c.word = t.word
)
SELECT grp AS lang,
       CAST(ng AS BIGINT) AS n_words,
       CAST(v AS BIGINT) AS vocab_size,
       round(sum(
           ((c + {_KL_ALPHA}) / (ng + {_KL_ALPHA} * v))
           * ln(((c + {_KL_ALPHA}) / (ng + {_KL_ALPHA} * v))
                / ((cw + {_KL_ALPHA}) / (nt + {_KL_ALPHA} * v)))
       ), 5) AS kl
FROM grid
GROUP BY grp, ng, v
"""


@query("unigram_kl_divergence", _KL_ORACLE)
def q_unigram_kl_divergence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-language unigram KL divergence vs the corpus mixture
    (ext.curation.unigram_kl_by_group) — the lexical drift monitor
    next to embedding_drift_psi. Spark evaluates the SPARSE
    decomposition (observed cells + two corpus scalars; no
    groups x vocab grid, the 100 TB shape); the oracle evaluates the
    dense textbook sum over the full grid, so the hash match proves
    the decomposition algebra, not just the plumbing."""
    from deftunes_spark.ext.curation import unigram_kl_by_group

    docs = _t_cpu(spark, sf_dir, "documents")
    # round_to=5 (not the function default 6): the sparse-vs-dense
    # association noise is ~1e-12, so 5 decimals carries a 10x margin
    # against a boundary flip in the value-hash compare (r10 ADVICE).
    return unigram_kl_by_group(
        docs, "lang", alpha=_KL_ALPHA, round_to=5
    )


# =====================================================================
# N-gram novelty (memorization / boilerplate curation signal)
# =====================================================================

_NOVELTY_N = 3

_NOVELTY_ORACLE = f"""
WITH toklist AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '{_WS}') AS toks
    FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
), sh AS (
    SELECT DISTINCT doc_id,
           array_to_string(toks[i:i+{_NOVELTY_N - 1}], ' ') AS shingle
    FROM toklist,
         UNNEST(range(1, greatest(len(toks) - {_NOVELTY_N - 1}, 1) + 1))
             AS t(i)
), dfc AS (
    SELECT shingle, count(*) AS dfreq FROM sh GROUP BY 1
)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN d.dfreq = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_novel,
       round(CAST(sum(CASE WHEN d.dfreq = 1 THEN 1 ELSE 0 END)
           AS DOUBLE) / count(*), 6) AS novelty
FROM sh s JOIN dfc d USING (shingle)
GROUP BY 1
"""


@query("ngram_novelty", _NOVELTY_ORACLE)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document word-3-gram novelty (ext.curation.ngram_novelty):
    the fraction of a doc's distinct shingles occurring in no other
    document — the boilerplate/originality curation signal. Canonical
    shingles_mapside explode (zero-exchange per-doc dedup), ONE
    map-side-combined doc-frequency aggregate, keyed join back,
    groupBy(doc) rollup; aggregate-then-join rather than
    count-over-window so a hot boilerplate shingle collapses map-side
    instead of buffering one window partition."""
    from deftunes_spark.ext.curation import ngram_novelty

    docs = _t_cpu(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.trim(F.col("text")) != "")
    )
    return ngram_novelty(docs, n=_NOVELTY_N)


_UNIGRAM_DECODE_ORACLE = f"""
SELECT doc_id,
       array_to_string(list_filter(regexp_split_to_array(
           lower(trim(text)), '{_WS}'), x -> x <> ''), ' ')
           AS decoded
FROM documents
WHERE text IS NOT NULL AND strpos(text, '{_UNI_MARK}') = 0
"""


@query("unigram_decode", _UNIGRAM_DECODE_ORACLE)
def q_unigram_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram tokenizer loop closed (the ``bpe_decode`` bracket
    pattern for the SECOND trainer family): ids → text through
    ext.tokenizer.unigram_decode — the inverse of the deterministic
    marked+plain ``unigram_vocab_ids`` table as a PURE CODEGEN
    projection (literal map lookup + concat + marker→space; zero
    UDF, zero shuffle). Word boundaries live in the id stream
    (word-initial pieces hold marked ids) and the trainer retains
    every single character of its corpus, so decode(encode(text))
    MUST equal the whitespace-normalized lowercased text —
    value-checked in SQL, and the invariant that exercises the id
    TABLE itself (a wrong or colliding id decodes to the wrong
    piece string). OOV → replacement char, never dropped
    (tests/test_r10_ops.py)."""
    from deftunes_spark.ext.tokenizer import (
        WORD_MARK,
        unigram_decode,
        unigram_encode,
    )

    vocab = _unigram_vocab_cached(spark, sf_dir)
    docs = _t_cpu(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
        & (F.instr(F.col("text"), WORD_MARK) == 0)
    )
    enc = unigram_encode(docs, vocab, emit="ids")
    return unigram_decode(enc, vocab).select("doc_id", "decoded")
