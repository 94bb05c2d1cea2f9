"""Round-8 operators: multimodal perceptual-hash near-dup, SFT
conversation-data flatten/audit, incremental ANN index maintenance.

Each entry follows the registry contract: a Spark builder plus a
DuckDB value-hash oracle mirroring the full chain (or a documented
rows-only check where SQL cannot express it)."""

from __future__ import annotations

import numpy as _np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deftunes_spark.driver_queries import _t, _t_cpu, query
from deftunes_spark.driver_queries_ext import _IVF_CENTROIDS, _sql_vec
from deftunes_spark.ext import multimodal as M
from deftunes_spark.ext import sft as SFT

# =====================================================================
# Multimodal perceptual-hash near-dup (r7 verdict #2)
# =====================================================================

_PHASH_MAX_HAMMING = 4
# Replicate every 20th doc with a shifted id: deterministic planted
# exact-payload duplicates, so the pair output is non-empty at every
# sf (the synthetic corpus has no exact text dups below sf0.1).
_PHASH_PLANT_MOD = 20
_PHASH_PLANT_SHIFT = 10_000_000


def _phash_oracle(max_hamming: int = _PHASH_MAX_HAMMING) -> str:
    """DuckDB mirror of ``image_phash(fake_decode=True)`` +
    ``phash_near_pairs``: the fake pixels are the sha256 hex-CHAIN
    bytes of (payload || '|8x8') — VARCHAR-only sha256 on both engines
    hashes identical UTF-8 bytes — and the fingerprint is kept as a
    64-char '0'/'1' string (LSB first) so chunking is substring
    equality and Hamming is a char mismatch count, the same
    no-signed-overflow trick as ``_simhash_oracle``. Bit j = 1 iff
    64·p_j > Σp (exact integer compare — no float can flip a bit)."""
    n_chunks = max_hamming + 1
    base, extra = divmod(64, n_chunks)
    bounds = []
    off = 0
    for c in range(n_chunks):
        width = base + (1 if c < extra else 0)
        bounds.append((off, width))
        off += width
    chunk_selects = " UNION ALL ".join(
        f"SELECT doc_id, fb, {c} AS chunk, "
        f"substr(fb, {off + 1}, {width}) AS ck FROM fb"
        for c, (off, width) in enumerate(bounds)
    )
    return f"""
    WITH docs AS (
        SELECT doc_id, text FROM documents WHERE text IS NOT NULL
        UNION ALL
        SELECT doc_id + {_PHASH_PLANT_SHIFT} AS doc_id, text
        FROM documents
        WHERE text IS NOT NULL AND doc_id % {_PHASH_PLANT_MOD} = 0
    ), hx AS (
        SELECT doc_id, sha256(text || '|8x8') AS h1 FROM docs
    ), h2x AS (
        SELECT doc_id, h1, sha256(h1) AS h2 FROM hx
    ), px AS (
        SELECT doc_id,
               list_transform(range(64), j -> CASE WHEN j < 32
                 THEN ('0x' || substr(h1, CAST(2*j+1 AS INT), 2))::INT
                 ELSE ('0x' || substr(h2, CAST(2*(j-32)+1 AS INT), 2))::INT
                 END) AS p
        FROM h2x
    ), ps AS (
        SELECT doc_id, p, list_sum(p) AS s FROM px
    ), fb AS (
        SELECT doc_id,
               array_to_string(list_transform(range(64), j ->
                 CASE WHEN 64 * p[CAST(j+1 AS INT)] > s
                      THEN '1' ELSE '0' END), '') AS fb
        FROM ps
    ), chunks AS (
        {chunk_selects}
    ), pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               a.fb AS fb_a, b.fb AS fb_b
        FROM chunks a JOIN chunks b
          ON a.chunk = b.chunk AND a.ck = b.ck AND a.doc_id < b.doc_id
    ), ham AS (
        SELECT id_a, id_b,
               len(list_filter(range(64), i ->
                   substr(fb_a, CAST(i + 1 AS INT), 1)
                   <> substr(fb_b, CAST(i + 1 AS INT), 1))) AS hamming
        FROM pairs
    )
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           CAST(hamming AS INT) AS hamming
    FROM ham WHERE hamming <= {max_hamming}
    """


@query("multimodal_phash_dedup", _phash_oracle())
def q_multimodal_phash_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Image near-dup over binary payloads: 64-bit average-hash
    perceptual fingerprint per payload (Arrow-batched ``mapInPandas``
    through the codec boundary — deterministic fake pixels here, PIL
    when installed) + Hamming-≤4 pairs via the SAME chunked
    equi-join as SimHash text dedup (pigeonhole full recall, never
    all-pairs). Every 20th doc is replicated with a shifted id so
    planted exact-payload duplicates guarantee pairs at every sf; the
    full chain — pixels, bits, chunk collisions, Hamming — is
    value-checked against the DuckDB oracle."""
    docs = (
        _t_cpu(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    planted = docs.filter(
        F.col("doc_id") % _PHASH_PLANT_MOD == 0
    ).withColumn("doc_id", F.col("doc_id") + F.lit(_PHASH_PLANT_SHIFT))
    payloads = M.text_as_fake_payload(docs.unionByName(planted))
    ph = M.image_phash(payloads, "doc_id", "payload", fake_decode=True)
    pairs = M.phash_near_pairs(
        ph, "doc_id", max_hamming=_PHASH_MAX_HAMMING
    )
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


# =====================================================================
# SFT / conversation data (r7 verdict #3)
# =====================================================================

# Dialogs assembled deterministically from the events table: one
# dialog per user, turns ordered by (ts, event_id), role derived from
# event_id % 3 — which seeds real alternation violations and
# misplaced-system turns for the audit to find.
_ROLE_SQL = (
    "CASE CAST(event_id % 3 AS INT) WHEN 0 THEN 'system' "
    "WHEN 1 THEN 'user' ELSE 'assistant' END"
)

_TURNS_CTE = f"""
    WITH ev AS (
        SELECT user_id AS dialog_id,
               CAST(row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) - 1 AS INT) AS turn_idx,
               {_ROLE_SQL} AS role,
               event_type AS content
        FROM events WHERE event_type IS NOT NULL
    )
"""


def _dialogs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → (dialog_id, messages array<struct<role,content>>)."""
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull())
        .select(
            F.col("user_id").alias("dialog_id"),
            "ts",
            "event_id",
            F.element_at(
                F.array(
                    F.lit("system"), F.lit("user"), F.lit("assistant")
                ),
                (F.pmod(F.col("event_id"), F.lit(3)) + 1).cast("int"),
            ).alias("role"),
            F.col("event_type").alias("content"),
        )
    )
    return ev.groupBy("dialog_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct("ts", "event_id", "role", "content")
                )
            ),
            lambda s: F.struct(
                s["role"].alias("role"), s["content"].alias("content")
            ),
        ).alias("messages")
    )


@query(
    "sft_turn_flatten",
    _TURNS_CTE
    + """
    SELECT CAST(dialog_id AS BIGINT) AS dialog_id, turn_idx, role,
           content
    FROM ev
    """,
)
def q_sft_turn_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dialog messages array → per-turn rows (posexplode + struct
    field access — the reference's session_items fan-out shape,
    transform-json-job.py:114-129). The dialog assembly (groupBy +
    array_sort(collect_list)) and the flatten round-trip through the
    array<struct> exactly; the oracle rebuilds turns with a window
    row_number, so ordering, roles, and contents are all
    value-checked."""
    return SFT.sft_turn_flatten(_dialogs(spark, sf_dir))


@query(
    "sft_role_audit",
    _TURNS_CTE
    + """
    SELECT CAST(dialog_id AS BIGINT) AS dialog_id,
           CAST(count(*) AS INT) AS n_turns,
           CAST(count(*) FILTER (
               prev_role IS NOT NULL AND role = prev_role
           ) AS INT) AS n_alt_violations,
           CAST(count(*) FILTER (
               content IS NULL OR regexp_replace(
                   content, '[ \\t\\n\\x0B\\f\\r]+', '', 'g') = ''
           ) AS INT) AS n_empty,
           CAST(count(*) FILTER (
               role = 'system' AND turn_idx > 0
           ) AS INT) AS n_system_misplaced,
           CAST(count(*) FILTER (
               role NOT IN ('user', 'assistant', 'system')
           ) AS INT) AS n_unknown_role,
           CAST(sum(CASE WHEN content IS NULL THEN 0
               ELSE len(list_filter(regexp_split_to_array(
                   trim(content), '[ \\t\\n\\x0B\\f\\r]+'),
                   t -> t <> '')) END) AS BIGINT) AS total_tokens,
           (count(*) FILTER (prev_role IS NOT NULL
                             AND role = prev_role) = 0
            AND count(*) FILTER (content IS NULL
                                 OR regexp_replace(content,
                '[ \\t\\n\\x0B\\f\\r]+', '', 'g') = '') = 0
            AND count(*) FILTER (role = 'system'
                                 AND turn_idx > 0) = 0
            AND count(*) FILTER (role NOT IN
                ('user', 'assistant', 'system')) = 0) AS audit_ok
    FROM (
        SELECT *, lag(role) OVER (
            PARTITION BY dialog_id ORDER BY turn_idx
        ) AS prev_role
        FROM ev
    )
    GROUP BY dialog_id
    """,
)
def q_sft_role_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dialog SFT structure audit: alternation violations, empty
    turns, misplaced system prompts, unknown roles, token totals —
    pure HOF expressions over the messages array (no explode, no
    extra shuffle). The derived roles seed real violations, so the
    counters are exercised non-trivially and value-checked against a
    window-function oracle."""
    return SFT.sft_role_audit(_dialogs(spark, sf_dir))


@query(
    "sft_loss_mask_spans",
    _TURNS_CTE
    + """
    SELECT CAST(dialog_id AS BIGINT) AS dialog_id, turn_idx, role,
           n_tokens,
           CAST(coalesce(sum(n_tokens) OVER (
               PARTITION BY dialog_id ORDER BY turn_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS start_tok,
           CAST(sum(n_tokens) OVER (
               PARTITION BY dialog_id ORDER BY turn_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS end_tok,
           (role = 'assistant') AS trainable
    FROM (
        SELECT *, CAST(len(list_filter(regexp_split_to_array(
                   trim(coalesce(content, '')),
                   '[ \\t\\n\\x0B\\f\\r]+'),
                   t -> t <> '')) AS BIGINT) AS n_tokens
        FROM ev
    )
    """,
)
def q_sft_loss_mask_spans(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-turn token spans + loss-mask flags over the assembled
    dialogs: [start_tok, end_tok) offsets within the concatenated
    dialog via a zero-shuffle HOF prefix-sum fold (the oracle rebuilds
    the same offsets with a window cumsum — different mechanism, same
    exact integers), assistant turns trainable, user/system masked."""
    return SFT.sft_loss_mask_spans(_dialogs(spark, sf_dir))


# =====================================================================
# Incremental ANN index maintenance (r7 verdict #5)
# =====================================================================


def _ann_incremental_oracle() -> str:
    """DuckDB mirror of the two-run ``incremental_ivf_assign`` chain:
    run 1 stores the literal quantizer + the OLD batch's occupancy;
    run 2 assigns the NEW batch against the stored version. Both
    assignments are the same constant-folded argmin over the same
    centroid literals as ``ann_ivf_topk``'s oracle; the drift ratio is
    one integer-product division rounded once."""
    d_exprs = ", ".join(
        f"list_dot_product(v, v) - 2.0 * list_dot_product(v, "
        f"{_sql_vec(c)}) + {float(_np.dot(c, c))!r}"
        for c in _IVF_CENTROIDS
    )
    return f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), d AS (
        SELECT vec_id, [{d_exprs}] AS dl FROM e
    ), a AS (
        SELECT vec_id,
               CAST(list_position(dl, list_min(dl)) - 1 AS INT)
                   AS ivf_list
        FROM d
    ), aold AS (
        SELECT * FROM a WHERE vec_id % 3 <> 0
    ), anew AS (
        SELECT * FROM a WHERE vec_id % 3 = 0
    ), fo AS (
        SELECT ivf_list, count(*) AS fit_rows FROM aold GROUP BY 1
    ), bo AS (
        SELECT ivf_list, count(*) AS batch_rows FROM anew GROUP BY 1
    ), tot AS (
        SELECT (SELECT count(*) FROM aold) AS ft,
               (SELECT count(*) FROM anew) AS bt
    )
    SELECT CAST(anew.vec_id AS BIGINT) AS vec_id,
           anew.ivf_list,
           CAST(bo.batch_rows AS BIGINT) AS batch_list_rows,
           CAST(coalesce(fo.fit_rows, 0) AS BIGINT) AS fit_list_rows,
           CASE WHEN coalesce(fo.fit_rows, 0) > 0 THEN
               round((bo.batch_rows * tot.ft)::DOUBLE
                     / (fo.fit_rows * tot.bt)::DOUBLE, 6)
           END AS occupancy_ratio
    FROM anew
    JOIN bo USING (ivf_list)
    LEFT JOIN fo USING (ivf_list)
    CROSS JOIN tot
    """


@query("ann_incremental", _ann_incremental_oracle())
def q_ann_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN index maintenance: run 1 stores the fixed
    literal quantizer (version 1 of the versioned store) with the OLD
    batch's fit-time occupancy; run 2 assigns the NEW batch
    (vec_id % 3 == 0) against the STORED version — never refitting —
    and emits per-list occupancy drift (batch share / fit share), the
    refit trigger signal. Assignment is deterministic given the
    stored centroids (doubles round-trip parquet exactly), so the
    whole two-run chain value-hash-mirrors into SQL."""
    from deftunes_spark.ext.similarity import incremental_ivf_assign
    from deftunes_spark.io.versioned import list_versions

    emb = _t_cpu(spark, sf_dir, "embeddings")
    old = emb.filter(F.col("vec_id") % 3 != 0)
    new = emb.filter(F.col("vec_id") % 3 == 0)
    store = _ann_store_path(spark, sf_dir)
    if not list_versions(spark, store):
        # run 1: fit-time ingest; output discarded. Skipped entirely
        # on later invocations in the session — the write would be a
        # no-op but the old-batch chain's eager store read + limit(0)
        # job were pure dead work (r8 review).
        incremental_ivf_assign(
            spark, old, store, centroids=_IVF_CENTROIDS
        ).limit(0).collect()
    return incremental_ivf_assign(spark, new, store)


# One store per (session, sf_dir) — the bucketed_join_colocated
# pattern: a fresh mkdtemp per INVOCATION leaked a /tmp directory on
# every sweep/bench/stress build (r8 review). Reuse is deterministic:
# run 1 only writes when the store is absent, and the fixed literal
# quantizer + old batch make version 1 identical either way.
_ANN_STORES: dict[tuple[str, str], str] = {}


def _ann_store_path(spark: SparkSession, sf_dir: str) -> str:
    import tempfile as _tf

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _ANN_STORES:
        _ANN_STORES[key] = (
            _tf.mkdtemp(prefix="deftunes_annstore_") + "/store"
        )
    return _ANN_STORES[key]
