"""Round-9 operators: preference/RLHF pair audit + prompt near-dup
(the post-training surface's second half, next to ext/sft.py), and
the distributed BPE encode stage.

Each entry follows the registry contract: a Spark builder plus a
DuckDB value-hash oracle mirroring the full chain (or a documented
rows-only check where SQL cannot express it)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deftunes_spark.driver_queries import _t_cpu, query
from deftunes_spark.ext import preference as P

# =====================================================================
# Preference-pair fixtures (r8 verdict #2)
# =====================================================================
#
# Pairs assembled deterministically from the documents table — the
# same derived-fixture discipline as the SFT dialogs (events →
# role-coded turns): prompt groups of ~4 pairs, responses sliced from
# the doc text, and every violation class SEEDED so the audit
# counters are exercised non-trivially:
#   doc_id % 13 == 3  → rejected == chosen      (degenerate_pair)
#   doc_id % 13 == 5  → rejected = ''           (rejected_empty)
#   doc_id % 13 == 7  → rejected = '\t\n'       (whitespace-only —
#                        the ext.sft r8-advice rule)
#   doc_id % 13 == 9  → rejected = NULL
#   doc_id % 29 == 7  → prompt drifts ' (v2)'   (prompt_mismatch)
#   doc_id % 31 == 11 → prompt = NULL           (prompt_empty)
#   rewards (d%10)/10 vs (d%7)/10               (nonpositive_margin
#                        wherever d%10 ≤ d%7)

_PROMPT_BASE = ": please compare the responses"


def _pref_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.col("doc_id")
    pid = F.floor(d / F.lit(4)).cast("bigint")
    prompt = F.when(d % 31 == 11, F.lit(None).cast("string")).otherwise(
        F.concat(
            F.lit("P"),
            pid.cast("string"),
            F.lit(_PROMPT_BASE),
            F.when(d % 29 == 7, F.lit(" (v2)")).otherwise(F.lit("")),
        )
    )
    chosen = F.substring(F.col("text"), 1, 150)
    m13 = d % 13
    rejected = (
        F.when(m13 == 3, chosen)
        .when(m13 == 5, F.lit(""))
        .when(m13 == 7, F.lit("\t\n"))
        .when(m13 == 9, F.lit(None).cast("string"))
        .otherwise(F.substring(F.col("text"), 121, 150))
    )
    return (
        _t_cpu(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            d.alias("pair_id"),
            pid.alias("prompt_id"),
            prompt.alias("prompt"),
            chosen.alias("chosen"),
            rejected.alias("rejected"),
            ((d % 10).cast("double") / 10.0).alias("reward_chosen"),
            ((d % 7).cast("double") / 10.0).alias("reward_rejected"),
        )
    )


_WS = "[ \\t\\n\\x0B\\f\\r]+"

_PREF_PAIRS_CTE = f"""
WITH base AS (
    SELECT doc_id AS pair_id,
           CAST(floor(doc_id / 4) AS BIGINT) AS prompt_id,
           CASE WHEN doc_id % 31 = 11 THEN NULL
                ELSE 'P' || CAST(CAST(floor(doc_id / 4) AS BIGINT)
                            AS VARCHAR)
                     || '{_PROMPT_BASE}'
                     || CASE WHEN doc_id % 29 = 7
                             THEN ' (v2)' ELSE '' END
           END AS prompt,
           substr(text, 1, 150) AS chosen,
           CASE CAST(doc_id % 13 AS INT)
               WHEN 3 THEN substr(text, 1, 150)
               WHEN 5 THEN ''
               WHEN 7 THEN (chr(9) || chr(10))
               WHEN 9 THEN NULL
               ELSE substr(text, 121, 150)
           END AS rejected,
           CAST(doc_id % 10 AS DOUBLE) / 10.0 AS reward_chosen,
           CAST(doc_id % 7 AS DOUBLE) / 10.0 AS reward_rejected
    FROM documents WHERE text IS NOT NULL
)
"""

_PREF_AUDIT_ORACLE = (
    _PREF_PAIRS_CTE
    + f"""
, canon AS (
    SELECT prompt_id, min(prompt) AS canon_prompt
    FROM base GROUP BY 1
), tok AS (
    SELECT b.*, c.canon_prompt,
           CAST(len(list_filter(regexp_split_to_array(
               trim(coalesce(chosen, '')), '{_WS}'), t -> t <> ''))
               AS BIGINT) AS n_c,
           CAST(len(list_filter(regexp_split_to_array(
               trim(coalesce(rejected, '')), '{_WS}'), t -> t <> ''))
               AS BIGINT) AS n_r
    FROM base b JOIN canon c USING (prompt_id)
)
SELECT pair_id, prompt_id,
       (prompt IS NULL
        OR regexp_replace(prompt, '{_WS}', '', 'g') = '')
           AS prompt_empty,
       (chosen IS NULL
        OR regexp_replace(chosen, '{_WS}', '', 'g') = '')
           AS chosen_empty,
       (rejected IS NULL
        OR regexp_replace(rejected, '{_WS}', '', 'g') = '')
           AS rejected_empty,
       (chosen IS NOT NULL AND rejected IS NOT NULL
        AND trim(regexp_replace(chosen, '{_WS}', ' ', 'g'))
            = trim(regexp_replace(rejected, '{_WS}', ' ', 'g')))
           AS degenerate_pair,
       (prompt IS DISTINCT FROM canon_prompt) AS prompt_mismatch,
       ((reward_chosen - reward_rejected) <= 0)
           AS nonpositive_margin,
       n_c AS n_tokens_chosen,
       n_r AS n_tokens_rejected,
       CASE WHEN n_r > 0
            THEN round(CAST(n_c AS DOUBLE) / CAST(n_r AS DOUBLE), 6)
       END AS len_ratio,
       round(reward_chosen - reward_rejected, 6) AS margin,
       NOT ((prompt IS NULL
             OR regexp_replace(prompt, '{_WS}', '', 'g') = '')
            OR (chosen IS NULL
                OR regexp_replace(chosen, '{_WS}', '', 'g') = '')
            OR (rejected IS NULL
                OR regexp_replace(rejected, '{_WS}', '', 'g') = '')
            OR (chosen IS NOT NULL AND rejected IS NOT NULL
                AND trim(regexp_replace(chosen, '{_WS}', ' ', 'g'))
                    = trim(regexp_replace(rejected, '{_WS}', ' ', 'g')))
            OR (prompt IS DISTINCT FROM canon_prompt)
            OR ((reward_chosen - reward_rejected) <= 0)) AS audit_ok
FROM tok
"""
)


@query("preference_pair_audit", _PREF_AUDIT_ORACLE)
def q_preference_pair_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-pair RLHF structural audit (ext.preference): empty sides
    under the repo-wide whitespace class, degenerate chosen==rejected
    pairs, prompt drift within a prompt group, reward-margin sanity,
    token-length stats — the quarantine predicate before reward-model
    / DPO training. Every violation class is seeded by the fixture
    derivation, so all six flags are exercised and value-checked."""
    return P.preference_pair_audit(
        _pref_pairs(spark, sf_dir),
        reward_chosen_col="reward_chosen",
        reward_rejected_col="reward_rejected",
    )


# ---------------------------------------------------------------------
# Prompt near-dup across pairs
# ---------------------------------------------------------------------
#
# Prompts sliced from doc text (so they have real token mass), each
# repeated once per response row (the pair relation's natural shape),
# with every 20th prompt replicated under a shifted group id plus a
# short suffix — planted near-dups that guarantee non-empty output at
# every sf, exactly the multimodal_phash_dedup planting discipline.

_PROMPT_PLANT_MOD = 20
_PROMPT_PLANT_SHIFT = 10_000_000
_PROMPT_PLANT_SUFFIX = " extra words appended here"


def _prompt_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    prom = (
        _t_cpu(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            F.col("doc_id").alias("prompt_id"),
            F.substring(F.col("text"), 1, 200).alias("prompt"),
        )
    )
    plant = prom.filter(
        F.col("prompt_id") % _PROMPT_PLANT_MOD == 0
    ).select(
        (F.col("prompt_id") + F.lit(_PROMPT_PLANT_SHIFT)).alias(
            "prompt_id"
        ),
        F.concat(
            F.col("prompt"), F.lit(_PROMPT_PLANT_SUFFIX)
        ).alias("prompt"),
    )
    both = prom.unionByName(plant)
    # two response rows per prompt: the dedup must collapse them
    return both.withColumn(
        "resp", F.explode(F.array(F.lit("a"), F.lit("b")))
    )


# Shingle document-frequency cap (r10): the plant suffix is appended
# AFTER any corpus transformation, so its shingles are shared by
# EVERY planted variant — df ∝ corpus, Σdf² ∝ corpus², and the 100×
# stress measured exactly that (4.7 s → 290 s per decade, 1.25e9
# candidate rows landing on TWO shuffle keys). The cap is the same
# engineered stopword-shingle guard as `dedup_jaccard_dfcap`:
# benign within-text shingle families stay ≤ ~25 df at every tested
# scale, the corpus-proportional suffix shingles cross 64 at sf0.1
# and beyond. Semantics = exact Jaccard of the FILTERED sets,
# mirrored verbatim in the oracle (at sf0.01 nothing crosses the
# cap, so the r9 output is reproduced bit-for-bit).
_PREF_DEDUP_MAXDF = 64

_PREF_DEDUP_ORACLE = f"""
WITH prom AS (
    SELECT doc_id AS prompt_id, substr(text, 1, 200) AS prompt
    FROM documents WHERE text IS NOT NULL
    UNION ALL
    SELECT doc_id + {_PROMPT_PLANT_SHIFT} AS prompt_id,
           substr(text, 1, 200) || '{_PROMPT_PLANT_SUFFIX}' AS prompt
    FROM documents
    WHERE text IS NOT NULL AND doc_id % {_PROMPT_PLANT_MOD} = 0
), toklist AS (
    SELECT prompt_id,
           regexp_split_to_array(trim(prompt), '{_WS}') AS toks
    FROM prom
), sets0 AS (
    SELECT prompt_id, list_distinct(list_transform(
        range(1, greatest(len(toks) - 2, 1) + 1),
        i -> array_to_string(toks[i:i+2], ' '))) AS ss
    FROM toklist
), toks0 AS (
    SELECT prompt_id, unnest(ss) AS shingle FROM sets0
), dfreq AS (
    SELECT shingle, COUNT(*) AS c FROM toks0 GROUP BY 1
), sets AS (
    SELECT prompt_id, list(shingle) AS ss
    FROM toks0 JOIN dfreq USING (shingle)
    WHERE c <= {_PREF_DEDUP_MAXDF}
    GROUP BY 1
), pairs AS (
    SELECT a.prompt_id AS id_a, b.prompt_id AS id_b,
           len(list_intersect(a.ss, b.ss)) AS o,
           len(a.ss) AS sa, len(b.ss) AS sb
    FROM sets a JOIN sets b ON a.prompt_id < b.prompt_id
)
SELECT id_a, id_b,
       CAST(o AS DOUBLE) / CAST(sa + sb - o AS DOUBLE) AS jaccard
FROM pairs
WHERE CAST(o AS DOUBLE) / CAST(sa + sb - o AS DOUBLE) >= 0.5
"""


@query("preference_pair_dedup", _PREF_DEDUP_ORACLE)
def q_preference_pair_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Near-duplicate prompts across preference pairs
    (ext.preference.preference_prompt_dedup): distinct the prompt
    relation out of the pair rows, then exact 3-gram Jaccard via the
    shared-shingle candidate machinery (ext.dedup.ngram_jaccard_pairs)
    — the leakage check before an RM/DPO train-eval split. Planted
    suffix-variant duplicates guarantee pairs at every sf; the oracle
    is an independent brute-force all-pairs intersect, so the hash
    check also proves the candidate pruning drops nothing. Runs under
    the `max_doc_freq` stopword-shingle guard (see _PREF_DEDUP_MAXDF:
    the plant suffix's shingles are corpus-proportional and made the
    unguarded join quadratic at 100× — 4.7→290 s per decade); the
    oracle mirrors the cap, so the check is the exact Jaccard of the
    filtered sets at every sf."""
    return P.preference_prompt_dedup(
        _prompt_pairs(spark, sf_dir),
        "prompt_id",
        "prompt",
        n=3,
        threshold=0.5,
        max_doc_freq=_PREF_DEDUP_MAXDF,
    )


# =====================================================================
# Distributed BPE encode (r8 verdict #3)
# =====================================================================

_BPE_EOW = "</w>"

_BPE_ROUNDTRIP_ORACLE = f"""
SELECT doc_id,
       array_to_string(list_filter(regexp_split_to_array(
           lower(trim(text)), '{_WS}'), x -> x <> ''), ' ')
           AS reconstructed,
       CAST(len(list_filter(regexp_split_to_array(
           lower(trim(text)), '{_WS}'), x -> x <> '')) AS BIGINT)
           AS n_words
FROM documents
WHERE text IS NOT NULL AND strpos(text, '{_BPE_EOW}') = 0
"""


def _bpe_merges_cached(spark: SparkSession, sf_dir: str):
    """Train once per (session, sf_dir): the encode queries need the
    SAME merge table the trainer queries pin (num_merges=8,
    min_freq=2), and retraining per invocation would dominate the
    encode cost being measured. Returns ``(merges, alphabet)`` — the
    alphabet is derived HERE, alongside training, so the timed encode
    queries never pay corpus_alphabet's distinct-characters scan
    inside the measured region (r9 advice: the headline is "encode
    rides the scan", so the benchmark must time exactly that)."""
    from deftunes_spark.ext.tokenizer import bpe_train, corpus_alphabet

    key = ("_bpe_merges", sf_dir)
    cache = getattr(spark, "_deftunes_bpe_cache", None)
    if cache is None:
        cache = {}
        spark._deftunes_bpe_cache = cache
    if key not in cache:
        docs = _t_cpu(spark, sf_dir, "documents")
        cache[key] = (
            bpe_train(docs, num_merges=8, min_freq=2),
            corpus_alphabet(docs.filter(F.col("text").isNotNull())),
        )
    return cache[key]


@query("bpe_encode")
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-scale BPE APPLY (ext.tokenizer.bpe_encode): broadcast
    the trained merge + id tables in the task closure, encode every
    document in one Arrow-batched mapInPandas stage — zero shuffle,
    linear in tokens; the single hottest operator of a pretraining
    ingest. Iterative merge application is not SQL-expressible, so
    this carries the rows-only check; the token-id sequence is
    emitted as ``ids_csv`` (scalar string — the r9 driver
    canonicalizer rejects array columns, so rows-only outputs must
    be flat; tools/check_correctness.py now enforces that) while
    library callers keep the ``array<int>`` API. Two full-oracle
    twins bracket it: ``bpe_encode_roundtrip`` (unit concatenation
    reconstructs the normalized text) and ``bpe_decode``
    (decode(encode(x)) == normalized x through the id table), plus
    tests/test_r9_ops.py id/segmentation parity on planted words."""
    from deftunes_spark.ext.tokenizer import bpe_encode

    merges, alphabet = _bpe_merges_cached(spark, sf_dir)
    docs = _t_cpu(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    enc = bpe_encode(merges=merges, df=docs, alphabet=alphabet)
    return enc.select(
        "doc_id",
        F.array_join(
            F.col("token_ids").cast("array<string>"), ","
        ).alias("ids_csv"),
        "n_tokens",
        "n_unk",
    )


@query("bpe_encode_roundtrip", _BPE_ROUNDTRIP_ORACLE)
def q_bpe_encode_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Oracle twin of ``bpe_encode``: emit subword UNITS, concatenate
    them and turn end-of-word markers back into spaces — BPE
    segmentation is lossless, so the result must equal the
    whitespace-normalized lowercased text, and the EOW-terminated unit
    count must equal the word count; both value-checked in SQL. Docs
    containing the reserved marker literal are excluded on both sides
    (the standard any-non-corpus-character BPE assumption, checked
    rather than assumed)."""
    from deftunes_spark.ext.tokenizer import EOW, bpe_encode

    merges, alphabet = _bpe_merges_cached(spark, sf_dir)
    docs = _t_cpu(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
        & (F.instr(F.col("text"), EOW) == 0)
    )
    enc = bpe_encode(
        merges=merges, df=docs, alphabet=alphabet, emit="units"
    )
    return enc.select(
        "doc_id",
        F.trim(
            F.regexp_replace(
                F.array_join(F.col("units"), ""), EOW, " "
            )
        ).alias("reconstructed"),
        F.size(
            F.filter(F.col("units"), lambda u: u.endswith(EOW))
        ).cast("bigint").alias("n_words"),
    )


_BPE_DECODE_ORACLE = f"""
SELECT doc_id,
       array_to_string(list_filter(regexp_split_to_array(
           lower(trim(text)), '{_WS}'), x -> x <> ''), ' ')
           AS decoded
FROM documents
WHERE text IS NOT NULL AND strpos(text, '{_BPE_EOW}') = 0
"""


@query("bpe_decode", _BPE_DECODE_ORACLE)
def q_bpe_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer loop closed (r9 verdict #7): ids → text through
    ext.tokenizer.bpe_decode — the inverse id table from the same
    deterministic bpe_vocab_ids derivation, applied as a PURE CODEGEN
    PROJECTION (literal map lookup + concat + EOW→space; zero UDF,
    zero shuffle). The chain decode(encode(text)) must equal the
    whitespace-normalized lowercased text, value-checked in SQL —
    a second full-oracle invariant around the rows-only encode that,
    unlike the units twin, exercises the ID mapping itself (a wrong
    or colliding id would decode to the wrong unit string). OOV
    handling (−1 → replacement char, never dropped) is pinned in
    tests/test_r10_ops.py."""
    from deftunes_spark.ext.tokenizer import EOW, bpe_decode, bpe_encode

    merges, alphabet = _bpe_merges_cached(spark, sf_dir)
    docs = _t_cpu(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
        & (F.instr(F.col("text"), EOW) == 0)
    )
    enc = bpe_encode(merges=merges, df=docs, alphabet=alphabet)
    return bpe_decode(enc, merges, alphabet).select(
        "doc_id", "decoded"
    )


# =====================================================================
# Fill-in-the-middle transform (the last named r8 growth item)
# =====================================================================

_FIM_ORACLE = """
WITH h AS (
    SELECT doc_id, text, length(text) AS n,
           ('0x' || substr(md5('fim|gate|' || CAST(doc_id AS VARCHAR)),
               1, 6))::BIGINT % 1000 AS g,
           ('0x' || substr(md5('fim|fmt|' || CAST(doc_id AS VARCHAR)),
               1, 6))::BIGINT % 1000 AS fm,
           ('0x' || substr(md5('fim|cut1|' || CAST(doc_id AS VARCHAR)),
               1, 6))::BIGINT AS h1,
           ('0x' || substr(md5('fim|cut2|' || CAST(doc_id AS VARCHAR)),
               1, 6))::BIGINT AS h2
    FROM documents
), cuts AS (
    SELECT *,
           least(h1 % (n + 1), h2 % (n + 1)) AS lo,
           greatest(h1 % (n + 1), h2 % (n + 1)) AS hi,
           (text IS NOT NULL AND g < 600) AS applied
    FROM h
)
SELECT doc_id,
       applied AS fim_applied,
       CASE WHEN NOT coalesce(applied, FALSE) THEN 'none'
            WHEN fm < 500 THEN 'spm' ELSE 'psm' END AS fim_format,
       CASE WHEN NOT coalesce(applied, FALSE) THEN text
            WHEN fm < 500 THEN
                '<|fim_prefix|>' || '<|fim_suffix|>'
                || substr(text, CAST(hi + 1 AS INT), CAST(n - hi AS INT))
                || '<|fim_middle|>'
                || substr(text, 1, CAST(lo AS INT))
                || substr(text, CAST(lo + 1 AS INT), CAST(hi - lo AS INT))
            ELSE
                '<|fim_prefix|>' || substr(text, 1, CAST(lo AS INT))
                || '<|fim_suffix|>'
                || substr(text, CAST(hi + 1 AS INT), CAST(n - hi AS INT))
                || '<|fim_middle|>'
                || substr(text, CAST(lo + 1 AS INT), CAST(hi - lo AS INT))
       END AS fim_text
FROM cuts
"""


# ---------------------------------------------------------------------
# Best-of-n selection (rejection sampling) + RM calibration
# ---------------------------------------------------------------------
#
# The remaining two stages of a preference pipeline: pick the
# highest-reward completion per prompt (BoN / rejection-sampling data
# prep) and read the reward model's calibration curve before trusting
# its margins. Fixtures derive from documents with seeded TIES
# (floor((doc_id%8)/2) — consecutive sample ids share rewards, so the
# deterministic lowest-id tie-break is exercised) and seeded NULL
# rewards (unscored samples must lose; unscored pairs must land in
# the −1 calibration bin, counted not dropped).

_BON_ORACLE = """
WITH base AS (
    SELECT CAST(floor(doc_id / 4) AS BIGINT) AS prompt_id,
           doc_id AS sample_id,
           substr(text, 1, 150) AS response,
           CASE WHEN doc_id % 17 = 4 THEN NULL
                ELSE CAST(floor((doc_id % 8) / 2.0) AS DOUBLE) / 4.0
           END AS reward
    FROM documents WHERE text IS NOT NULL
), r AS (
    SELECT *,
           row_number() OVER (
               PARTITION BY prompt_id
               ORDER BY reward DESC NULLS LAST, sample_id
           ) AS rn,
           lead(reward) OVER (
               PARTITION BY prompt_id
               ORDER BY reward DESC NULLS LAST, sample_id
           ) AS nxt,
           CAST(count(*) OVER (PARTITION BY prompt_id) AS BIGINT)
               AS n_samples
    FROM base
)
SELECT prompt_id, sample_id, response, reward, n_samples,
       round(reward - nxt, 6) AS reward_gap
FROM r WHERE rn = 1
"""


def _bon_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.col("doc_id")
    reward = F.when(
        d % 17 == 4, F.lit(None).cast("double")
    ).otherwise(
        F.floor((d % 8) / F.lit(2.0)).cast("double") / F.lit(4.0)
    )
    return (
        _t_cpu(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            F.floor(d / F.lit(4)).cast("bigint").alias("prompt_id"),
            d.alias("sample_id"),
            F.substring(F.col("text"), 1, 150).alias("response"),
            reward.alias("reward"),
        )
    )


@query("best_of_n_selection", _BON_ORACLE)
def q_best_of_n_selection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Rejection sampling / best-of-n data prep
    (ext.preference.best_of_n_selection): per prompt group keep the
    highest-reward completion — ties to the lowest sample id, NULL
    (unscored) rewards never win — plus the winner−runner-up
    reward_gap BoN curricula filter on. One flat window shuffle;
    seeded ties and NULL rewards make every branch value-checked."""
    from deftunes_spark.ext.preference import best_of_n_selection

    return best_of_n_selection(_bon_samples(spark, sf_dir))


_CALIB_ORACLE = """
WITH base AS (
    SELECT CASE WHEN doc_id % 23 = 2 THEN NULL
                ELSE CAST(doc_id % 10 AS DOUBLE) / 10.0 END AS rc,
           CAST(doc_id % 7 AS DOUBLE) / 10.0 AS rr
    FROM documents WHERE text IS NOT NULL
), m AS (
    SELECT rc - rr AS mg, least(abs(rc - rr), 1.0) AS am FROM base
), b AS (
    SELECT CASE WHEN mg IS NULL THEN -1
                ELSE least(CAST(floor(am * 5) AS INT), 4)
           END AS margin_bin, mg, am
    FROM m
)
SELECT margin_bin,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(CASE WHEN mg > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_agree,
       round(CAST(sum(CASE WHEN mg > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS agree_rate,
       round(avg(am), 6) AS avg_abs_margin,
       CASE WHEN margin_bin < 0 THEN NULL
            ELSE round(CAST(margin_bin AS DOUBLE) / 5, 6)
       END AS bin_lo
FROM b GROUP BY margin_bin
"""


@query("reward_margin_calibration", _CALIB_ORACLE)
def q_reward_margin_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reward-model calibration curve
    (ext.preference.reward_margin_calibration): pairs bucketed by
    |margin| (5 equal-width bins, clipped at 1), agreement rate
    (margin > 0) per bin — the read on whether RM margins are signal
    before BoN/DPO weighting trusts them. NULL-reward pairs land in
    bin −1, counted not dropped (seeded via doc_id % 23). One
    map-side-combined groupBy on a derived key; n_bins groups at any
    corpus size."""
    from deftunes_spark.ext.preference import reward_margin_calibration

    d = F.col("doc_id")
    pairs = (
        _t_cpu(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            F.when(d % 23 == 2, F.lit(None).cast("double"))
            .otherwise((d % 10).cast("double") / 10.0)
            .alias("reward_chosen"),
            ((d % 7).cast("double") / 10.0).alias("reward_rejected"),
        )
    )
    return reward_margin_calibration(pairs, n_bins=5)


# =====================================================================
# Hamming probe-mode near-dup (r8 verdict #4)
# =====================================================================


def _simhash_probes_oracle() -> str:
    from deftunes_spark.driver_queries_ext import _simhash_oracle

    return _simhash_oracle(8)


@query("dedup_simhash_probes", _simhash_probes_oracle())
def q_dedup_simhash_probes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SimHash near-dup pairs via the HmSearch-style PROBE candidate
    scheme (ext.dedup.simhash_near_pairs(mode='probes'): fewer, wider
    chunks + bit-flip probe enumeration — the engineered answer to the
    fixed-width band birthday term at 10⁹ docs). The candidate scheme
    never changes the ANSWER (pigeonhole recall is exact either way),
    so this shares `dedup_simhash`'s full value-hash oracle verbatim —
    a driver-artifact-level proof that the probe plan is lossless, on
    top of the per-m exactness pytest."""
    from deftunes_spark.ext import dedup as D

    docs = _t_cpu(spark, sf_dir, "documents")
    sims = D.simhash64(
        docs, "doc_id", "text", hash_fn="md5", dict_hashes=True
    )
    pairs = D.simhash_near_pairs(
        sims, "doc_id", max_hamming=8, mode="probes"
    )
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


@query("fim_transform", _FIM_ORACLE)
def q_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle augmentation (ext.training.fim_transform,
    Bavarian et al. 2022): a deterministic md5-derived 60% of docs are
    rewritten as PSM/SPM infilling examples (50/50), character-level
    cuts uniform over [0, len] — pure codegen projection, zero
    shuffle, every byte (gate, format, cuts, sentinel layout)
    value-hash-mirrored in DuckDB."""
    from deftunes_spark.ext.training import fim_transform

    docs = _t_cpu(spark, sf_dir, "documents")
    return fim_transform(docs)
