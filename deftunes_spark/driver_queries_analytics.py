"""Analytics extension queries: pivot/unpivot reshaping, frame-bounded
window aggregation, and event-funnel analysis — the BI-layer shapes a
serving warehouse answers daily, all free in declarative Spark and all
value-hash-checked against DuckDB."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from deftunes_spark.driver_queries import _t, _t_cpu, query

# =====================================================================
# Pivot / unpivot
# =====================================================================

_PIVOT_ORACLE = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'O'
                THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE)
           AS status_O,
       CAST(SUM(CASE WHEN o_orderstatus = 'F'
                THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE)
           AS status_F,
       CAST(SUM(CASE WHEN o_orderstatus = 'P'
                THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE)
           AS status_P
FROM orders GROUP BY 1
"""


@query("pivot_sales", _PIVOT_ORACLE)
def q_pivot_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): order totals per priority × status. Spark's
    pivot with an EXPLICIT value list compiles to the same one-pass
    conditional aggregation as the oracle — never pass an implicit
    list at scale (it triggers a distinct-values pre-query)."""
    o = _t(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast(
                "double"
            )
        )
    )
    return piv.select(
        "o_orderpriority",
        F.col("O").alias("status_O"),
        F.col("F").alias("status_F"),
        F.col("P").alias("status_P"),
    )


_UNPIVOT_ORACLE = """
SELECT o_orderkey, 'o_totalprice' AS metric,
       CAST(o_totalprice AS DOUBLE) AS value
FROM orders
UNION ALL
SELECT o_orderkey, 'o_custkey' AS metric,
       CAST(o_custkey AS DOUBLE) AS value
FROM orders
"""


@query("unpivot_metrics", _UNPIVOT_ORACLE)
def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long / melt): per-order metric rows via Spark's
    native unpivot (Expand node — one scan, rows×metrics output, no
    join)."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        F.col("o_custkey").cast("double").alias("o_custkey"),
    )
    return o.unpivot(
        ["o_orderkey"],
        ["o_totalprice", "o_custkey"],
        "metric",
        "value",
    )


# =====================================================================
# Frame-bounded window aggregation
# =====================================================================

_MOVAVG_ORACLE = """
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,6)))
                OVER (PARTITION BY user_id ORDER BY ts
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
            AS DOUBLE)
       / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
           AS moving_avg
FROM events
"""


@query("moving_average", _MOVAVG_ORACLE)
def q_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 4-row moving average per user (decimal-exact sum over
    the frame ÷ frame count, so the metric is partition-order-proof).
    One shuffle on user_id; the frame scan is a running in-partition
    pass."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(-3, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        (
            F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg"),
    )


# =====================================================================
# Funnel analysis
# =====================================================================

_FUNNEL_ORACLE = """
WITH v AS (
    SELECT user_id, MIN(ts) AS t FROM events
    WHERE event_type = 'view' GROUP BY 1
), c AS (
    SELECT e.user_id, MIN(e.ts) AS t
    FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t
    WHERE e.event_type = 'click' GROUP BY 1
), p AS (
    SELECT e.user_id, MIN(e.ts) AS t
    FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t
    WHERE e.event_type = 'purchase' GROUP BY 1
)
SELECT 'view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
UNION ALL
SELECT 'click' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM c
UNION ALL
SELECT 'purchase' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM p
"""


def _first_after(
    events: DataFrame, etype: str, prior: DataFrame | None
) -> DataFrame:
    """min(ts) of ``etype`` per user, restricted to after the user's
    ``prior`` stage timestamp (ordered-funnel semantics)."""
    ev = events.filter(F.col("event_type") == etype)
    if prior is not None:
        ev = ev.join(prior, "user_id").where(F.col("ts") > F.col("t")).drop(
            "t"
        )
    return ev.groupBy("user_id").agg(F.min("ts").alias("t"))


@query("funnel_counts", _FUNNEL_ORACLE)
def q_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel: each stage is the user's
    first qualifying event AFTER their previous stage. Three keyed
    aggregations chained by broadcast-or-hash joins on user_id."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    v = _first_after(ev, "view", None)
    c = _first_after(ev, "click", v)
    p = _first_after(ev, "purchase", c)

    def stage(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.lit(label).alias("stage"),
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
        )

    return (
        stage(v, "view").unionByName(stage(c, "click")).unionByName(
            stage(p, "purchase")
        )
    )


# =====================================================================
# Corpus statistics / training-prep
# =====================================================================

_TOK_LOWER = (
    "list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')"
)

_VOCAB_ORACLE = f"""
WITH toks AS (
    SELECT unnest({_TOK_LOWER}) AS term FROM documents
)
SELECT term, CAST(COUNT(*) AS BIGINT) AS n
FROM toks GROUP BY 1
ORDER BY n DESC, term LIMIT 20
"""


@query("vocab_topk", _VOCAB_ORACLE)
def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 vocabulary: explode → count → TakeOrdered. The
    term shuffle is power-law skewed; partial aggregation collapses
    the head terms map-side before the exchange."""
    from deftunes_spark.ext.text import term_counts

    docs = _t_cpu(spark, sf_dir, "documents")
    vocab = term_counts(docs).groupBy("term").agg(
        F.sum("tf").cast("bigint").alias("n")
    )
    return vocab.orderBy(F.col("n").desc(), "term").limit(20)


_TFIDF_ORACLE = f"""
WITH tc AS (
    SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
    FROM (SELECT doc_id, unnest({_TOK_LOWER}) AS term FROM documents)
    GROUP BY 1, 2
), dfreq AS (
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tc GROUP BY 1
), n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents)
SELECT tc.doc_id, tc.term, tc.tf, dfreq.df,
       tc.tf * ln(CAST((SELECT n_docs FROM n) AS DOUBLE) / dfreq.df)
           AS tfidf
FROM tc JOIN dfreq ON tc.term = dfreq.term
WHERE tc.doc_id < 50
"""


@query("tfidf_terms", _TFIDF_ORACLE)
def q_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF per (doc, term) — two aggregations + dictionary join —
    scoped to doc_id < 50 to keep the checked result compact."""
    from deftunes_spark.ext.text import tf_idf

    docs = _t_cpu(spark, sf_dir, "documents")
    out = tf_idf(docs)
    return out.filter(F.col("doc_id") < 50).select(
        "doc_id", "term", "tf", "df", "tfidf"
    )


_PACKING_ORACLE = """
WITH tok AS (
    SELECT doc_id, doc_id % 8 AS shard,
           CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                t -> t <> '')) AS BIGINT) AS token_count
    FROM documents
), packed AS (
    SELECT doc_id, shard, token_count,
           SUM(token_count) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) - token_count AS tokens_before
    FROM tok
)
SELECT shard, CAST(FLOOR(tokens_before / 2048) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(token_count) AS BIGINT) AS tokens
FROM packed GROUP BY 1, 2
"""


@query("sequence_packing", _PACKING_ORACLE)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence packing into 2048-token bins, sharded 8
    ways so the running-sum window parallelizes; per-(shard, bin)
    occupancy stats."""
    from deftunes_spark.ext.text import pack_sequences

    docs = _t_cpu(spark, sf_dir, "documents")
    packed = pack_sequences(docs, context_tokens=2048, n_shards=8)
    return packed.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("token_count").cast("bigint").alias("tokens"),
    )


_SUBWORD_ORACLE = """
SELECT doc_id,
       CAST(len(list_filter(regexp_split_to_array(text, '[^A-Za-z0-9]+'),
                            t -> t <> ''))
            + length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
            AS BIGINT) AS subword_count
FROM documents
"""


@query("subword_count", _SUBWORD_ORACLE)
def q_subword_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish subword counting (alnum runs + standalone punctuation —
    the unit count a byte-pair tokenizer starts from); pure codegen
    regex, one scan."""
    from deftunes_spark.ext.text import with_subword_count

    docs = with_subword_count(_t_cpu(spark, sf_dir, "documents"))
    return docs.select("doc_id", "subword_count")
