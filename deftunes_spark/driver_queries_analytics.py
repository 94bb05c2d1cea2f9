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
    "list_filter(regexp_split_to_array(lower(text), '[ \\t\\n\\x0B\\f\\r]+'), t -> t <> '')"
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


_LM_K = 0.5

_LM_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, {_TOK_LOWER} AS t FROM documents
), big AS (
    SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
    FROM toks, UNNEST(range(1, len(t))) AS g(i)
    WHERE len(t) >= 2
), c2 AS (
    SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM big GROUP BY 1, 2
), c1 AS (
    SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1
), v AS (
    SELECT COUNT(DISTINCT term) AS vocab
    FROM (SELECT unnest(t) AS term FROM toks)
)
SELECT big.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(AVG(ln((c2.c2 + {_LM_K}) /
                    (c1.c1 + {_LM_K} * (SELECT vocab FROM v)))), 6)
           AS avg_logp,
       ROUND(exp(-AVG(ln((c2.c2 + {_LM_K}) /
                         (c1.c1 + {_LM_K} * (SELECT vocab FROM v))))), 6)
           AS perplexity
FROM big
JOIN c2 ON big.w1 = c2.w1 AND big.w2 = c2.w2
JOIN c1 ON big.w1 = c1.w1
GROUP BY 1
"""


@query("lm_perplexity", _LM_ORACLE)
def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring: average bigram log-probability and
    perplexity per document under an add-k LM trained on the corpus
    itself (`ext.text.bigram_lm_scores`) — the "how typical is this
    document" filter signal. One tokenize scan; the context counts
    derive from the bigram table, not a second text pass."""
    from deftunes_spark.ext.text import bigram_lm_scores

    docs = _t_cpu(spark, sf_dir, "documents")
    return bigram_lm_scores(docs, k_smooth=_LM_K)


_PACKING_ORACLE = """
WITH tok AS (
    SELECT doc_id, doc_id % 8 AS shard,
           CAST(len(list_filter(regexp_split_to_array(text, '[ \\t\\n\\x0B\\f\\r]+'),
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
            + length(regexp_replace(text, '[A-Za-z0-9 \\t\\n\\x0B\\f\\r]', '', 'g'))
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


# =====================================================================
# Cohort retention
# =====================================================================

_RETENTION_ORACLE = """
WITH act AS (
    SELECT DISTINCT user_id,
           date_trunc('week', CAST(ts AS TIMESTAMP)) AS week
    FROM events
), cohort AS (
    SELECT user_id, MIN(week) AS cohort_week FROM act GROUP BY 1
)
SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week,
       CAST(date_diff('day', cohort_week, week) // 7 AS BIGINT)
           AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM act JOIN cohort USING (user_id)
GROUP BY 1, 2
"""


@query("user_retention_cohort", _RETENTION_ORACLE)
def q_user_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention triangle: users bucketed by first-active
    week, counted in each later week they return.

    The oracle derives cohorts with a self-join; the Spark plan skips
    it — ONE groupBy(user_id) emits (min week, distinct-week set) per
    user (collect_set dedupes in the aggregate, so no separate
    DISTINCT shuffle), explode, then the final (cohort, offset) count.
    Two shuffles total, both keyed; the per-user week set is bounded
    by the calendar, so collect_set state stays small at any scale."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    )
    per_user = ev.groupBy("user_id").agg(
        F.min("week").alias("cohort_week"),
        F.collect_set("week").alias("weeks"),
    )
    act = per_user.select(
        "cohort_week", F.explode("weeks").alias("week")
    )
    return act.groupBy(
        "cohort_week",
        (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
        .cast("bigint")
        .alias("week_offset"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))


# =====================================================================
# Length histogram (binning + cumulative distribution)
# =====================================================================

_HIST_ORACLE = """
WITH b AS (
    SELECT CAST((n_chars // 50) * 50 AS BIGINT) AS bucket_lo
    FROM documents
)
SELECT bucket_lo, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(COUNT(*)) OVER (ORDER BY bucket_lo
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_docs
FROM b GROUP BY 1
"""


@query("doc_length_histogram", _HIST_ORACLE)
def q_doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram (fixed 50-char bins) with a running
    cumulative count — the length-distribution snapshot a curation
    pipeline uses to pick truncation budgets. The heavy pass is the
    map-side-combined bin count; the unpartitioned cumulative window
    runs over the bin table only (hundreds of rows at any corpus
    scale), so the single-partition window is safe by construction."""
    from pyspark.sql.window import Window as W

    docs = _t(spark, sf_dir, "documents")
    hist = docs.groupBy(
        (F.floor(F.col("n_chars") / 50) * 50)
        .cast("bigint")
        .alias("bucket_lo")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    cum = W.orderBy("bucket_lo").rowsBetween(W.unboundedPreceding, 0)
    return hist.withColumn(
        "cum_docs", F.sum("n_docs").over(cum).cast("bigint")
    )


# =====================================================================
# Corpus boilerplate: hot n-grams by document frequency
# =====================================================================

_HOT_NGRAMS_ORACLE = """
WITH toklist AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+') AS toks
    FROM documents
), sh AS (
    SELECT DISTINCT doc_id,
           array_to_string(toks[i:i+2], ' ') AS shingle
    FROM toklist,
         UNNEST(range(1, greatest(len(toks) - 2, 1) + 1)) AS t(i)
)
SELECT shingle, CAST(COUNT(*) AS BIGINT) AS doc_freq
FROM sh GROUP BY 1
ORDER BY doc_freq DESC, shingle LIMIT 20
"""


@query("hot_ngrams", _HOT_NGRAMS_ORACLE)
def q_hot_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-boilerplate detector: top-20 word trigrams by document
    frequency — the phrases worth stripping (or df-capping, see
    dedup_jaccard_dfcap) before near-dup mining. Reuses the dedup
    module's codegen shingler; power-law head terms collapse map-side
    before the single shingle-keyed shuffle, and the top-k is a
    TakeOrderedAndProject (no global sort)."""
    from deftunes_spark.ext.dedup import shingles

    docs = _t_cpu(spark, sf_dir, "documents")
    sh = shingles(docs, "doc_id", "text", n=3)
    freq = sh.groupBy("shingle").agg(
        F.count(F.lit(1)).cast("bigint").alias("doc_freq")
    )
    return freq.orderBy(F.col("doc_freq").desc(), "shingle").limit(20)


# =====================================================================
# GROUPING SETS / NTILE analytics
# =====================================================================

_GSETS_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
           AS revenue
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                        (l_returnflag), ())
"""


@query("grouping_sets_agg", _GSETS_ORACLE)
def q_grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (the general form under rollup/cube):
    (flag, status), (flag), and grand total in ONE pass — Spark
    expands the sets map-side (Expand operator) so the scan count
    stays 1 regardless of how many sets are requested."""
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT)
                   AS gid,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                    AS DOUBLE) AS revenue
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        """
    )


_NTILE_ORACLE = """
WITH q AS (
    SELECT c_nationkey,
           NTILE(4) OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal, c_custkey) AS quartile,
           c_acctbal
    FROM customer
)
SELECT c_nationkey, CAST(quartile AS BIGINT) AS quartile,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(c_acctbal) AS DOUBLE) AS lo,
       CAST(MAX(c_acctbal) AS DOUBLE) AS hi
FROM q GROUP BY 1, 2
"""


@query("ntile_quartiles", _NTILE_ORACLE)
def q_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation account-balance quartiles via NTILE(4). The window
    partitions by nation — never a global single-partition window (the
    scale killer WindowExec warns about); ties broken by custkey so
    the tile assignment is deterministic in both engines."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        "c_acctbal", "c_custkey"
    )
    tiled = c.select(
        "c_nationkey",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        "c_acctbal",
    )
    return tiled.groupBy("c_nationkey", "quartile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("c_acctbal").cast("double").alias("lo"),
        F.max("c_acctbal").cast("double").alias("hi"),
    )


# =====================================================================
# PageRank — iterative graph analytics (fixed iterations)
# =====================================================================

_PR_ITERS, _PR_DAMP = 3, 0.85


def _pagerank_oracle() -> str:
    """Unrolled-iteration PageRank: each CTE level r{t} is exactly the
    engine's superstep (contribute rank·w along edges, gather, damp)."""
    step = """
    r{next} AS (
        SELECT nodes.node,
               (1.0 - {d})/(SELECT n FROM nn)
               + {d} * COALESCE(m.mass, 0.0) AS rank
        FROM nodes LEFT JOIN (
            SELECT w.d AS node, SUM(r{cur}.rank * w.w) AS mass
            FROM w JOIN r{cur} ON w.s = r{cur}.node
            GROUP BY w.d
        ) m ON nodes.node = m.node
    )"""
    steps = ",".join(
        step.format(cur=t, next=t + 1, d=_PR_DAMP)
        for t in range(_PR_ITERS)
    )
    return f"""
    WITH e0 AS (
        SELECT DISTINCT o_custkey * 2 AS s, l_suppkey * 2 + 1 AS d
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), edges AS (
        SELECT s, d FROM e0 UNION SELECT d, s FROM e0
    ), nodes AS (
        SELECT DISTINCT s AS node FROM edges
    ), nn AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes
    ), w AS (
        SELECT s, d, 1.0 / COUNT(*) OVER (PARTITION BY s) AS w
        FROM edges
    ), r0 AS (
        SELECT node, 1.0/(SELECT n FROM nn) AS rank FROM nodes
    ), {steps}
    SELECT CAST(node AS BIGINT) AS node,
           round(rank, 10) AS pagerank
    FROM r{_PR_ITERS}
    """


@query("pagerank_sales", _pagerank_oracle())
def q_pagerank_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the undirected customer↔supplier trade graph
    (edge = the pair co-occur on an order line), 3 fixed supersteps.
    One join + one aggregation per superstep with lineage cut between
    rounds; the fixed iteration count keeps the result deterministic
    enough for a value-hash oracle (ranks rounded to 1e-10 — float
    summation-order noise is ~1e-17)."""
    from deftunes_spark.ext.graph import pagerank

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    ranks = pagerank(
        edges, iterations=_PR_ITERS, damping=_PR_DAMP, undirected=True
    )
    return ranks.select(
        F.col("node").cast("bigint").alias("node"),
        F.round("rank", 10).alias("pagerank"),
    )


# =====================================================================
# Triangle counting — supplier co-purchase graph
# =====================================================================

_TRIANGLE_ORACLE = """
WITH su AS (
    SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
), e AS (
    SELECT DISTINCT x.l_suppkey AS u, y.l_suppkey AS v
    FROM su x JOIN su y
      ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
), t AS (
    SELECT ab.u AS a, ab.v AS b, bc.v AS c
    FROM e ab
    JOIN e bc ON ab.v = bc.u
    JOIN e ac ON ac.u = ab.u AND ac.v = bc.v
), n AS (
    SELECT a AS node FROM t
    UNION ALL SELECT b FROM t
    UNION ALL SELECT c FROM t
)
SELECT CAST(node AS BIGINT) AS node,
       CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM n GROUP BY 1
"""


@query("graph_triangles", _TRIANGLE_ORACLE)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the supplier co-purchase graph
    (suppliers joined when they share an order) — the third graph
    operator beside PageRank and connected components, and the local
    clustering signal near-dup cliques show up as. Uses id
    orientation for the SQL mirror; the degree-ordered orientation
    (the power-law-safe plan, ext.graph.connected_triangles) is
    parity-asserted in tests/test_graph.py."""
    from deftunes_spark.ext.graph import connected_triangles

    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    x, y = li.alias("x"), li.alias("y")
    edges = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_suppkey") < F.col("y.l_suppkey")),
        )
        .select(
            F.col("x.l_suppkey").alias("src"),
            F.col("y.l_suppkey").alias("dst"),
        )
        .distinct()
    )
    out = connected_triangles(edges, orient="id")
    return out.select(
        F.col("node").cast("bigint").alias("node"), "n_triangles"
    )


# =====================================================================
# Robust statistics (median / MAD / robust-z outliers)
# =====================================================================

_ROBUST_ORACLE = """
WITH m AS (
    SELECT c_mktsegment, quantile_cont(c_acctbal, 0.5) AS med
    FROM customer GROUP BY 1
), d AS (
    SELECT c.c_mktsegment, c.c_acctbal, m.med,
           abs(c.c_acctbal - m.med) AS absdev
    FROM customer c JOIN m USING (c_mktsegment)
), md AS (
    SELECT c_mktsegment, any_value(med) AS med,
           quantile_cont(absdev, 0.5) AS mad
    FROM d GROUP BY 1
)
SELECT d.c_mktsegment,
       round(any_value(md.med), 4) AS median,
       round(any_value(md.mad), 4) AS mad,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(CASE WHEN d.absdev > 3.0 * 1.4826 * md.mad
                       THEN 1 END) AS BIGINT) AS n_outliers
FROM d JOIN md USING (c_mktsegment) GROUP BY 1
"""


@query("robust_stats", _ROBUST_ORACLE)
def q_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment robust center/spread (exact median, MAD) and
    robust-z outlier counts (ext.profile.robust_group_stats) — the
    outlier-resistant profile a curation pipeline trusts over
    mean/stddev. Two percentile aggs + two broadcast joins of
    #groups-sized scalar tables; the wide table never shuffles."""
    from deftunes_spark.ext.profile import robust_group_stats

    return robust_group_stats(
        _t(spark, sf_dir, "customer"), "c_mktsegment", "c_acctbal"
    )


# =====================================================================
# Entity resolution: blocked fuzzy name matching
# =====================================================================

_FUZZY_ORACLE = """
WITH k AS (
    SELECT s_suppkey, s_name, substr(s_name, 1, 16) AS blk,
           length(s_name) AS len
    FROM supplier
)
SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
       a.s_name AS name_a, b.s_name AS name_b,
       CAST(levenshtein(a.s_name, b.s_name) AS INT) AS distance
FROM k a JOIN k b
  ON a.blk = b.blk AND a.s_suppkey < b.s_suppkey
 AND abs(a.len - b.len) <= 1
WHERE levenshtein(a.s_name, b.s_name) <= 1
"""


@query("fuzzy_name_pairs", _FUZZY_ORACLE)
def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage: near-identical supplier names via BLOCKED
    levenshtein (ext.dedup.blocked_fuzzy_pairs). The 16-char-prefix
    block bounds the quadratic comparison to bucket-local pairs (the
    edit-distance analog of the MinHash band join) and a length BAND
    in the join keeps insert/delete edits matchable; multi-pass
    complementary blocking is the documented recall path."""
    from deftunes_spark.ext.dedup import blocked_fuzzy_pairs

    sup = _t(spark, sf_dir, "supplier")
    out = blocked_fuzzy_pairs(sup, "s_suppkey", "s_name")
    return out.select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        "name_a",
        "name_b",
        F.col("distance").cast("int").alias("distance"),
    )


# =====================================================================
# Distribution drift (PSI) between ingest snapshots (ext.profile)
# =====================================================================

_PSI_BINS = 12
_PSI_WIDTH = 100.0

_PSI_ORACLE = f"""
WITH spine AS (
    SELECT CAST(unnest(range(0, {_PSI_BINS})) AS INT) AS bin
), a AS (
    SELECT CAST(least(greatest(CAST(floor(n_chars / {_PSI_WIDTH})
                                    AS BIGINT), 0),
                      {_PSI_BINS - 1}) AS INT) AS bin,
           CAST(count(*) AS BIGINT) AS n_a
    FROM documents
    WHERE n_chars IS NOT NULL AND doc_id % 3 != 0
    GROUP BY 1
), b AS (
    SELECT CAST(least(greatest(CAST(floor(n_chars / {_PSI_WIDTH})
                                    AS BIGINT), 0),
                      {_PSI_BINS - 1}) AS INT) AS bin,
           CAST(count(*) AS BIGINT) AS n_b
    FROM documents
    WHERE n_chars IS NOT NULL AND doc_id % 3 = 0
    GROUP BY 1
), j AS (
    SELECT spine.bin,
           COALESCE(n_a, 0) AS n_a,
           COALESCE(n_b, 0) AS n_b
    FROM spine LEFT JOIN a USING (bin) LEFT JOIN b USING (bin)
), t AS (
    SELECT CAST(sum(n_a) AS DOUBLE) AS ta,
           CAST(sum(n_b) AS DOUBLE) AS tb
    FROM j
)
SELECT bin, n_a, n_b,
       round((n_a + 0.5) / (ta + {_PSI_BINS * 0.5!r}), 6) AS p_a,
       round((n_b + 0.5) / (tb + {_PSI_BINS * 0.5!r}), 6) AS p_b,
       round(((n_a + 0.5) / (ta + {_PSI_BINS * 0.5!r})
              - (n_b + 0.5) / (tb + {_PSI_BINS * 0.5!r}))
             * ln(((n_a + 0.5) / (ta + {_PSI_BINS * 0.5!r}))
                  / ((n_b + 0.5) / (tb + {_PSI_BINS * 0.5!r}))), 6)
           AS psi_term
FROM j CROSS JOIN t
"""


@query("snapshot_drift_psi", _PSI_ORACLE)
def q_snapshot_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-Stability-Index drift between two ingest snapshots
    of the corpus (doc_id % 3 split — the same old/new partition the
    incremental-dedup family uses): per-bin counts, Laplace-smoothed
    shares, and PSI terms over a FIXED equi-width grid, so recurring
    batches measure against the same ruler. Two n_bins-row aggregates
    + a bin-spine join + a 1-row totals grid join."""
    from deftunes_spark.ext.profile import psi_drift

    docs = _t(spark, sf_dir, "documents")
    return psi_drift(
        docs.filter(F.col("doc_id") % 3 != 0),
        docs.filter(F.col("doc_id") % 3 == 0),
        "n_chars",
        bin_width=_PSI_WIDTH,
        n_bins=_PSI_BINS,
    )


# =====================================================================
# Event-sequence pattern matching (MATCH_RECOGNIZE shape)
# =====================================================================

_SEQ_ORACLE = """
WITH j AS (
    SELECT user_id,
           string_agg('<' || event_type || '>', ''
                      ORDER BY ts, event_id) AS journey,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    WHERE event_type IS NOT NULL
    GROUP BY 1
)
SELECT user_id, n_events,
       CAST(len(regexp_extract_all(journey,
            '<view>(<click>)*<purchase>')) AS BIGINT) AS n_conversions,
       CAST(len(regexp_extract_all(journey,
            '(<error>){2,}')) AS BIGINT) AS n_error_bursts
FROM j
"""


@query("event_pattern_match", _SEQ_ORACLE)
def q_event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL MATCH_RECOGNIZE re-expressed Spark-first: per user, the
    time-ordered event-type sequence collapses to a journey string
    and patterns become LITERAL regexes counted over it —
    conversions = view (clicks)* purchase contiguous, error bursts =
    two-plus consecutive errors. Each event encodes as its own
    delimiter-wrapped name (``<view><click>…``) — the event type IS
    its code, so the encoding is trivially deterministic, alias-proof
    (r5's ``purchase``/``pause`` first-letter hazard cannot exist),
    unbounded in alphabet size, and needs NO alphabet aggregate, NO
    broadcast, and no >26-types assert (r6 verdict #4: the previous
    deterministic char alphabet cost a distinct + single-partition
    window + two broadcast joins; a 1-row-agg variant still paid a
    second events scan plus a BNLJ stage). The patterns are literals
    on both engines; token delimiters make cross-token regex matches
    impossible (types are identifier-like — a type containing ``<``
    or ``>`` would need sanitizing upstream). One groupBy with an
    array_sort(collect_list(struct)) — the standard Spark idiom for
    ordered per-key sequence analysis; both engines count
    non-overlapping leftmost greedy matches, so the result is
    engine-portable. Journey length is bounded by per-user activity,
    the only cardinality that matters at 100 TB (a per-user cap
    upstream is the guard for pathological keys)."""
    ev = (
        _t(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .filter(F.col("event_type").isNotNull())
        # Delimiter-safety guard (r7 advice): a type containing < or >
        # would fabricate token boundaries and silently miscount —
        # fail loudly instead. Plain codegen rlike per row; the
        # when-branch is the consumed column so it cannot be pruned.
        .withColumn(
            "event_type",
            F.when(
                F.col("event_type").rlike("^[^<>]*$"),
                F.col("event_type"),
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "event_pattern_match: event_type contains "
                            "'<' or '>' (would fabricate journey "
                            "token boundaries): "
                        ),
                        F.col("event_type"),
                    )
                )
            ),
        )
    )
    journeys = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("ts"),
                            F.col("event_id"),
                            F.col("event_type"),
                        )
                    )
                ),
                # Wrap AFTER the agg: the shuffle carries the bare
                # type, the <> delimiters are added per sorted element.
                lambda s: F.concat(
                    F.lit("<"), s["event_type"], F.lit(">")
                ),
            ),
            "",
        ).alias("journey"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    return journeys.select(
        "user_id",
        "n_events",
        F.regexp_count("journey", F.lit("<view>(<click>)*<purchase>"))
        .cast("bigint")
        .alias("n_conversions"),
        F.regexp_count("journey", F.lit("(<error>){2,}"))
        .cast("bigint")
        .alias("n_error_bursts"),
    )


# =====================================================================
# Count-min heavy hitters (ext.profile.heavy_hitters_cms)
# =====================================================================

_CMS_D = 3
_CMS_W = 1024
_CMS_SAMPLE = "33333333"  # md5-hex threshold ~ 20% of documents

_CMS_ORACLE = f"""
WITH toklist AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+') AS toks
    FROM documents
), sh AS (
    SELECT DISTINCT doc_id,
           array_to_string(toks[i:i+2], ' ') AS shingle
    FROM toklist,
         UNNEST(range(1, greatest(len(toks) - 2, 1) + 1)) AS t(i)
), samp AS (
    SELECT shingle, COUNT(*) AS c FROM sh
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{_CMS_SAMPLE}'
    GROUP BY 1 ORDER BY c DESC, shingle LIMIT 40
), seeds AS (SELECT UNNEST(range(0, {_CMS_D})) AS seed),
cells AS (
    SELECT s.seed,
           ('0x' || substr(md5('cms' || CAST(s.seed AS VARCHAR) || '|'
                                || sh.shingle), 1, 15))::BIGINT
               % {_CMS_W} AS cell,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM sh CROSS JOIN seeds s
    GROUP BY 1, 2
), est AS (
    SELECT c.shingle,
           CAST(MIN(COALESCE(ce.cnt, 0)) AS BIGINT) AS est_count
    FROM samp c
    CROSS JOIN seeds s
    LEFT JOIN cells ce
      ON ce.seed = s.seed
     AND ce.cell = ('0x' || substr(md5('cms' || CAST(s.seed AS VARCHAR)
                                       || '|' || c.shingle), 1, 15))
                   ::BIGINT % {_CMS_W}
    GROUP BY 1
)
SELECT shingle, est_count FROM est
ORDER BY est_count DESC, shingle LIMIT 20
"""


@query("hot_ngrams_cms", _CMS_ORACLE)
def q_hot_ngrams_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`hot_ngrams` without the corpus-sized distinct-shingle shuffle:
    candidates from a 20% md5 doc-sample (heavy hitters survive any
    constant-rate sample), document frequencies re-estimated over the
    FULL corpus by a 3×1024 count-min sketch whose only full-corpus
    shuffle carries (seed, cell) keys — bounded state at any scale,
    estimates never undercount. All md5 arithmetic, so the oracle
    value-checks the sketch's collision overcounts too. Shingling is
    the MAPSIDE variant (per-row array_distinct, r8): the exploded
    shingles()'s (doc, shingle) distinct was the one corpus-sized
    exchange left in this plan — the dominant cost at the 100× decade
    (measured; same values, ids are unique per row)."""
    from deftunes_spark.ext.dedup import shingles_mapside
    from deftunes_spark.ext.profile import heavy_hitters_cms

    docs = _t_cpu(spark, sf_dir, "documents")
    sh = shingles_mapside(docs, "doc_id", "text", n=3)
    return heavy_hitters_cms(
        sh,
        "doc_id",
        "shingle",
        k=20,
        sample_hex_threshold=_CMS_SAMPLE,
        candidate_factor=2,
        depth=_CMS_D,
        width=_CMS_W,
    )


# =====================================================================
# Zipf rank-frequency fit (ext.profile.zipf_fit)
# =====================================================================

_ZIPF_K = 10_000

_ZIPF_ORACLE = f"""
WITH toks AS (
    SELECT unnest(list_filter(
        regexp_split_to_array(trim(coalesce(text, '')), '[ \\t\\n\\x0B\\f\\r]+'),
        x -> x <> '')) AS tok
    FROM documents
), vocab AS (
    SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY 1
), corpus AS (
    SELECT COUNT(*) AS vocab, SUM(cnt) AS total FROM vocab
), head AS (
    SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rnk
    FROM vocab ORDER BY cnt DESC, tok LIMIT {_ZIPF_K}
), pts AS (
    SELECT CAST(round(ln(CAST(rnk AS DOUBLE)), 6)
                AS DECIMAL(18,6)) AS x,
           CAST(round(ln(CAST(cnt AS DOUBLE)), 6)
                AS DECIMAL(18,6)) AS y
    FROM head
), m AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(SUM(x) AS DOUBLE) AS sx,
           CAST(SUM(y) AS DOUBLE) AS sy,
           CAST(SUM(x * y) AS DOUBLE) AS sxy,
           CAST(SUM(x * x) AS DOUBLE) AS sxx
    FROM pts
)
SELECT CAST(c.vocab AS BIGINT) AS vocab_size,
       CAST(c.total AS BIGINT) AS total_tokens,
       CAST(m.n AS BIGINT) AS fitted_ranks,
       round((m.n * m.sxy - m.sx * m.sy)
             / (m.n * m.sxx - m.sx * m.sx), 6) AS zipf_slope,
       round((m.sy - ((m.n * m.sxy - m.sx * m.sy)
                      / (m.n * m.sxx - m.sx * m.sx)) * m.sx)
             / m.n, 6) AS zipf_intercept
FROM m, corpus c
"""


@query("zipf_rank_frequency", _ZIPF_ORACLE)
def q_zipf_rank_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit (ext.profile.zipf_fit): log-log slope +
    intercept of the top-10k token frequencies, full vocab size and
    token total — the corpus-health panel that flags boilerplate
    floods and templated text before training. Head selection is a
    distributed TakeOrdered; the rank window runs over ≤ max_rank
    rows (a constant); regression moments are exact decimal sums."""
    from deftunes_spark.ext.profile import zipf_fit

    return zipf_fit(
        _t_cpu(spark, sf_dir, "documents"), "text", max_rank=_ZIPF_K
    )


# =====================================================================
# Embedding drift (PSI over cosine-to-anchor distribution)
# =====================================================================

from deftunes_spark.driver_queries_ext import (  # noqa: E402
    _ANN_QUERY,
    _ANN_QUERY_NORM,
    _sql_vec,
)

_EPSI_BINS = 12
_EPSI_WIDTH = 2.0 / _EPSI_BINS

_EPSI_ORACLE = f"""
WITH scored AS (
    SELECT vec_id,
           CASE WHEN sqrt(list_dot_product(embedding::DOUBLE[],
                                           embedding::DOUBLE[]))
                     * {_ANN_QUERY_NORM!r} != 0
                THEN list_dot_product(embedding::DOUBLE[],
                                      {_sql_vec(_ANN_QUERY)})
                     / (sqrt(list_dot_product(embedding::DOUBLE[],
                                              embedding::DOUBLE[]))
                        * {_ANN_QUERY_NORM!r})
           END + 1.0 AS shifted_raw
    FROM embeddings
), rounded AS (
    SELECT vec_id, round(shifted_raw, 6) AS shifted FROM scored
), spine AS (
    SELECT CAST(unnest(range(0, {_EPSI_BINS})) AS INT) AS bin
), a AS (
    SELECT CAST(least(greatest(CAST(floor(shifted / {_EPSI_WIDTH!r})
                                    AS BIGINT), 0),
                      {_EPSI_BINS - 1}) AS INT) AS bin,
           CAST(count(*) AS BIGINT) AS n_a
    FROM rounded WHERE shifted IS NOT NULL AND vec_id % 2 != 0
    GROUP BY 1
), b AS (
    SELECT CAST(least(greatest(CAST(floor(shifted / {_EPSI_WIDTH!r})
                                    AS BIGINT), 0),
                      {_EPSI_BINS - 1}) AS INT) AS bin,
           CAST(count(*) AS BIGINT) AS n_b
    FROM rounded WHERE shifted IS NOT NULL AND vec_id % 2 = 0
    GROUP BY 1
), j AS (
    SELECT spine.bin,
           COALESCE(n_a, 0) AS n_a,
           COALESCE(n_b, 0) AS n_b
    FROM spine LEFT JOIN a USING (bin) LEFT JOIN b USING (bin)
), t AS (
    SELECT CAST(sum(n_a) AS DOUBLE) AS ta,
           CAST(sum(n_b) AS DOUBLE) AS tb
    FROM j
)
SELECT bin, n_a, n_b,
       round((n_a + 0.5) / (ta + {_EPSI_BINS * 0.5!r}), 6) AS p_a,
       round((n_b + 0.5) / (tb + {_EPSI_BINS * 0.5!r}), 6) AS p_b,
       round(((n_a + 0.5) / (ta + {_EPSI_BINS * 0.5!r})
              - (n_b + 0.5) / (tb + {_EPSI_BINS * 0.5!r}))
             * ln(((n_a + 0.5) / (ta + {_EPSI_BINS * 0.5!r}))
                  / ((n_b + 0.5) / (tb + {_EPSI_BINS * 0.5!r}))), 6)
           AS psi_term
FROM j CROSS JOIN t
"""


@query("embedding_drift_psi", _EPSI_ORACLE)
def q_embedding_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift monitor: PSI between two snapshot halves
    of the corpus over each vector's cosine to a FIXED anchor vector —
    the 1-D projection that catches encoder swaps, normalization
    regressions, and domain shift without pairwise comparisons. Scan
    shape: one codegen cosine per row (zero-norm → NULL → excluded on
    both engines), then the standard fixed-grid PSI (two n_bins-row
    aggregates + bin-spine join + 1-row totals broadcast)."""
    from deftunes_spark.ext.profile import psi_drift
    from deftunes_spark.ext.similarity import cosine_to_query

    emb = _t_cpu(spark, sf_dir, "embeddings")
    scored = cosine_to_query(emb, _ANN_QUERY).select(
        "vec_id",
        F.round(F.col("cosine_sim") + F.lit(1.0), 6).alias("shifted"),
    )
    return psi_drift(
        scored.filter(F.col("vec_id") % 2 != 0),
        scored.filter(F.col("vec_id") % 2 == 0),
        "shifted",
        bin_width=_EPSI_WIDTH,
        n_bins=_EPSI_BINS,
    )
