"""Round-12 operators.

- ``pagerank_bucketed``: the cluster-scale PageRank entry point the
  graph module's header promises (ext/graph.py:9-15) — the weighted
  edge table is persisted ONCE bucketed on the scatter key, so every
  superstep's scatter join consumes the bucket layout and only the
  gather aggregation shuffles: exactly ONE Exchange of rank-sized
  rows per superstep (plan-asserted in tests/test_graph.py), vs the
  plain path's re-shuffle of the edge list every iteration. Same
  unrolled-CTE oracle as ``pagerank_sales`` — bucketing must never
  change results.

Each entry follows the registry contract: a Spark builder plus a
DuckDB value-hash oracle mirroring the full chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deftunes_spark.driver_queries import _t, query
from deftunes_spark.driver_queries_analytics import (
    _PR_DAMP,
    _PR_ITERS,
    _pagerank_oracle,
)

# =====================================================================
# Bucketed-edge PageRank (r11 verdict #6)
# =====================================================================

# One bucketed weighted-edge table per (session, sf_dir) — the same
# build-once pattern as driver_queries_cov._bucketed_pair: the write
# is the operator under test (pay-the-shuffle-once-at-write), it must
# happen once per session rather than per builder call (bench
# re-invokes builders), and uuid-suffixed EXTERNAL tables in a tempdir
# avoid fixed-name races on the shared warehouse. Keyed by
# applicationId: a stopped session's object address can be reused.
_PR_BKT_TABLES: dict[tuple[str, str], str] = {}


def _pagerank_bucketed_table(spark: SparkSession, sf_dir: str) -> str:
    import uuid as _uuid

    from deftunes_spark.io.scratch import scratch_dir
    from deftunes_spark.io.writers import write_bucketed_table

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _PR_BKT_TABLES:
        table = f"pgbkt_edges_{_uuid.uuid4().hex[:10]}"
        # Bounded scratch (r12 advice): the old per-process mkdtemp
        # left one full edge-table copy per sweep/stress run. The
        # scratch helper pins one live copy per (sf_dir, PID) and
        # garbage-collects dead processes' copies.
        base = scratch_dir("pgbkt", sf_dir, wipe=True)
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
        e = edges.select(
            F.col("src").alias("s"), F.col("dst").alias("d")
        ).distinct()
        und = e.union(
            e.select(F.col("d").alias("s"), F.col("s").alias("d"))
        ).distinct()
        outdeg = und.groupBy(F.col("s").alias("_n")).agg(
            F.count(F.lit(1)).alias("outdeg")
        )
        weighted = und.join(outdeg, und["s"] == outdeg["_n"]).select(
            "s", "d", (F.lit(1.0) / F.col("outdeg")).alias("w")
        )
        # n_buckets == spark.sql.shuffle.partitions so the gather
        # output's HashPartitioning matches the bucket layout and the
        # next superstep's scatter join reuses BOTH sides exchange-free
        # (a mismatched count still works — it just re-adds an
        # Exchange on the rank side).
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
        write_bucketed_table(
            weighted, table, "s", n_buckets, "s",
            path=f"{base}/{table}",
        )
        _PR_BKT_TABLES[key] = table
    return _PR_BKT_TABLES[key]


@query("pagerank_bucketed", _pagerank_oracle())
def q_pagerank_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer↔supplier trade graph, scatter side
    pre-bucketed: the weighted edge list (s, d, 1/outdeg) lands ONCE
    as a table bucketed on ``s`` (io.writers.write_bucketed_table),
    then ext.graph.pagerank_preweighted runs the identical fixed-3-
    superstep recurrence as ``pagerank_sales``. Per superstep the
    scatter join is co-located on the bucket layout and only the
    gather groupBy exchanges — at 100 TB the edge list (the fat,
    static side) is shuffled exactly once at write time and amortized
    over every iteration and every run, while the plain path pays an
    edge-list shuffle per superstep. Node universe = DISTINCT s off
    the bucketed table (every node appears as a source in the
    undirected graph), itself exchange-free on the bucket layout.
    Oracle: the same unrolled-CTE recurrence — bucketing is a physical
    layout choice and must never change values."""
    from deftunes_spark.ext.graph import pagerank_preweighted

    wt = spark.table(_pagerank_bucketed_table(spark, sf_dir))
    nodes = wt.select(F.col("s").alias("node")).distinct()
    ranks = pagerank_preweighted(
        wt, nodes, iterations=_PR_ITERS, damping=_PR_DAMP
    )
    return ranks.select(
        F.col("node").cast("bigint").alias("node"),
        F.round("rank", 10).alias("pagerank"),
    )


# =====================================================================
# Gopher n-gram repetition filters (the duplicate-n-gram half of the
# Rae et al. 2021 repetition rules; the unigram half is
# `text_repetition`)
# =====================================================================

_WS = "[ \\t\\n\\x0B\\f\\r]+"


def _ngram_rep_oracle() -> str:
    blocks, sels, joins = [], [], []
    for n in (2, 3):
        blocks.append(f"""
    g{n} AS (
        SELECT doc_id, array_to_string(tk[i:i+{n - 1}], ' ') AS gram
        FROM tk,
             unnest(range(1, greatest(len(tk) - {n - 1}, 0) + 1))
                 AS t(i)
    ), c{n} AS (
        SELECT doc_id, gram, COUNT(*) AS c FROM g{n} GROUP BY 1, 2
    ), a{n} AS (
        SELECT doc_id, SUM(c) AS total, MAX(c) AS top,
               SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup
        FROM c{n} GROUP BY 1
    )""")
        sels.append(
            f"CAST(COALESCE(a{n}.total, 0) AS BIGINT) AS n_{n}grams,\n"
            f"       COALESCE(round(CAST(a{n}.top AS DOUBLE)"
            f" / a{n}.total, 6), 0.0) AS top_{n}gram_frac,\n"
            f"       COALESCE(round(CAST(a{n}.dup AS DOUBLE)"
            f" / a{n}.total, 6), 0.0) AS dup_{n}gram_frac"
        )
        joins.append(f"LEFT JOIN a{n} USING (doc_id)")
    sel_block = ",\n           ".join(sels)
    return f"""
    WITH tk AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(trim(text), '{_WS}'),
                           x -> x <> '') AS tk
        FROM documents
    ),{",".join(blocks)}
    SELECT d.doc_id,
           {sel_block}
    FROM (SELECT doc_id FROM documents) d
    {" ".join(joins)}
    """


@query("gopher_ngram_repetition", _ngram_rep_oracle())
def q_gopher_ngram_repetition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-document duplicate-n-gram fractions (2- and 3-grams) — the
    n-gram half of Gopher's repetition filter set, in the
    explode+groupBy form that survives adversarially long documents
    (ext.text.ngram_repetition: keyed aggregation on (doc, gram), so
    per-task work tracks the shuffle partition, not the longest row;
    gram construction rides the scan as pure codegen). The oracle
    recomputes both n's dense gram tables in SQL; zero-gram documents
    (shorter than n tokens) must report zeros on both engines."""
    from deftunes_spark.ext.text import ngram_repetition

    return ngram_repetition(
        _t(spark, sf_dir, "documents"), "doc_id", "text", ns=(2, 3)
    )
