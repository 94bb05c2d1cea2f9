"""Semi-structured, table-function, ranking, and resampling queries.

Engine extras beyond SURVEY §2 (the reference's JSON handling is
structural at read time — transform-json-job.py:74-75; everything here
is the capability a user would reach for next on the same data):

- **variant_json_agg**: Spark 4 VariantType (`parse_json` /
  `try_variant_get`) for schema-on-read JSON columns. Unlike
  `get_json_object` (string re-parse per extraction), a Variant column
  is parsed once into a binary-encoded tree and every downstream
  extraction is a cheap typed probe — the right 100 TB shape when one
  JSON blob feeds many extractions.
- **udtf_chunk_text**: Python UDTF (Spark 3.5+/4 API surface) applied
  via correlated LATERAL join. UDTFs are the Python-process slow path
  (documented; Arrow-batched when spark.sql.execution.pythonUDTF.
  arrow.enabled is set) — the point is the API and the lateral-join
  plumbing, mirrored exactly by a DuckDB LATERAL unnest oracle.
- **bm25_rank**: corpus ranking (BM25, k1=1.2 b=0.75) for a fixed
  term set. One tokenize scan feeds document length, term frequency,
  and document frequency; the per-term df/idf table is tiny and
  broadcast back; scalars (N, avgdl) ride a 1-row broadcast join.
  No UDFs — ln/arithmetic are codegen'd column expressions.
- **gapfill_daily**: time-series resample — zero-fill missing
  (event_type × day) cells over the observed date span using
  `sequence()`+`explode` for the calendar spine. The spine and the
  type list are tiny (days × types), so the grid is broadcast against
  the aggregated counts — no shuffle grows with data volume.
- **exact_median_mode**: exact per-group median (percentile, linear
  interpolation — same contract as DuckDB `median`) and a
  DETERMINISTIC mode (smallest most-frequent value; built-in `mode()`
  is tie-nondeterministic on both engines, so both sides compute it
  as count → row_number with an explicit tiebreak).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deftunes_spark.driver_queries import _t, _t_cpu, query

# ---------------------------------------------------------------------
# Spark 4 VariantType: parse once, extract typed values many times.
# ---------------------------------------------------------------------


@query(
    "variant_json_agg",
    """
    SELECT event_type,
           CAST(SUM(TRY_CAST(json_extract(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_sum,
           CAST(COUNT(TRY_CAST(json_extract(props, '$.k') AS BIGINT))
                AS BIGINT) AS n_k
    FROM events
    GROUP BY 1
    """,
)
def q_variant_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variant-typed JSON column: `try_parse_json` builds the binary
    variant once per row (NULL on malformed text, matching the unit
    test's semantics); `try_variant_get` does a typed extraction (no
    string re-parse, NULL on path/type miss). The oracle mirrors the
    whole NULL ladder with TRY_CAST(json_extract(...)) so malformed or
    non-integer `$.k` values agree engine-to-engine. (Residual
    documented asymmetry: a JSON STRING holding digits — `"5"` —
    coerces on Spark's variant path but not through DuckDB's
    json_extract quoting; the events generator emits numeric k only.)
    At 100 TB this replaces N `get_json_object` re-parses with one
    parse + N probes, all JVM-side."""
    e = _t(spark, sf_dir, "events")
    v = e.select(
        "event_type",
        F.try_variant_get(
            F.try_parse_json("props"), "$.k", "bigint"
        ).alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.sum("k").alias("k_sum"),
        F.count("k").alias("n_k"),
    )


# ---------------------------------------------------------------------
# Python UDTF + correlated LATERAL join.
# ---------------------------------------------------------------------

_CHUNK = 120


def _chunk_text_udtf():
    """Build the UDTF class lazily (pyspark import surface)."""
    from pyspark.sql.functions import udtf

    # useArrow: batches rows through Arrow instead of pickled
    # row-at-a-time eval (BatchEvalPython → ArrowEvalPythonUDTF) —
    # same 10-100× boundary-cost rule as pandas UDFs; plan-linted.
    @udtf(returnType="frag_idx int, frag string, frag_len int",
          useArrow=True)
    class ChunkText:
        def eval(self, text: str):  # noqa: D401 - UDTF contract
            if not text:
                return
            for i in range(0, len(text), _CHUNK):
                frag = text[i : i + _CHUNK]
                yield i // _CHUNK, frag, len(frag)

    return ChunkText


@query(
    "udtf_chunk_text",
    f"""
    SELECT d.doc_id,
           CAST(g.g AS INT) AS frag_idx,
           substr(d.text, CAST(g.g * {_CHUNK} + 1 AS BIGINT), {_CHUNK})
               AS frag,
           CAST(length(substr(d.text, CAST(g.g * {_CHUNK} + 1 AS BIGINT),
                              {_CHUNK})) AS INT) AS frag_len
    FROM documents d,
         LATERAL (
           SELECT unnest(range(0,
               CAST(ceil(length(d.text) / {_CHUNK}.0) AS BIGINT)))
         ) AS g(g)
    WHERE d.text IS NOT NULL AND length(d.text) > 0
    """,
)
def q_udtf_chunk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF splitting each document into fixed-width fragments,
    applied per-row with a correlated LATERAL join (one output row per
    fragment). The oracle mirrors the exact substring arithmetic with
    DuckDB LATERAL unnest(range(...))."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    spark.udtf.register("chunk_text", _chunk_text_udtf())
    return spark.sql(
        """
        SELECT d.doc_id, c.frag_idx, c.frag, c.frag_len
        FROM {docs} d, LATERAL chunk_text(d.text) c
        """,
        docs=docs,
    )


# ---------------------------------------------------------------------
# BM25 ranking over the documents corpus.
# ---------------------------------------------------------------------

_BM25_TERMS = ("window", "vector", "stream")
_BM25_K1 = 1.2
_BM25_B = 0.75
# Explicit SQL IN list — a tuple repr would render a single-element
# list as ('window',), which is invalid SQL.
_BM25_IN = "(" + ", ".join(repr(t) for t in _BM25_TERMS) + ")"


@query(
    "bm25_rank",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM tok WHERE term IN {_BM25_IN}
      GROUP BY 1, 2
    ),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
    scores AS (
      SELECT tf.doc_id,
             SUM(ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
                 * tf.tf * ({_BM25_K1} + 1)
                 / (tf.tf + {_BM25_K1} * (1 - {_BM25_B}
                    + {_BM25_B} * dl.dl / stats.avgdl))) AS score
      FROM tf
      JOIN df USING (term)
      JOIN dl USING (doc_id)
      CROSS JOIN stats
      GROUP BY 1
    )
    SELECT doc_id, ROUND(score, 6) AS bm25
    FROM scores
    ORDER BY bm25 DESC, doc_id
    LIMIT 10
    """,
)
def q_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 for a fixed disjunctive query. Shape: one tokenize
    scan → per-doc length agg and per-(doc,term) tf agg; df/idf is a
    ≤|terms|-row table and N/avgdl a 1-row frame, both broadcast; the
    final top-k is TakeOrderedAndProject (no global sort). Scores are
    rounded to 6 dp on both sides BEFORE the order-by so the float-sum
    association order can't flip the cut line."""
    docs = _t_cpu(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        tok.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "part",
            F.log(
                1
                + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
            )
            * F.col("tf")
            * (_BM25_K1 + 1)
            / (
                F.col("tf")
                + _BM25_K1
                * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("part"), 6).alias("bm25"))
    )
    return scored.orderBy(F.desc("bm25"), "doc_id").limit(10)


# ---------------------------------------------------------------------
# Calendar gap-fill resample (sequence + explode spine).
# ---------------------------------------------------------------------


@query(
    "gapfill_daily",
    """
    WITH e AS (
      SELECT CAST(ts AS DATE) AS d, event_type
      FROM events WHERE value > 200
    ),
    days AS (
      SELECT CAST(unnest(generate_series(
        (SELECT MIN(d) FROM e),
        (SELECT MAX(d) FROM e),
        INTERVAL 1 DAY)) AS DATE) AS d
    ),
    types AS (SELECT DISTINCT event_type FROM e),
    counts AS (SELECT event_type, d, COUNT(*) AS c FROM e GROUP BY 1, 2)
    SELECT t.event_type, days.d AS d,
           CAST(COALESCE(c.c, 0) AS BIGINT) AS n
    FROM days
    CROSS JOIN types t
    LEFT JOIN counts c ON c.event_type = t.event_type AND c.d = days.d
    """,
)
def q_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-fill missing (event_type, day) cells across the observed
    span. The calendar spine comes from `sequence(min_d, max_d)` +
    `explode`; spine × type-list is a tiny broadcast grid left-joined
    to the pre-aggregated counts, so nothing here scales with raw row
    count except the one count aggregation."""
    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value") > 200)
        .select(F.to_date("ts").alias("d"), "event_type")
    )
    bounds = e.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    days = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("d")
    )
    types = e.select("event_type").distinct()
    counts = e.groupBy("event_type", "d").agg(
        F.count(F.lit(1)).alias("c")
    )
    grid = days.crossJoin(F.broadcast(types))
    return grid.join(counts, ["event_type", "d"], "left").select(
        "event_type",
        "d",
        F.coalesce("c", F.lit(0)).cast("bigint").alias("n"),
    )


# ---------------------------------------------------------------------
# Exact median + deterministic mode per group.
# ---------------------------------------------------------------------


@query(
    "exact_median_mode",
    """
    WITH med AS (
      SELECT l_returnflag, median(l_quantity) AS median_qty
      FROM lineitem GROUP BY 1
    ),
    c AS (
      SELECT l_returnflag, l_quantity, COUNT(*) AS cnt
      FROM lineitem GROUP BY 1, 2
    ),
    r AS (
      SELECT l_returnflag, l_quantity, cnt,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY cnt DESC, l_quantity ASC) AS rn
      FROM c
    )
    SELECT med.l_returnflag,
           CAST(med.median_qty AS DOUBLE) AS median_qty,
           CAST(r.l_quantity AS DOUBLE) AS mode_qty,
           CAST(r.cnt AS BIGINT) AS mode_count
    FROM med JOIN r ON med.l_returnflag = r.l_returnflag AND r.rn = 1
    """,
)
def q_exact_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group median (percentile 0.5, linear interpolation —
    the same contract DuckDB's `median` applies to numerics) plus a
    DETERMINISTIC mode: both engines' built-in mode() breaks frequency
    ties arbitrarily, so both sides compute count-per-value →
    row_number(cnt DESC, value ASC). The mode side is two partial-agg
    shuffles on (group, value) — no sort of raw rows; median is the
    one genuinely order-statistics-heavy agg (Spark buffers per-group
    values; at 100 TB swap in approx_percentile — `quantile_profile`
    covers that path)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity"
    )
    med = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty")
    )
    c = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    best = c.groupBy("l_returnflag").agg(
        F.max(
            F.struct(
                F.col("cnt"),
                (-F.col("l_quantity")).alias("neg_qty"),
            )
        ).alias("top")
    )
    mode = best.select(
        "l_returnflag",
        (-F.col("top.neg_qty")).cast("double").alias("mode_qty"),
        F.col("top.cnt").cast("bigint").alias("mode_count"),
    )
    return med.join(mode, "l_returnflag").select(
        "l_returnflag",
        F.col("median_qty").cast("double").alias("median_qty"),
        "mode_qty",
        "mode_count",
    )


# ---------------------------------------------------------------------
# Pandas UDF surface completion: grouped-agg UDAF + batch applyInPandas
# (the two grouped shapes the engine had not yet exercised — scalar
# pandas UDFs, mapInPandas, UDTFs and applyInPandasWithState live in
# ext/ and streaming/).
# ---------------------------------------------------------------------


@query(
    "udaf_geomean",
    """
    SELECT l_returnflag,
           ROUND(exp(AVG(ln(l_quantity))), 6) AS geomean_qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_quantity > 0
    GROUP BY 1
    """,
)
def q_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate as a GROUPED_AGG pandas UDF: per-flag geometric
    mean of quantities. Arrow ships each group's column once; the
    UDAF runs vectorized numpy. At 100 TB the shuffle is the same
    hash-by-key exchange as any aggregate — the UDF only changes the
    reduce side; prefer built-ins (exp∘avg∘ln here) when they exist,
    this query pins the surface for aggregates that have none."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _geomean(v):
        return float(np.exp(np.log(v.to_numpy(dtype="float64")).mean()))

    # `from __future__ import annotations` stringifies inline hints,
    # which pandas_udf cannot resolve (same workaround as
    # ext/text.with_nfc_normalized); real annotation objects make this
    # a GROUPED_AGG UDF (Series -> scalar).
    _geomean.__annotations__ = {"v": pd.Series, "return": float}
    geomean = pandas_udf(_geomean, "double")

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    # A grouped-agg pandas UDF cannot share an agg() with JVM
    # aggregates (INVALID_PANDAS_UDF_PLACEMENT) — the count rides a
    # separate 3-row aggregate joined back.
    g = li.groupBy("l_returnflag").agg(
        geomean(F.col("l_quantity")).alias("_g")
    )
    n = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    return g.join(n, "l_returnflag").select(
        "l_returnflag",
        F.round("_g", 6).alias("geomean_qty"),
        "n",
    )


@query(
    "grouped_zscore",
    """
    SELECT o_custkey, o_orderkey,
           ROUND((o_totalprice - AVG(o_totalprice) OVER w)
                 / NULLIF(STDDEV_SAMP(o_totalprice) OVER w, 0), 6) AS z
    FROM orders
    WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_custkey)
    """,
)
def q_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ``applyInPandas`` (grouped map): per-customer z-scores of
    order totals. One hash shuffle on the group key, then each group
    arrives as ONE Arrow-backed pandas frame — the shape for
    group-local logic a window function can't express (here it can,
    which is exactly what makes the DuckDB window oracle possible).
    Degenerate groups (single order / identical totals) yield NULL on
    both paths (pandas ddof=1 NaN ↔ SQL STDDEV_SAMP NULL)."""
    import numpy as np
    import pandas as pd

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["o_totalprice"].to_numpy(dtype="float64")
        s = pdf["o_totalprice"].std(ddof=1)
        if not np.isfinite(s) or s == 0.0:
            z = pd.Series([None] * len(pdf), dtype="object")
        else:
            z = ((x - x.mean()) / s).round(6)
        return pd.DataFrame(
            {
                "o_custkey": pdf["o_custkey"],
                "o_orderkey": pdf["o_orderkey"],
                "z": z,
            }
        )

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    return orders.groupBy("o_custkey").applyInPandas(
        zscore, "o_custkey long, o_orderkey long, z double"
    )
