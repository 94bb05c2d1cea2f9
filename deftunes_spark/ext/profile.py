"""Table profiling: per-column stats in one distributed pass.

A training-data pipeline's first touch on a new 100 TB table is a
profile — row counts, null rates, cardinalities, value ranges per
column. This generalizes the DQDL aggregations (quality/rules.py) from
pass/fail rules to a stats table: everything is computed in ONE
``df.agg(...)`` over all columns (a single scan, map-side combined;
the only shuffles are the per-column distinct counts), then pivoted to
long form driver-side (the agg result is a single row — no collect of
data rows).

At extreme cardinalities swap ``countDistinct`` for
``approx_count_distinct`` via ``approx=True`` (HLL sketch, no key
shuffle — same trade as ext/scale.approx_uniqueness).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("col_name", T.StringType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("n_null", T.LongType(), False),
        T.StructField("n_distinct", T.LongType(), False),
        T.StructField("min_val", T.StringType(), True),
        T.StructField("max_val", T.StringType(), True),
    ]
)


def profile_columns(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """One-pass column profile → (col_name, n_rows, n_null, n_distinct,
    min_val, max_val) with min/max rendered as strings."""
    cols = list(columns) if columns is not None else df.columns
    distinct = (
        (lambda c: F.approx_count_distinct(c))
        if approx
        else (lambda c: F.countDistinct(c))
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1))
            .cast("bigint")
            .alias(f"__null_{c}"),
            distinct(c).cast("bigint").alias(f"__dist_{c}"),
            # min/max in the column's native ordering, rendered as
            # string afterwards (string-first would sort "10" < "9").
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs).collect()[0]
    rows = [
        (
            c,
            one["__n"],
            one[f"__null_{c}"],
            one[f"__dist_{c}"],
            one[f"__min_{c}"],
            one[f"__max_{c}"],
        )
        for c in cols
    ]
    return df.sparkSession.createDataFrame(rows, PROFILE_SCHEMA)


def robust_group_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    z_cut: float = 3.0,
) -> DataFrame:
    """Per-group robust statistics: exact median, MAD (median absolute
    deviation), and the count of robust-z outliers
    (|x − median| > z_cut · 1.4826 · MAD — the normal-consistent MAD
    scaling). Median/MAD are the outlier-resistant center/spread a
    curation pipeline trusts when means are poisoned by the very
    outliers it hunts.

    Shape: two grouped exact-percentile aggregations plus two
    broadcast joins of the per-group scalars — the group-stat tables
    are #groups-sized (kilobytes at any corpus scale), so the wide
    table is scanned twice and never shuffled beyond the two
    map-side-combined aggs. Returns
    (group, median, mad, n, n_outliers)."""
    g, v = F.col(group_col), F.col(value_col)
    med = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("_med")
    )
    dev = df.join(F.broadcast(med), group_col).select(
        g.alias(group_col),
        v.alias(value_col),
        F.col("_med"),
        F.abs(v - F.col("_med")).alias("_absdev"),
    )
    mad = dev.groupBy(group_col).agg(
        F.first("_med").alias("_med2"),
        F.expr("percentile(_absdev, 0.5)").alias("_mad"),
    )
    scored = dev.join(F.broadcast(mad.drop("_med2")), group_col)
    return (
        scored.groupBy(group_col)
        .agg(
            F.round(F.first("_med"), 4).alias("median"),
            F.round(F.first("_mad"), 4).alias("mad"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count(
                F.when(
                    F.col("_absdev") > z_cut * 1.4826 * F.col("_mad"),
                    F.lit(1),
                )
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


def psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    bin_width: float,
    n_bins: int,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — THE drift monitor a recurring ingest runs before letting
    a new batch into the training mix (PSI < 0.1 stable, 0.1–0.25
    watch, > 0.25 investigate, per the standard credit-scoring rule of
    thumb).

    Fixed equi-width bins (``floor(x / bin_width)`` clamped to
    ``[0, n_bins)``) — bin edges are a pure function of the CONFIG,
    never of either dataset, so the measurement is reproducible and
    incremental batches can't shift the grid under each other.
    Laplace-smoothed shares (+0.5 per bin) keep empty bins finite on
    both sides. Returns one row per bin: counts, shares, and the
    bin's PSI term ``(p_a − p_b)·ln(p_a / p_b)`` (sum them for the
    index; emitting terms keeps the result value-hash checkable and
    shows WHERE the drift lives).

    Shape at 100 TB: each side is one partial-aggregating groupBy to
    ``n_bins`` rows; the join is bin-spine sized. The totals attach
    via a 1-row broadcast grid join — O(1) rows, never a shuffle of
    data."""
    spark = df_a.sparkSession
    spine = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))

    def binned(d: DataFrame, name: str) -> DataFrame:
        return (
            d.filter(F.col(value_col).isNotNull())
            .select(
                F.least(
                    F.greatest(
                        F.floor(F.col(value_col) / F.lit(bin_width)),
                        F.lit(0),
                    ),
                    F.lit(n_bins - 1),
                )
                .cast("int")
                .alias("bin")
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).cast("bigint").alias(name))
        )

    counts = (
        spine.join(binned(df_a, "n_a"), "bin", "left")
        .join(binned(df_b, "n_b"), "bin", "left")
        .fillna(0, ["n_a", "n_b"])
    )
    tot = counts.agg(
        F.sum("n_a").cast("double").alias("_ta"),
        F.sum("n_b").cast("double").alias("_tb"),
    )
    smooth = float(n_bins) * 0.5
    p_a = (F.col("n_a") + F.lit(0.5)) / (F.col("_ta") + F.lit(smooth))
    p_b = (F.col("n_b") + F.lit(0.5)) / (F.col("_tb") + F.lit(smooth))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_a",
            "n_b",
            F.round(p_a, 6).alias("p_a"),
            F.round(p_b, 6).alias("p_b"),
            F.round((p_a - p_b) * F.log(p_a / p_b), 6).alias("psi_term"),
        )
    )


# ---------------------------------------------------------------------
# Count-min sketch heavy hitters
# ---------------------------------------------------------------------


def _cms_pos_sql(seed: int, s: str, width: int) -> str:
    """md5-derived CMS cell index — engine-portable (mirrors into
    ANSI SQL hex arithmetic), deterministic under retries."""
    return (
        f"pmod(cast(conv(substr(md5(concat('cms{seed}|', {s})), 1, 15),"
        f" 16, 10) as bigint), {width})"
    )


def cms_build(
    items: DataFrame,
    item_col: str,
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """Count-min sketch over an item stream: ``depth × width``
    counters, cell (d, pos_d(item)) summing occurrences. The ONLY
    shuffle carries (seed, cell) pairs — at most depth×width distinct
    keys regardless of corpus size, partial-aggregated map-side, so
    the sketch state is O(d·w) while the exact distinct-item table is
    corpus-sized. Returns (seed, cell, cnt)."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    cells = items.select(
        F.posexplode(
            F.expr(
                "array("
                + ", ".join(
                    _cms_pos_sql(d, item_col, width) for d in range(depth)
                )
                + ")"
            )
        ).alias("seed", "cell")
    )
    return cells.groupBy("seed", "cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


def cms_estimate(
    candidates: DataFrame,
    sketch: DataFrame,
    item_col: str,
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """Point estimates from a count-min sketch: for each candidate,
    min over the depth rows of its cell counts — the classic CMS
    upper-bound estimator (never undercounts; overcounts by collision
    mass ≤ e·N/width with prob 1−e^{−depth}). The sketch side is
    d×w rows — broadcast; candidates join it d times via their cell
    index, never touching the item stream again."""
    cand = candidates.select(
        F.col(item_col),
        F.posexplode(
            F.expr(
                "array("
                + ", ".join(
                    _cms_pos_sql(d, item_col, width) for d in range(depth)
                )
                + ")"
            )
        ).alias("seed", "cell"),
    )
    return (
        cand.join(F.broadcast(sketch), ["seed", "cell"], "left")
        .groupBy(item_col)
        .agg(
            F.min(F.coalesce("cnt", F.lit(0)))
            .cast("bigint")
            .alias("est_count")
        )
    )


def heavy_hitters_cms(
    df: DataFrame,
    id_col: str,
    item_col: str,
    k: int = 20,
    sample_hex_threshold: str = "33333333",
    candidate_factor: int = 2,
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """Top-k heavy hitters without a corpus-sized distinct table:

    1. CANDIDATES from an md5 hash-sample of documents (deterministic
       ``md5(id) < threshold`` membership — heavy hitters survive any
       constant-rate sample), exact-counted within the sample and cut
       to ``candidate_factor·k``;
    2. ESTIMATES for those candidates from a count-min sketch built
       over the FULL corpus (one d×w-keyed shuffle);
    3. top-k by (estimate desc, item) — deterministic.

    The full corpus is touched twice, both times map-side (sketch
    build, nothing else); only sample rows hit an item-keyed shuffle.
    ``est_count`` never undercounts the true document frequency.
    ``df`` must already be one row per (doc, item) occurrence to
    count — dedupe upstream for document frequency semantics."""
    if k < 1 or candidate_factor < 1:
        raise ValueError("k and candidate_factor must be >= 1")
    # The threshold compares against lowercase md5 hex as a RAW string:
    # an uppercase or wrong-length value silently shifts the sample
    # rate (e.g. '3333' ~0%) instead of erring — validate up front.
    import re

    if not re.fullmatch(r"[0-9a-f]{8}", sample_hex_threshold):
        raise ValueError(
            "sample_hex_threshold must be exactly 8 lowercase hex "
            f"chars, got {sample_hex_threshold!r}"
        )
    sampled = df.filter(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
        < F.lit(sample_hex_threshold)
    )
    cand = (
        sampled.groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("_sample_cnt"))
        .orderBy(F.col("_sample_cnt").desc(), item_col)
        .limit(candidate_factor * k)
        .select(item_col)
    )
    sketch = cms_build(df.select(item_col), item_col, depth, width)
    est = cms_estimate(cand, sketch, item_col, depth, width)
    return est.orderBy(F.col("est_count").desc(), item_col).limit(k)


# ---------------------------------------------------------------------
# Zipf rank-frequency fit
# ---------------------------------------------------------------------


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    max_rank: int = 10_000,
) -> DataFrame:
    """Zipf rank-frequency diagnostics over the corpus vocabulary: the
    log-log slope (and intercept) of frequency vs rank for the top
    ``max_rank`` tokens, plus full vocabulary size and total token
    count — the corpus-health numbers that flag boilerplate floods
    (slope far below −1), tokenizer damage, or synthetic/templated
    text (slope near 0) before anything trains on it. Fitting only the
    head is the standard practice (the tail is dominated by hapax
    noise) AND the scale guard: ranking is a distributed
    TakeOrderedAndProject over (count desc, token), never a global
    sort, and the fit's window runs over ≤ max_rank rows — a CONSTANT,
    not the vocabulary.

    Cross-engine determinism: ln(rank)/ln(count) round to 6 dp and
    cast DECIMAL(18,6), all four regression moments are exact decimal
    sums (order-independent), and the closed-form slope/intercept is
    the identical double expression tree on both engines."""
    if max_rank < 2:
        raise ValueError("max_rank must be >= 2")
    toks = df.select(
        F.explode(
            F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), "[ \\t\\n\\x0B\\f\\r]+")
        ).alias("_tok")
    ).filter(F.col("_tok") != "")
    vocab = toks.groupBy("_tok").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    corpus = vocab.agg(
        F.count(F.lit(1)).cast("bigint").alias("_vocab"),
        F.sum("_cnt").cast("bigint").alias("_total"),
    )
    head = vocab.orderBy(F.col("_cnt").desc(), "_tok").limit(max_rank)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("_cnt").desc(), "_tok")
    x = F.round(F.log(F.col("_rank").cast("double")), 6).cast(
        "decimal(18,6)"
    )
    y = F.round(F.log(F.col("_cnt").cast("double")), 6).cast(
        "decimal(18,6)"
    )
    pts = head.withColumn("_rank", F.row_number().over(w)).select(
        x.alias("_x"), y.alias("_y")
    )
    moments = pts.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum("_x").cast("double").alias("_sx"),
        F.sum("_y").cast("double").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).cast("double").alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).cast("double").alias("_sxx"),
    )
    slope = (
        F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    ) / (
        F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    )
    intercept = (F.col("_sy") - slope * F.col("_sx")) / F.col("_n")
    return moments.join(F.broadcast(corpus)).select(
        F.col("_vocab").alias("vocab_size"),
        F.col("_total").alias("total_tokens"),
        F.col("_n").cast("bigint").alias("fitted_ranks"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(intercept, 6).alias("zipf_intercept"),
    )
