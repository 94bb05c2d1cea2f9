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
