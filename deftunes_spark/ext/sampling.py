"""Deterministic sampling & splits for training-data pipelines.

Random sampling is useless for reproducible corpus builds — a re-run
must select the SAME rows regardless of cluster size, partition
layout, or Spark version. These operators key every decision off a
content hash of a stable id (md5 hex prefix), so:

- the sample is a pure function of the data (re-runnable, auditable);
- adding/removing OTHER rows never flips a row's membership (unlike
  ``df.sample``, whose per-partition RNG reshuffles under repartition);
- any engine can replay the selection (md5 is md5 everywhere — the
  DuckDB oracle runs the same predicate verbatim).

Cost: one codegen md5 per row, no shuffle, fully pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16^6 hex buckets ≈ 16.7M — plenty of resolution for ppm-level rates.
_BUCKETS = 16**6


def _hash_bucket(id_col: str, salt: str = "") -> Column:
    """Stable bucket in [0, 16^6) from the md5 of (salt || id)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 6),
        16,
        10,
    ).cast("long")


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose hash bucket
    falls below fraction·16^6. Different ``salt`` values draw
    independent samples from the same data."""
    return df.filter(_hash_bucket(id_col, salt) < int(fraction * _BUCKETS))


def train_test_split(
    df: DataFrame, id_col: str, test_fraction: float = 0.1, salt: str = ""
) -> DataFrame:
    """Adds a ``split`` column ('train'/'test') — same hash family, so
    the assignment is stable under re-runs and incremental appends."""
    is_test = _hash_bucket(id_col, salt) < int(test_fraction * _BUCKETS)
    return df.withColumn(
        "split", F.when(is_test, F.lit("test")).otherwise(F.lit("train"))
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    test_fraction: float = 0.1,
    salt: str = "",
) -> DataFrame:
    """Train/test split that cannot leak near-duplicates across the
    boundary: rows are first clustered by connected components over
    ``pairs`` (near-dup edges ``id_a``/``id_b``), then the split
    decision hashes the CLUSTER id — every member of a duplicate
    cluster lands on the same side. A plain per-row hash split puts
    ~2·f·(1−f) of each dup pair's mass astride the boundary, which is
    exactly the train→test contamination a decontamination pass exists
    to prevent; splitting on the cluster makes that probability zero
    by construction.

    Singleton rows (no near-dup edge) are their own cluster, so the
    expected test mass stays ``test_fraction``. Deterministic and
    incremental-append-stable like every split here: the assignment is
    a pure function of (salt, cluster id), and the cluster id is the
    min member id — stable as long as the duplicate set is.

    Adds ``cluster`` and ``split`` columns. Cost at 100 TB: the
    components loop is bounded by duplicate-graph diameter (edges only
    — the corpus itself never iterates); the split itself is one
    codegen md5, no extra shuffle beyond the cluster left-join."""
    from deftunes_spark.ext.dedup import connected_components

    comp = connected_components(pairs, "id_a", "id_b")
    labeled = df.join(
        comp, df[id_col] == comp["node"], "left"
    ).select(
        *df.columns,
        F.coalesce(F.col("comp"), F.col(id_col)).alias("cluster"),
    )
    is_test = _hash_bucket("cluster", salt) < int(
        test_fraction * _BUCKETS
    )
    return labeled.withColumn(
        "split", F.when(is_test, F.lit("test")).otherwise(F.lit("train"))
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    id_col: str,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample 'en' to 10%
    but keep 100% of low-resource languages). Same hash-threshold
    trick, threshold looked up per stratum."""
    thresh = F.lit(None).cast("long")
    expr = None
    for k, frac in fractions.items():
        cond = F.col(strata_col) == k
        t = F.lit(int(frac * _BUCKETS))
        expr = F.when(cond, t) if expr is None else expr.when(cond, t)
    thresh = expr.otherwise(F.lit(0)) if expr is not None else F.lit(0)
    return df.filter(_hash_bucket(id_col, salt) < thresh)


def shuffle_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int = 8,
    seed: str = "shuffle-v1",
    with_position: bool = True,
) -> DataFrame:
    """Deterministic global shuffle + shard assignment for training
    export.

    Training runs must see documents in an order uncorrelated with
    ingestion order (source/time locality biases SGD), yet a corpus
    rebuild must reproduce the SAME order. Both come from ordering by
    a content hash: ``shuffle_key = md5(seed || id)``, ``shard`` from
    the key's hex prefix, position = rank of the key within its shard.

    Scale shape: the key and shard are narrow codegen expressions; at
    100 TB the export is ``repartition(n_shards, shard)`` +
    ``sortWithinPartitions(shuffle_key)`` writing one shard per task —
    no global sort ever happens. The per-shard ``row_number`` window
    here materializes that same order as a checkable column (its
    partition-by-shard sort is exactly the export's within-shard
    sort). Re-running with the same seed reproduces positions
    bit-for-bit; changing the seed is a fresh epoch-level reshuffle.
    """
    if not (1 <= n_shards <= 1 << 31):
        raise ValueError("n_shards must be in [1, 2^31]")
    key = F.md5(
        F.concat(F.lit(seed + "|"), F.col(id_col).cast("string"))
    )
    # 8 hex chars = 2^32 bucket resolution, so shard counts up to the
    # hundreds of thousands a ~1 GB/shard 100 TB export needs stay
    # uniform (a 4-char prefix would cap usable shards at 65536).
    shard = (
        F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint") % n_shards
    ).cast("int")
    out = df.withColumn("shuffle_key", key).withColumn("shard", shard)
    if with_position:
        from pyspark.sql import Window

        w = Window.partitionBy("shard").orderBy(
            "shuffle_key", F.col(id_col)
        )
        out = out.withColumn(
            "shard_pos", F.row_number().over(w).cast("bigint")
        )
    return out


def reservoir_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
    seed: str = "reservoir-v1",
) -> DataFrame:
    """Deterministic fixed-size uniform sample PER GROUP — the
    "cap every language/source at k docs" primitive of corpus
    mixing, as a distributed one-pass: rank rows inside each group by
    a content hash and keep the k smallest. Equivalent in distribution
    to a per-group reservoir, but re-runnable (same rows every run,
    any partitioning) and engine-replayable. The window partitions by
    group — never global; with heavily skewed groups the same
    selection works as groupBy(group).agg(min_by(struct, k)) to
    map-side combine. Adds ``sample_rank`` (1..k)."""
    key = F.md5(
        F.concat(
            F.lit(seed + "|"),
            F.col(group_col).cast("string"),
            F.lit("|"),
            F.col(id_col).cast("string"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(key, F.col(id_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .withColumn("sample_rank", F.col("sample_rank").cast("bigint"))
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int = 25,
    tag: str = "ws-v1",
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis
    A-ES): each row draws a deterministic uniform u from
    ``md5(tag|id)`` and scores ``key = −ln(u)/w``; the k SMALLEST keys
    are the sample — inclusion probability proportional to weight,
    exactly the exponential-clocks argument. Non-positive or NULL
    weights are excluded (they can never win a clock race).

    Deterministic under retries and across engines (md5-derived u, no
    RNG state — the same reasoning as ``hash_sample``); the plan is
    one codegen projection plus TakeOrderedAndProject (per-partition
    heaps, no global sort), so the sample costs one scan at any
    corpus size. Selection orders on the UNROUNDED key — a fixed-dp
    rounding would collapse all large-weight keys (median 0.69/w,
    < 1e-6 for w ≥ 1e6) into one tie bucket and degrade selection to
    ascending-id order, silently breaking proportionality exactly
    where weights differ most. Distinct md5-derived uniforms keep
    keys apart by far more than any libm ulp, so the float ordering
    is engine-stable; only the EMITTED key is rounded (6 dp) for the
    cross-engine value hash."""
    if k < 1:
        raise ValueError("k must be >= 1")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{tag}|"), F.col(id_col).cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(1 << 60))
    key = -F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col).cast("double") > 0)
        .select(
            F.col(id_col),
            F.col(weight_col).cast("double").alias("weight"),
            key.alias("_key"),
        )
        .orderBy("_key", id_col)
        .limit(k)
        .select(
            id_col,
            "weight",
            F.round("_key", 6).alias("sample_key"),
        )
    )
