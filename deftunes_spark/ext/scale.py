"""Scale-out helpers: skew mitigation and sketch-based cardinality.

The reference delegates physical planning entirely to Catalyst/Redshift
(SURVEY §4); at the 100 TB north star two problems appear that AQE
alone does not always solve — a single hot key in a shuffle aggregate
and a hot key in a shuffle join. Both classic fixes live here:

- **Salted aggregation**: pre-aggregate on (keys, salt) so the hot
  key's rows split across ``n_salt`` reducers, then finish on the real
  keys. Exactly the map-side-combine idea, forced through two explicit
  shuffle stages; associative aggregates only.
- **Salted (replicated) join**: salt the big/skewed side, replicate the
  small side once per salt value, join on (key, salt). Shuffle of the
  big side spreads a hot key across ``n_salt`` partitions at the cost
  of duplicating the small side ``n_salt``× (still tiny).
- **Approximate distinct**: HyperLogLog++ (``approx_count_distinct``)
  as the scale path of the DQDL Uniqueness rule (SURVEY §2.5 A4) —
  exact countDistinct is a full shuffle of the key; HLL is a constant
  ~kilobytes-per-partition sketch merged on the driver.

All helpers are pure DataFrame compositions — no UDFs, fully inside
whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 8


def _hashable(dt) -> bool:
    """xxhash64 rejects MapType anywhere in a column's type tree."""
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _hashable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_hashable(f.dataType) for f in dt.fields)
    return True


def _content_salt(df: DataFrame, n_salt: int) -> Column:
    """Deterministic salt in [0, n_salt): hash of the row's content.
    Survives task re-execution bit-for-bit (pmod keeps the negative
    half of xxhash64's range non-negative).

    Columns xxhash64 can't take (MapType anywhere in the type) are
    hashed through their canonical JSON rendering instead, so any
    schema works; the fast all-column path covers the common case."""
    cols = [
        F.col(f.name) for f in df.schema.fields if _hashable(f.dataType)
    ]
    unhashable = [
        f.name for f in df.schema.fields if not _hashable(f.dataType)
    ]
    if unhashable:
        cols.append(F.to_json(F.struct(*[F.col(c) for c in unhashable])))
    return F.pmod(F.xxhash64(*cols), F.lit(n_salt))


def salted_sum(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    n_salt: int = DEFAULT_SALT,
    out_col: str | None = None,
) -> DataFrame:
    """Two-stage SUM groupBy that survives a hot grouping key.

    Stage 1 groups on (keys..., salt) — the hot key fans out over
    ``n_salt`` reduce partitions; stage 2 groups on keys alone over the
    already-tiny partial results. Result is identical to a plain
    ``groupBy(keys).sum`` (decimal addition is associative).

    The salt is a DETERMINISTIC row-content hash (never a row-position
    or random expression): under partial stage retry — a shuffle-fetch
    failure recomputing a subset of map tasks, the normal failure mode
    of a long 100 TB job — re-executed tasks must reproduce identical
    salts, or rows are double-counted/lost across the two stages
    (SPARK-23207). The trade-off: FULLY identical rows share a salt, so
    a hot key whose rows are byte-for-byte duplicates does not spread;
    real skew (one key, many distinct payloads) does.
    """
    out_col = out_col or f"{value_col}_sum"
    salted = df.withColumn("_salt", _content_salt(df, n_salt))
    partial = salted.groupBy(*keys, "_salt").agg(
        F.sum(F.col(value_col).cast("decimal(18,4)")).alias("_partial")
    )
    return (
        partial.groupBy(*keys)
        .agg(F.sum("_partial").cast("double").alias(out_col))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Inner equi-join with the big side salted and the small side
    replicated ``n_salt``× — the classic skew-join rewrite for when the
    small side is too big to broadcast but a few join keys are hot.

    Big side: salt = hash(whole row's content) % n_salt — deterministic
    under task retry (see ``salted_sum``); uniform as long as the hot
    key's rows differ in at least one column. Small side: exploded over
    all salt values. Join on (key, salt) → each hot-key partition
    carries 1/n_salt of the hot rows.
    """
    big_salted = big.withColumn("_salt", _content_salt(big, n_salt))
    small_rep = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<long>")),
    )
    return big_salted.join(small_rep, [key, "_salt"]).drop("_salt")


def approx_uniqueness(
    df: DataFrame,
    col: str,
    rsd: float = 0.05,
    include_exact: bool = False,
) -> DataFrame:
    """Scale path of DQDL ``Uniqueness``: HLL++ distinct ratio.

    Default (``include_exact=False``) is the PRODUCTION shape — one
    narrow sketch aggregation, no exact-distinct expand/shuffle (the
    whole reason this helper exists at 100 TB); returns (n_rows,
    n_distinct_approx). ``include_exact=True`` is the VALIDATION
    shape: adds the exact count and an ``approx_ok`` check at 3×rsd
    tolerance — use it on samples or test fixtures, never on the
    full-scale table the sketch is meant to spare.
    """
    if not include_exact:
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.approx_count_distinct(col, rsd).cast("bigint").alias(
                "n_distinct_approx"
            ),
        )
    return df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct(col).cast("bigint").alias("n_distinct_exact"),
        F.approx_count_distinct(col, rsd).cast("bigint").alias(
            "n_distinct_approx"
        ),
    ).select(
        "n_rows",
        "n_distinct_exact",
        "n_distinct_approx",
        (
            F.abs(F.col("n_distinct_approx") - F.col("n_distinct_exact"))
            <= F.col("n_distinct_exact") * (3 * rsd)
        ).alias("approx_ok"),
    )
