"""Temporal join operators Spark lacks as built-ins: as-of join and
binned range join, both as pure DataFrame compositions (SURVEY §2.4
notes the reference's join surface is equi-only — these are engine
extensions for event-time analytics).

Scale design:

- **as-of**: candidates come from an EQUI-join on the key columns (one
  hash shuffle, AQE-skew-splittable), the per-left-row "latest right ≤
  left" pick is a window rank over the candidate set. A ``tolerance``
  bound keeps the candidate fan-in finite on dense right sides — at
  100 TB an unbounded backward search degenerates; with tolerance T the
  candidate count per left row is bounded by the right-side event rate
  × T.
- **range join**: a point matches an interval via its time BIN, so the
  join is an equi-join on (keys..., bin) — never a broadcast-nested-
  loop. Intervals spanning b bins are exploded b ways (b = width/bin +
  1, small by construction when ``bin_seconds`` ≈ interval width).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the same keys and
    the greatest ``right_ts`` <= ``left_ts`` (backward; forward =
    smallest >=). Left rows without a match keep NULL right columns.

    ``left_ts``/``right_ts`` and payload column names must not collide
    (alias before calling). Matches pandas ``merge_asof`` semantics.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward: {direction}")
    overlap = (set(left.columns) & set(right.columns)) - set(keys)
    if overlap:
        raise ValueError(f"colliding non-key columns: {sorted(overlap)}")

    lid = "_asof_lid"
    tagged = left.withColumn(lid, F.monotonically_increasing_id())
    cond: Column
    if direction == "backward":
        cond = F.col(right_ts) <= F.col(left_ts)
        order = F.col(right_ts).desc()
    else:
        cond = F.col(right_ts) >= F.col(left_ts)
        order = F.col(right_ts).asc()
    if tolerance_seconds is not None:
        gap = F.abs(
            F.col(left_ts).cast("long") - F.col(right_ts).cast("long")
        )
        cond = cond & (gap <= tolerance_seconds)

    cand = (
        tagged.select(lid, *keys, left_ts)
        .join(right, list(keys))
        .where(cond)
    )
    best = (
        cand.withColumn(
            "_asof_rn",
            F.row_number().over(Window.partitionBy(lid).orderBy(order)),
        )
        .filter(F.col("_asof_rn") == 1)
        .drop("_asof_rn", *keys, left_ts)
    )
    return tagged.join(best, lid, "left").drop(lid)


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_point: str,
    keys: Sequence[str] = (),
    bin_seconds: int = 3600,
) -> DataFrame:
    """Inner join of right points into left half-open intervals
    (``left_lo`` < point <= ``left_hi``), optional extra equi-keys.

    Each point lives in exactly one time bin, each interval is exploded
    over the bins it touches, and the join runs on (keys..., bin) —
    an equi-hash join Catalyst/AQE can plan, instead of the O(n·m)
    nested loop a raw inequality join falls into."""
    lo_bin = F.floor(F.col(left_lo).cast("long") / bin_seconds)
    hi_bin = F.floor(F.col(left_hi).cast("long") / bin_seconds)
    binned_left = left.withColumn(
        "_rj_bin", F.explode(F.sequence(lo_bin, hi_bin))
    )
    binned_right = right.withColumn(
        "_rj_bin",
        F.floor(F.col(right_point).cast("long") / bin_seconds),
    )
    return (
        binned_left.join(binned_right, [*keys, "_rj_bin"])
        .where(
            (F.col(right_point) > F.col(left_lo))
            & (F.col(right_point) <= F.col(left_hi))
        )
        .drop("_rj_bin")
    )
