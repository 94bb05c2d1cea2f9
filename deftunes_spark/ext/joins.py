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
    (alias before calling). Matches pandas ``merge_asof`` semantics,
    with one deliberate divergence on TIED boundary timestamps:
    several right rows sharing the best ``right_ts`` resolve to the
    max (backward) / min (forward) payload — a deterministic,
    partition-order-independent pick — where pandas returns whichever
    row came last in input order (an order Spark does not have).

    Plan shape (two shuffle rounds, down from three): one LEFT
    equi-join on the keys with the as-of condition in the ON clause
    (unmatched left rows keep a single null-extended candidate), then
    one ``groupBy`` per left row picking the best candidate with
    ``max_by``/``min_by`` over (ts, payload) — deterministic under
    ties. The old window+rejoin referenced the id-tagged left frame in
    TWO plan branches, so ``monotonically_increasing_id`` could
    diverge between them after an upstream shuffle (silent mis-joins
    under stage retry); here the tagged frame feeds exactly one linear
    plan, where the id only needs uniqueness, never cross-branch
    agreement. The left payload rides through both shuffles — the
    price of dropping the third shuffle and the second plan branch.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward: {direction}")
    overlap = (set(left.columns) & set(right.columns)) - set(keys)
    if overlap:
        raise ValueError(f"colliding non-key columns: {sorted(overlap)}")

    lid = "_asof_lid"
    left_cols = left.columns
    right_payload = [c for c in right.columns if c not in keys]
    l = left.withColumn(lid, F.monotonically_increasing_id()).alias("l")
    r = right.alias("r")

    lt = F.col(f"l.{left_ts}")
    rt = F.col(f"r.{right_ts}")
    cond: Column = rt <= lt if direction == "backward" else rt >= lt
    if tolerance_seconds is not None:
        gap = F.abs(lt.cast("long") - rt.cast("long"))
        cond = cond & (gap <= tolerance_seconds)
    for k in keys:
        cond = (F.col(f"l.{k}") == F.col(f"r.{k}")) & cond

    payload_struct = F.struct(
        *[F.col(f"r.{c}").alias(c) for c in right_payload]
    )
    # Total order (ts first, then payload) makes the pick deterministic
    # when several right rows share the boundary timestamp.
    pick_order = F.struct(
        rt.alias("_ts"),
        *[F.col(f"r.{c}").alias(c) for c in right_payload],
    )
    best = (
        F.max_by(payload_struct, pick_order)
        if direction == "backward"
        else F.min_by(payload_struct, pick_order)
    )
    agg = (
        l.join(r, cond, "left")
        .groupBy(F.col(f"l.{lid}"))
        .agg(
            *[F.first(F.col(f"l.{c}")).alias(c) for c in left_cols],
            best.alias("_best"),
        )
    )
    return agg.select(
        *left_cols,
        *[F.col(f"_best.{c}").alias(c) for c in right_payload],
    )


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
