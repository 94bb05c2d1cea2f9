"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real registry lives in ``deftunes_spark.driver_queries``; this
module stays a thin adapter.
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))


def _last_covered_round() -> dict[str, int]:
    """Map query name -> most recent round whose CORRECTNESS artifact
    includes it (never covered -> absent).

    The driver samples the FIRST 50 entries of ``queries()``; the
    registry has ~190. Ordering least-recently-covered first rotates the
    artifact's hard signal across the whole registry over rounds, so
    every query eventually lands in a CORRECTNESS_r{N}.json instead of
    the same 50 being re-verified forever.
    """
    covered: dict[str, int] = {}
    for path in glob.glob(os.path.join(_REPO_DIR, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                entries = json.load(f)
        except (OSError, ValueError):
            continue
        for name, rec in entries.items():
            # A genuinely errored row is NOT coverage (r9: bpe_encode
            # shipped an ERR artifact and would otherwise rotate out
            # of the very next sample instead of being re-checked
            # first). The driver records a successful rows-only check
            # as err == "no_oracle" — that one IS coverage.
            err = rec.get("err") if isinstance(rec, dict) else None
            if err and err != "no_oracle":
                continue
            covered[name] = max(covered.get(name, -1), rnd)
    return covered


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship mirrors bi_views/sales_per_artist_vw.sql: fact LEFT
    JOIN broadcast dim → per-(year, artist) decimal-exact sales sum.
    """
    from deftunes_spark.registry import QUERIES

    return QUERIES["sales_per_artist"](spark, "/root/testdata/sf0.001")


# Rows-only query -> its value-hash oracle twin. The pair sorts by the
# MINIMUM of the two coverage tiers, so when the rotation pulls one
# toward the driver's 50-query sample the other travels with it and
# the artifact shows the twin green next to the rows-only row. (The
# pair can still straddle the fixed sample boundary — positions 50/51
# — at most one round before coverage re-ties them, so the guarantee
# is per-rotation, not per-round.)
_ORACLE_TWINS = {
    "dedup_minhash_fast": "dedup_minhash",
    "dedup_incremental_fast": "dedup_incremental",
    "bpe_merges": "bpe_pair_counts",
    "unigram_vocab": "unigram_seed_counts",
    "semantic_dedup_auto": "semantic_dedup",
    # r11: the KMV md5 variant replays the FULL sketch/estimator
    # algebra under a value-hash oracle — the closest twin.
    "source_overlap_minhash": "source_overlap_kmv_md5",
    "sequence_pack_bestfit": "sequence_pack",
    "bpe_encode": "bpe_encode_roundtrip",
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered least-recently-artifact-covered first (stable on registry
    order within a tier) so the driver's 50-query sample rotates across
    the full registry round over round. Rows-only queries and their
    oracle twins share a tier (see ``_ORACLE_TWINS``).
    """
    from deftunes_spark.registry import QUERIES

    covered = _last_covered_round()
    # Never-covered queries (new registrations, or err-demoted rows)
    # slot just AFTER the stalest covered tier, not before it: they
    # deserve prompt coverage, but a batch of new queries must never
    # crowd the oldest-artifact queries out of the driver's fixed
    # 50-query sample — the rotation's no-artifact-older-than-N
    # guarantee is about THOSE, and a new query missing one round is
    # harmless (it is green in the repo's own sweep and enters the
    # artifact next round).
    fallback: float = (
        min(covered.values()) + 0.5 if covered else -1.0
    )

    def tier(n: str) -> float:
        t: float = covered.get(n, fallback)
        for a, b in _ORACLE_TWINS.items():
            if n in (a, b):
                t = min(
                    t,
                    covered.get(a, fallback),
                    covered.get(b, fallback),
                )
        return t

    names = sorted(QUERIES, key=tier)

    # Guarantee prompt coverage: the after-the-stalest-tier rule can
    # push never-covered queries just past the sample boundary when
    # the stalest tier alone fills it (r10: exactly 50 r7-tier queries
    # left ngram_novelty/unigram_decode/unigram_kl_divergence at
    # positions 50-52). Reserve a bounded block INSIDE the first
    # _SAMPLE slots for up to _NEW_CAP never-covered queries — bounded
    # so a big new batch still can't crowd out the stale tier, and the
    # displaced covered queries become next round's stalest.
    _SAMPLE, _NEW_CAP = 50, 12
    never = [n for n in names if n not in covered][:_NEW_CAP]
    if never and any(names.index(n) >= _SAMPLE for n in never):
        rest = [n for n in names if n not in never]
        cut = max(0, _SAMPLE - len(never))
        names = rest[:cut] + never + rest[cut:]
    return {n: QUERIES[n] for n in names}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted → rows-only check)."""
    from deftunes_spark.registry import ORACLES

    return dict(ORACLES)
