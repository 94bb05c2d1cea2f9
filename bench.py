"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "headline_queries_total", "value": N, "unit": "sec",
   "queries": {...}, "sf": ...}

Timing is per-query wall clock around the terminal action
(``collect`` — every headline query returns a small aggregate/top-k
result, so collect cost is the query cost, not a transfer cost).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: the flagship BI views, a scan-heavy filter, a windowed
# top-k, a multi-way join agg, and the scale-path extension operators —
# including the shuffle-heavy dedup/ANN family (minhash-LSH e2e,
# iterative connected components, LSH-probe top-k) so regressions in
# the expensive shapes show up round-over-round, not just the cheap
# single-shuffle queries.
HEADLINE = [
    "sales_per_artist",
    "sales_per_country",
    "filter_pushdown",
    "window_topk",
    "inner_join_agg",
    "date_parts",
    "dedup_exact",
    "dedup_minhash",
    "dedup_components",
    "text_quality",
    "corpus_curation",
    "asof_join_click_view",
    "embedding_topk",
    "ann_lsh_topk",
    "ann_pq_topk",
    "pagerank_sales",
    "events_tumbling",
]


def main() -> None:
    from deftunes_spark.registry import QUERIES
    from deftunes_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Local-mode input-split sizing: the sf0.1 parquet files are ~10 MB,
    # so the cluster default (128 MB → 1 split) would serialize every
    # scan on one of 32 cores. Sizing splits to the file/core ratio is
    # the same task-sizing rule SCALE.md applies at 100 TB.
    spark = get_spark(
        "deftunes-bench",
        extra_conf={"spark.sql.files.maxPartitionBytes": "2MB"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Steady-state timing: run each query once to compile/codegen the
    # plan, then time the second run — the number that characterizes
    # the plan itself rather than first-run JIT latency.
    import gc

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        fn(spark, sf_dir).collect()
        # Release the warm-up run's localCheckpoint blocks (minhash
        # signature table, component/pagerank loop states) BEFORE
        # timing — leftover block-manager pressure from the warm-up
        # (or a prior query) distorts the steady-state number by 2-4×.
        gc.collect()
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)
        gc.collect()

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
