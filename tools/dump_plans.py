"""Regenerate PLANS.md: formatted physical plans of the headline
queries at sf0.01 — direct evidence of pushdown/broadcast/codegen.

Usage: python tools/dump_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHOW = [
    "sales_per_artist",
    "filter_pushdown",
    "window_topk",
    "order_limit",
    "rollup_agg",
    "asof_join_click_view",
    "dedup_exact",
    "dedup_minhash_fast",
    "dedup_minhash_mapside_md5",
    "corpus_curation",
    "ann_ivfpq_topk",
    "training_shuffle",
    "gopher_rules",
    "text_char_entropy",
    "trailing_7d_sales",
    # segment_dedup is deliberately absent: at sf0.01 its hot set fits
    # the literal-array shape, whose plan dump is one enormous literal
    # — both physical shapes are plan-asserted in tests/test_plans.py
    # (zero payload Exchange) instead.
]


def main() -> None:
    from deftunes_spark.registry import QUERIES
    from deftunes_spark.session import get_spark

    spark = get_spark("plandump")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    out = [
        "# PLANS — formatted physical plans of the headline queries",
        "",
        "Regenerate with `python tools/dump_plans.py` (sf0.01 inputs).",
        "What to look for: `PushedFilters` + pruned `ReadSchema` at every",
        "parquet scan, `BroadcastHashJoin` on dim joins, paired partial/",
        "final `HashAggregate`, `TakeOrderedAndProject` for top-k, a",
        "single `Exchange` per shuffle key.",
        "",
    ]
    for name in SHOW:
        df = QUERIES[name](spark, "/root/testdata/sf0.01")
        fmt = df._jdf.queryExecution().explainString(mode)
        out += [f"## {name}", "", "```", fmt.rstrip(), "```", ""]
    with open(
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "PLANS.md"),
        "w",
    ) as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(SHOW)} plans)")


if __name__ == "__main__":
    main()
