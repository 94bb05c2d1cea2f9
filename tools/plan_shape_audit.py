"""Plan-shape audit: node/scan/exchange/join-strategy counts for the
headline queries — a mechanical screen for repeated-subtree compilation
(the graph_triangles r13 finding: one operator, 24 scan references).

Usage: python tools/plan_shape_audit.py [sf_dir]
Prints one line per headline query:
  name  nodes  scans  exchanges  smj  bhj  generate  python
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import bench
    from deftunes_spark.registry import QUERIES
    from deftunes_spark.session import get_spark

    spark = get_spark("plan-shape-audit")
    spark.sparkContext.setLogLevel("ERROR")
    mode = (
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    print(
        "%-28s %6s %6s %5s %4s %4s %4s %7s"
        % ("query", "nodes", "scans", "exch", "smj", "bhj", "gen", "python")
    )
    for name in bench.HEADLINE:
        try:
            df = QUERIES[name](spark, sf_dir)
            fmt = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001 - audit keeps going
            print("%-28s ERROR %s" % (name, str(exc)[:60]))
            continue
        n_nodes = len(re.findall(r"^\(\d+\)", fmt, re.M))
        counts = {
            k: len(re.findall(p, fmt))
            for k, p in {
                "scans": r"Scan parquet|Scan ExistingRDD|Scan orc",
                # Formatted-mode node headers "(n) Exchange" count
                # every Exchange including a root-level one (r13
                # advice: "^Exchange" without re.M never matched).
                "exch": r"\(\d+\) Exchange",
                "smj": r"SortMergeJoin",
                "bhj": r"BroadcastHashJoin",
                "gen": r"Generate",
                "python": r"BatchEvalPython|ArrowEvalPython|MapInPandas"
                r"|MapInArrow|FlatMapGroupsInPandas",
            }.items()
        }
        print(
            "%-28s %6d %6d %5d %4d %4d %4d %7d"
            % (
                name,
                n_nodes,
                counts["scans"],
                counts["exch"],
                counts["smj"],
                counts["bhj"],
                counts["gen"],
                counts["python"],
            )
        )


if __name__ == "__main__":
    main()
