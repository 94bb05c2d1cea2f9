"""Dump queries' .explain('formatted') plans to files.

Usage: python tools/dump_plan_one.py <outdir> <suffix> <query> [<query> ...]

Writes <outdir>/<query>_<suffix>.txt for each query. Used by the
optimization rounds to commit before/after plan evidence
(plans/r{N}/<query>_{before,after}.txt) next to the code change.
Defaults to sf0.01 inputs via $SPARK_GRAFT_SF_DIR — plan SHAPE
(Exchange count, join strategy, PushedFilters, codegen spans) is
scale-independent for these queries. AQE leaves the initial plan
marked isFinalPlan=false; the shape claims we cite are about the
static plan, same as tools/dump_plans.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    from deftunes_spark.registry import QUERIES
    from deftunes_spark.session import get_spark

    spark = get_spark("plandump-one")
    spark.sparkContext.setLogLevel("ERROR")
    mode = (
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        fmt = df._jdf.queryExecution().explainString(mode)
        out_path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(out_path, "w") as f:
            f.write(fmt.rstrip() + "\n")
        print(out_path)


if __name__ == "__main__":
    main()
