"""Dump the pagerank_sales SETUP-stage plans (VERDICT r13 #7).

The r13 pagerank optimization (commit d7c9f79) changed the weighted-
edge BUILD — node universe from source endpoints only on undirected
graphs, and 1/outdeg as a count window instead of a groupBy + two-
sided re-join — but the committed plan pair only showed the superstep
plan because `cut_lineage` hides the setup stage behind the
checkpoint. This tool reconstructs both formulations of the setup
stage over the real pagerank_sales edge derivation and dumps their
PRE-checkpoint `.explain("formatted")`, so the claimed plan diff
(groupBy + join → single window exchange) is committed evidence.

Usage: python tools/dump_pagerank_setup.py <outdir>
Writes <outdir>/pagerank_sales_setup_before.txt (r13-pre
reconstruction, from commit d7c9f79^) and ..._setup_after.txt
(current code shape).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "plans/r14"
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from deftunes_spark.session import get_spark

    spark = get_spark("pagerank-setup-dump")
    spark.sparkContext.setLogLevel("ERROR")
    mode = (
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    # Shared prefix (unchanged across r13): canonical + symmetrized
    # edge list. NOT checkpointed here — the whole point is to show
    # the setup stage the checkpoint normally hides.
    e = edges.select(
        F.col("src").alias("s"), F.col("dst").alias("d")
    ).distinct()
    e = e.union(
        e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    ).distinct()

    # BEFORE (r13-pre, reconstructed verbatim from d7c9f79^):
    # outdeg = groupBy + count, weighted = edge ⋈ outdeg re-join.
    outdeg = e.groupBy(F.col("s").alias("node")).agg(
        F.count("*").alias("outdeg")
    )
    before = e.join(outdeg, e["s"] == outdeg["node"]).select(
        "s", "d", (F.lit(1.0) / F.col("outdeg")).alias("w")
    )

    # AFTER (current ext/graph.py shape): 1/outdeg as a count window
    # over the same key — one exchange of the edge list, no join.
    after = e.select(
        "s",
        "d",
        (
            F.lit(1.0) / F.count(F.lit(1)).over(Window.partitionBy("s"))
        ).alias("w"),
    )

    os.makedirs(outdir, exist_ok=True)
    for name, df in (
        ("pagerank_sales_setup_before", before),
        ("pagerank_sales_setup_after", after),
    ):
        fmt = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(outdir, f"{name}.txt")
        with open(path, "w") as f:
            f.write(fmt.rstrip() + "\n")
        print(path)


if __name__ == "__main__":
    main()
