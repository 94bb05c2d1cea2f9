"""Zipf-degree skew stress for the iterative graph operators
(VERDICT r12 #5, carried to r14): measure what a power-law hub
actually costs the pagerank superstep join and the component
propagation join, and whether AQE skew-join splitting holds the
wall — on a SKEWED graph, which the trade-graph corpus is not.

Graph: E edges over N nodes; src sampled with P(rank r) ∝ ~r^-2
(α≈2 Zipf via the inverse-CDF trick r = floor(1/x), x uniform —
node 1 owns ~half of all edges), dst uniform. Both draws are
DETERMINISTIC (xxhash64 of the edge index — guide §2.5: never
partition on rand(); retried tasks must reproduce the row).

Each operator runs under three configs:

- ``aqe_skew_on``: AQE skew-join enabled with thresholds scaled to
  the local data size (the stock 256 MB / 5x-median trigger is sized
  for cluster partitions; at local scale the hub partition is tens of
  MB, so stock thresholds never fire and "on" would silently measure
  the off plan — the scaled thresholds keep trigger-proportionality,
  production keeps the defaults).
- ``aqe_skew_off``: skew splitting disabled — the straggler baseline.
- ``salted``: explicit two-level aggregation/salted join, the manual
  mitigation for the case AQE cannot split (a single giant key).

Usage: python tools/skew_stress.py [--edges E] [--nodes N]
Prints a markdown table for SCALE.md plus one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

E_DEFAULT = 8_000_000
N_DEFAULT = 1_000_000
SKEW_CONF = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Scaled trigger: hub partition here is ~10-100 MB, stock 256 MB
    # never fires at this data size (see module docstring).
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8MB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8MB",
}


def build_edges(spark, n_edges: int, n_nodes: int):
    """Deterministic Zipf(α≈2)-out-degree edge list: (src, dst)."""
    from pyspark.sql import functions as F

    ids = spark.range(0, n_edges, 1, 32)
    # x uniform in (0, 1]: pmod(xxhash64(i), M)+1 / M.
    m = 1_000_000_007
    x = (
        (F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(m)) + 1)
        / F.lit(float(m))
    )
    src = F.least(
        F.lit(n_nodes), F.floor(F.lit(1.0) / x).cast("long")
    )
    dst = F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(n_nodes)) + 1
    return ids.select(src.alias("src"), dst.alias("dst")).filter(
        F.col("src") != F.col("dst")
    )


def _timed(label: str, fn) -> float:
    t0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt:.2f}s", flush=True)
    return round(dt, 2)


def _with_conf(spark, conf: dict, fn):
    old = {}
    for k, v in conf.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        return fn()
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def pagerank_salted(edges, iterations: int = 3, damping: float = 0.85):
    """The manual mitigation arm: identical ranks, but the superstep
    scatter join runs on a SALTED edge key — each hub's edges spread
    over 16 salt buckets, the rank side exploded 16 ways — so no
    single join partition owns a hub (guide §2.5 'salt the key').
    Two-level gather: partial sum by (node, salt) then by node.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from deftunes_spark.ext.lineage import cut_lineage

    n_salt = 16
    e = edges.select(
        F.col("src").alias("s"), F.col("dst").alias("d")
    ).distinct()
    e = cut_lineage(e)
    nodes = cut_lineage(
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("d").alias("node")))
        .distinct()
    )
    n = nodes.count()
    base = (1.0 - damping) / n
    weighted = cut_lineage(
        e.select(
            "s",
            "d",
            (
                F.lit(1.0)
                / F.count(F.lit(1)).over(Window.partitionBy("s"))
            ).alias("w"),
        ).withColumn(
            # Deterministic per-edge salt (guide §2.5: derived from
            # the row, never rand()).
            "salt",
            F.pmod(F.xxhash64("s", "d"), F.lit(n_salt)).cast("int"),
        )
    )
    salts = F.array(*[F.lit(i) for i in range(n_salt)])
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for it in range(iterations):
        r_salted = ranks.select(
            "node", "rank", F.explode(salts).alias("salt")
        )
        contribs = weighted.join(
            r_salted,
            (weighted["s"] == r_salted["node"])
            & (weighted["salt"] == r_salted["salt"]),
        ).select(
            weighted["d"].alias("to"),
            weighted["salt"].alias("gsalt"),
            (r_salted["rank"] * weighted["w"]).alias("w"),
        )
        # Two-level gather: (node, salt) partials, then node.
        part = contribs.groupBy("to", "gsalt").agg(
            F.sum("w").alias("pw")
        )
        gathered = part.groupBy(F.col("to").alias("node")).agg(
            F.sum("pw").alias("in_mass")
        )
        ranks = nodes.join(gathered, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.lit(damping) * F.coalesce("in_mass", F.lit(0.0))
            ).alias("rank"),
        )
    return ranks


def main() -> None:
    from pyspark.sql import functions as F

    from deftunes_spark.ext.dedup import connected_components
    from deftunes_spark.ext.graph import pagerank
    from deftunes_spark.session import get_spark

    n_edges, n_nodes = E_DEFAULT, N_DEFAULT
    for i, a in enumerate(sys.argv):
        if a == "--edges":
            n_edges = int(sys.argv[i + 1])
        if a == "--nodes":
            n_nodes = int(sys.argv[i + 1])

    spark = get_spark("deftunes-skew-stress")
    spark.sparkContext.setLogLevel("ERROR")

    from deftunes_spark.ext.lineage import cut_lineage

    edges = cut_lineage(build_edges(spark, n_edges, n_nodes))
    n_e = edges.count()
    hub = (
        edges.groupBy("src").count().orderBy(F.desc("count")).limit(3)
    ).collect()
    print(
        f"edges={n_e}  top out-degrees: "
        + ", ".join(f"{r['src']}:{r['count']}" for r in hub),
        flush=True,
    )

    out: dict = {
        "edges": n_e,
        "nodes": n_nodes,
        "top_out_degree": int(hub[0]["count"]),
        "load_avg": [round(x, 2) for x in os.getloadavg()],
    }

    def run_pagerank():
        pagerank(edges, iterations=3).write.format("noop").mode(
            "overwrite"
        ).save()

    def run_components():
        connected_components(edges, "src", "dst", max_iter=5).write.format(
            "noop"
        ).mode("overwrite").save()

    def run_pagerank_salted():
        pagerank_salted(edges, iterations=3).write.format("noop").mode(
            "overwrite"
        ).save()

    # Warm (codegen/JIT) once per operator family before timing.
    spark.sparkContext.setJobDescription("skew: warmup")
    _with_conf(spark, SKEW_CONF, run_pagerank)

    spark.sparkContext.setJobDescription("skew: pagerank aqe_skew_on")
    out["pagerank_aqe_skew_on"] = _timed(
        "pagerank aqe_skew_on",
        lambda: _with_conf(spark, SKEW_CONF, run_pagerank),
    )
    spark.sparkContext.setJobDescription("skew: pagerank aqe_skew_off")
    out["pagerank_aqe_skew_off"] = _timed(
        "pagerank aqe_skew_off",
        lambda: _with_conf(
            spark,
            {**SKEW_CONF, "spark.sql.adaptive.skewJoin.enabled": "false"},
            run_pagerank,
        ),
    )
    spark.sparkContext.setJobDescription("skew: pagerank salted")
    _with_conf(spark, SKEW_CONF, run_pagerank_salted)  # warm
    out["pagerank_salted"] = _timed(
        "pagerank salted (skew split also on)",
        lambda: _with_conf(spark, SKEW_CONF, run_pagerank_salted),
    )

    spark.sparkContext.setJobDescription("skew: components warmup")
    _with_conf(spark, SKEW_CONF, run_components)
    spark.sparkContext.setJobDescription("skew: components aqe_skew_on")
    out["components_aqe_skew_on"] = _timed(
        "components aqe_skew_on",
        lambda: _with_conf(spark, SKEW_CONF, run_components),
    )
    spark.sparkContext.setJobDescription("skew: components aqe_skew_off")
    out["components_aqe_skew_off"] = _timed(
        "components aqe_skew_off",
        lambda: _with_conf(
            spark,
            {**SKEW_CONF, "spark.sql.adaptive.skewJoin.enabled": "false"},
            run_components,
        ),
    )
    spark.sparkContext.setJobDescription(None)

    print("\n| operator | config | sec |")
    print("|---|---|---|")
    for k in (
        "pagerank_aqe_skew_on",
        "pagerank_aqe_skew_off",
        "pagerank_salted",
        "components_aqe_skew_on",
        "components_aqe_skew_off",
    ):
        print(f"| {k.rsplit('_', 2)[0]} | {k} | {out[k]} |")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
