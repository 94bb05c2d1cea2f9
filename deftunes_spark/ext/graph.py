"""Iterative graph analytics as DataFrame programs.

The reference has no graph operators (SURVEY §2 — its join surface is
equi-only); this module is an engine extension in the same family as
``dedup.connected_components``: algorithms whose unit of work is a
join + aggregation per superstep, expressed so each round is ONE
shuffle and the lineage is cut between rounds.

PageRank at 100 TB: each iteration is an equi-join of the (src-
partitioned) edge list with the (node-partitioned) rank table plus one
groupBy — both shuffles hash on the node id, so a pre-partitioned /
bucketed edge table makes the join co-located and only the
aggregation shuffles. Skewed high-degree nodes (the web-graph hub
problem) are exactly what AQE skew-split and `ext.scale.salted_sum`
exist for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deftunes_spark.ext.lineage import cut_lineage


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    undirected: bool = False,
    checkpoint_every: int = 4,
    reliable: bool = False,
) -> DataFrame:
    """PageRank with a FIXED iteration count (deterministic output —
    mirrorable by unrolled CTEs in the SQL oracle, unlike
    run-to-convergence which couples termination to float noise).

    rank₀(v) = 1/N;
    rankₜ₊₁(v) = (1−d)/N + d·Σ_{u→v} rankₜ(u)/outdeg(u).

    Nodes are the union of edge endpoints (an isolated node has no
    effect on anyone else's rank and keeps (1−d)/N + its own dangling
    handling — callers wanting them included can union extra
    single-node "self" rows). Dangling mass is NOT redistributed
    (matches the common simplified formulation; with ``undirected=True``
    every node has outdegree ≥ 1 so the question is moot).

    Each superstep: one join (contributions) + one groupBy (gather).
    Lineage is cut every ``checkpoint_every`` rounds — not every round:
    an eager materialization is a whole extra job, and a plan a few
    supersteps deep is exactly what Catalyst handles well. Long runs
    still never stack unbounded lineage.

    ``reliable=True`` switches every lineage cut from executor-local
    blocks to the configured checkpoint directory — the cluster path,
    where an executor loss mid-iteration must not kill the job (see
    ``ext.lineage``).
    """
    e = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).distinct()
    if undirected:
        e = (
            e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
            .distinct()
        )
    e = cut_lineage(e, reliable)

    nodes = cut_lineage(
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("d").alias("node")))
        .distinct(),
        reliable,
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    base = (1.0 - damping) / n

    # Edge weight 1/outdeg(src) is static across supersteps — fold it
    # into the edge list ONCE so each round is a single join + gather
    # instead of re-joining the degree table every time.
    outdeg = e.groupBy(F.col("s").alias("node")).agg(
        F.count("*").alias("outdeg")
    )
    weighted = cut_lineage(
        e.join(outdeg, e["s"] == outdeg["node"])
        .select("s", "d", (F.lit(1.0) / F.col("outdeg")).alias("w")),
        reliable,
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))

    for it in range(iterations):
        contribs = weighted.join(ranks, weighted["s"] == ranks["node"]).select(
            weighted["d"].alias("to"),
            (ranks["rank"] * weighted["w"]).alias("w"),
        )
        gathered = contribs.groupBy(F.col("to").alias("node")).agg(
            F.sum("w").alias("in_mass")
        )
        ranks = nodes.join(gathered, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.lit(damping) * F.coalesce("in_mass", F.lit(0.0))
            ).alias("rank"),
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < iterations:
            ranks = cut_lineage(ranks, reliable)
    return ranks
