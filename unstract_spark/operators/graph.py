"""Iterative graph algorithms beyond connected components.

PageRank here is FIXED-POINT INTEGER PageRank: probabilities are
micro-units (scale 1e12) on BIGINT, contributions are floor divisions,
and the damping step is (7*s) div 8 with teleport 1e12 div (8N) — the
damping factor is exactly 7/8 so every operation stays in integer
arithmetic and the result is bit-identical on any engine and any
partial-aggregation order (float PageRank cannot be hash-gated: the
per-node sum order leaks into low bits).  Reference point: the same
fixed-point trick production systems use for deterministic replays.

Scale shape: each iteration is one (edge join on src) + one groupBy dst
+ one left join back to the node table — all shuffles on node keys,
lineage truncated per round with localCheckpoint exactly like
dedup.connected_components.  State is one BIGINT per node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # 1e12 micro-probability units


def pagerank_fixed(
    edges: DataFrame,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    undirected: bool = True,
) -> DataFrame:
    """(node, pr_fixed) after `iters` rounds of integer PageRank with
    damping exactly 7/8.  Nodes are whatever `src`/`dst` hold; for
    undirected graphs each edge contributes both directions.  Every
    node present in the edge list has deg >= 1, so there are no
    dangling-mass corrections.  int64 bounds: total mass is ~1e12, a
    node's incoming sum is < 1e12 * indeg... well under 2^63 until
    indeg ~ 9e6 at this scale; use DECIMAL(38,0) sums beyond that.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if undirected:
        e = e.unionByName(
            edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
        )
    e = e.distinct().localCheckpoint(eager=True)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = deg.select(F.col("src").alias("node"), "deg")
    n = nodes.agg(F.count(F.lit(1)).alias("n"))
    p = (
        nodes.crossJoin(F.broadcast(n))
        .select("node", F.expr(f"CAST({SCALE} div n AS BIGINT)").alias("p"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max(iters, 0)):
        contrib = (
            e.join(p.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select("dst", F.expr("p div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        p = (
            nodes.crossJoin(F.broadcast(n))
            .join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                F.expr(
                    f"CAST({SCALE} div (8 * n) + (7 * coalesce(s, 0)) div 8"
                    " AS BIGINT)"
                ).alias("p"),
            )
            .localCheckpoint(eager=True)
        )
    return p.select("node", F.col("p").alias("pr_fixed"))


def label_propagation(
    edges: DataFrame,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    undirected: bool = True,
) -> DataFrame:
    """(node, community) after `iters` rounds of MIN-label propagation:
    every node starts labeled with itself, and each round takes the
    minimum of its own label and its neighbors' labels.

    Deterministic by construction (min over an id domain — no float
    arithmetic, no tie randomness), which is what makes it hash-gatable
    where classic frequency-based LPA is not (its ties are broken by
    arrival order). After k rounds a node carries the smallest id
    within distance k; run to convergence it equals connected
    components — the bounded-round form is the cheap community prior a
    crawl/dedup pipeline wants (seed expansion, spam-cluster flags)
    without the full CC loop.

    Scale shape mirrors pagerank_fixed: per round one edge join on src
    + one groupBy dst + one left join back — all shuffles on node keys,
    lineage truncated per round; state is one label per node.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if undirected:
        e = e.unionByName(
            edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
        )
    e = e.distinct().localCheckpoint(eager=True)
    # node set from BOTH endpoints: with undirected=False a pure sink
    # (dst-only) node must still carry a community row
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    lab = nodes.select("node", F.col("node").alias("label")).localCheckpoint(
        eager=True
    )
    for _ in range(max(iters, 0)):
        nb = (
            e.join(lab.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.min("label").alias("_nl"))
            .withColumnRenamed("dst", "node")
        )
        lab = (
            lab.join(nb, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("_nl"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
    return lab.select("node", F.col("label").alias("community"))
