"""Graph algorithms as DataFrame iterations (Pregel-style, no RDDs).

Connected components live in `llm.dedup` (min-label propagation and
large-star/small-star).  Here: PageRank by unrolled power iteration.

Scale notes: each iteration is one shuffle-join of the rank vector against
the edge list keyed on src plus one groupBy on dst — the same shape GraphX
uses.  The rank vector is |V| rows (thin); the edge list dominates and is
scan-partitioned.  For long iteration counts, localCheckpoint every few
rounds truncates lineage (same trap as connected components); for the
typical 3-20 iterations the unrolled plan is fine and lets Catalyst
pipeline scans.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def pagerank(edges: DataFrame, iterations: int = 3, damping: float = 0.85,
             src: str = "src", dst: str = "dst",
             weight: str | None = None,
             checkpoint_every: int = 8) -> DataFrame:
    """Weighted PageRank over a directed edge list.

    rank_0(v)   = 1/N
    rank_i+1(v) = (1-d)/N + d * sum_u rank_i(u) * w(u,v)/out(u)

    Dangling nodes (no out-edges) leak their mass — acceptable for the
    transition-graph use cases here; add a dangling-mass term if exactness
    of the distribution sum matters.  Returns (node, rank) rounded to 6.
    """
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                     w.alias("w"))
    out = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    # transition probability per edge; broadcast-sized for label graphs,
    # co-partitioned shuffle join for billion-edge graphs
    trans = (e.join(out, "src")
             .select("src", "dst", (F.col("w") / F.col("out_w")).alias("p")))

    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node"))).distinct())
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("n_total"))
    ranks = (nodes.crossJoin(F.broadcast(n_nodes))
             .select("node", (F.lit(1.0) / F.col("n_total")).alias("rank"),
                     "n_total"))

    for i in range(iterations):
        contrib = (trans.join(ranks, trans.src == ranks.node)
                   .groupBy(F.col("dst").alias("node"))
                   .agg(F.sum(F.col("rank") * F.col("p")).alias("in_mass")))
        ranks = (ranks.select("node", "n_total")
                 .join(contrib, "node", "left")
                 .select(
                     "node",
                     ((1.0 - damping) / F.col("n_total")
                      + damping * F.coalesce("in_mass", F.lit(0.0))).alias("rank"),
                     "n_total"))
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)

    return ranks.select("node", F.round("rank", 6).alias("rank"))
