"""Graph operators over vertex/edge DataFrames (SURVEY.md §1.1, §2.10).

The reference's property graph is (:Product)-[:IN_CATEGORY]->(:Category)
(neo4j_service.py:64-66). GraphFrames-style convention: analytics run
on plain DataFrames — vertices(id), edges(src, dst) — so everything is
joins + aggregations that Catalyst can optimize and AQE can re-plan.

Iterative algorithms (connected components, PageRank) are driver-side
loops over DataFrame steps with localCheckpoint() per iteration to cut
the lineage. Connected components uses min-label propagation with a
pointer-doubling shortcut (component ← label of my component vertex
each round), so labels travel 2^k hops after k rounds and a diameter-d
graph converges in O(log d) rounds — the log-round behavior that makes
the loop viable on 100 TB graphs, where O(diameter) plain propagation
would not be.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Degree per vertex (both directions)."""
    out_deg = edges.groupBy(F.col(src).alias("id")).agg(F.count(F.lit(1)).alias("out_degree"))
    in_deg = edges.groupBy(F.col(dst).alias("id")).agg(F.count(F.lit(1)).alias("in_degree"))
    return (
        out_deg.join(in_deg, "id", "full_outer")
        .select(
            "id",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 20
) -> DataFrame:
    """Min-label propagation: component(v) = min vertex label reachable.
    Returns (id, component). Each iteration is one shuffle (groupBy id);
    the loop stops when no label changes."""
    # Checkpoint the symmetric edge list ONCE — every iteration joins
    # against it, and without the checkpoint each iteration re-scans
    # the source (parquet + projections) from the start of lineage.
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # One round = neighbor-min propagation + pointer-doubling
        # shortcut (component ← label of my component vertex). The
        # shortcut lets labels travel 2^k hops after k rounds, so a
        # diameter-d graph converges in O(log d) rounds instead of
        # O(d) — the same move that makes small-star/large-star
        # contraction log-round at 100 TB. The changed flag is
        # computed in the same pass and materialized with the labels,
        # so convergence detection is a cheap scan of the checkpointed
        # partitions — not a second join job per iteration.
        neigh = (
            sym.join(labels, sym.b == labels.id)
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("component").alias("neigh_min"))
        )
        shortcut = labels.select(
            F.col("id").alias("sid"), F.col("component").alias("scomp")
        )
        new_labels = (
            labels.join(neigh, "id", "left")
            .join(shortcut, F.col("component") == F.col("sid"), "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce("neigh_min", F.col("component")),
                    F.coalesce("scomp", F.col("component")),
                ).alias("new_component"),
                (
                    F.coalesce(F.col("neigh_min") < F.col("component"), F.lit(False))
                    | F.coalesce(F.col("scomp") < F.col("component"), F.lit(False))
                ).alias("chg"),
            )
            .withColumnRenamed("new_component", "component")
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter("chg").limit(1).count()
        labels = new_labels.select("id", "component")
        if changed == 0:
            break
    return labels


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 10,
) -> DataFrame:
    """Fixed-iteration PageRank on the directed edge list. Returns
    (id, rank); Σ rank ≈ N. Dangling mass is redistributed uniformly."""
    verts = (
        edges.select(F.col(src).alias("id"))
        .unionByName(edges.select(F.col(dst).alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = verts.count()
    out_deg = edges.groupBy(F.col(src).alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    ranks = verts.withColumn("rank", F.lit(1.0))
    for _ in range(n_iter):
        contrib = (
            edges.join(ranks, edges[src] == ranks.id)
            .join(out_deg, out_deg.id == ranks.id)
            .select(F.col(dst).alias("id"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("contrib"))
        )
        dangling = (
            ranks.join(out_deg.select("id"), "id", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        ranks = (
            verts.join(contrib, "id", "left")
            .select(
                "id",
                (
                    F.lit(1 - damping)
                    + F.lit(damping)
                    * (F.coalesce("contrib", F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
