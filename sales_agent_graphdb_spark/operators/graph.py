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
    # Symmetrize via explode(array(fwd, rev)) rather than a self-union:
    # ONE scan of the edge source instead of two (r03 cold A/B: 0.6s vs
    # 0.9s warm at sf0.1, and at 100 TB it halves the edge-scan I/O).
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("a"), F.col(dst).alias("b")),
                    F.struct(F.col(dst).alias("a"), F.col(src).alias("b")),
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .localCheckpoint(eager=True)
    )
    # Init = round 1 for free: with component(b)=b the first propagation
    # join is redundant (min over the augmented neighborhood is just
    # min(own id, neighbor ids)), so seed labels with that groupBy —
    # the same shuffle the plain distinct() init would cost, one fewer
    # join iteration in the loop.
    labels = (
        sym.groupBy(F.col("a").alias("id"))
        .agg(F.min("b").alias("minb"))
        .select("id", F.least(F.col("id"), F.col("minb")).alias("component"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # One round = neighbor-min propagation + pointer-doubling
        # shortcut, FUSED into a single join: the label pointers are
        # appended to the edge list as (v → component(v)) edges, so
        # min(component(b)) over the augmented neighborhood covers
        # both the neighbor minimum AND component(component(v)) — the
        # shortcut that lets labels travel 2^k hops after k rounds
        # (O(log d) convergence, the same move that makes
        # small-star/large-star contraction log-round at 100 TB).
        # Labels are monotone non-increasing and component(x) <= x,
        # so the augmented min is always <= the old component: the
        # update needs no least()/coalesce() against the old label,
        # and every vertex appears via its own pointer edge (no left
        # join needed for isolated vertices). One propagation join +
        # one id-aligned join (for the changed flag) per round,
        # versus three joins in the unfused form. The changed flag is
        # materialized with the labels, so convergence detection is a
        # cheap scan of the checkpointed partitions.
        # r13 (guide §2.4 — remove a join per round): the old round
        # ended with `new.join(labels, "id")` purely to fetch the OLD
        # component for the changed flag — an O(V)⋈O(V) join every
        # round. Instead a tagged SELF edge (a=id, b=id) rides the
        # augmented edge list: after the target join its bcomp IS the
        # old component(id), so one grouped pass yields both the new
        # min and the old value. Adding component(id) to the min-set
        # is a no-op (the pointer edge already contributes
        # component(component(id)) <= component(id), and labels are
        # monotone), so `component` is unchanged — proven by the
        # union-find property test and the driver hash.
        aug = (
            sym.withColumn("self", F.lit(False))
            .unionByName(
                labels.select(
                    F.col("id").alias("a"), F.col("component").alias("b")
                ).withColumn("self", F.lit(False))
            )
            .unionByName(
                labels.select(
                    F.col("id").alias("a"), F.col("id").alias("b")
                ).withColumn("self", F.lit(True))
            )
        )
        target = labels.select(
            F.col("id").alias("bid"), F.col("component").alias("bcomp")
        )
        # r13 (guide §2.4/§5 — one driver action per round, not two):
        # the checkpoint is LAZY and the convergence count is the
        # materializing action. The count's plan is Filter(chg) over
        # the checkpointed RDD, so the job computes and persists EVERY
        # partition of new_labels (no limit/early-exit — a limit could
        # leave partitions unmaterialized for a later consumer to
        # recompute) and returns the changed-row count in the same job
        # the old protocol spent on the eager checkpoint alone. Safe
        # from the lazy-checkpoint race: this count is the first,
        # sequential consumer — blocks are persisted before any other
        # consumer (next round / final return) can touch them.
        new_labels = (
            aug.join(target, F.col("b") == F.col("bid"))
            .groupBy(F.col("a").alias("id"))
            .agg(
                F.min("bcomp").alias("component"),
                F.min(F.when(F.col("self"), F.col("bcomp"))).alias("oldc"),
            )
            .select(
                "id",
                "component",
                (F.col("component") < F.col("oldc")).alias("chg"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.filter("chg").count()
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
    # out_deg is probed twice per iteration (contrib join + dangling
    # anti-join) across n_iter rounds — checkpoint it once, same move
    # as connected_components' sym table.
    out_deg = (
        edges.groupBy(F.col(src).alias("id"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    ranks = verts.withColumn("rank", F.lit(1.0))
    for _ in range(n_iter):
        # r13 (guide §5 — one driver action per iteration, not two):
        # the dangling-mass collect() is the materializing action for
        # the PREVIOUS iteration's lazy checkpoint (it is its first,
        # sequential consumer), so each iteration pays exactly one
        # blocking job instead of eager-checkpoint + collect. contrib
        # consumes the same already-persisted blocks afterwards.
        dangling = (
            ranks.join(out_deg.select("id"), "id", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        contrib = (
            edges.join(ranks, edges[src] == ranks.id)
            .join(out_deg, out_deg.id == ranks.id)
            .select(F.col(dst).alias("id"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("contrib"))
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
            .localCheckpoint(eager=False)
        )
    return ranks


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-vertex triangle counts on an undirected graph. Returns
    (id, n_triangles) for vertices in >= 1 triangle.

    The classic two-join scale shape (node-iterator with canonical
    orientation): canonicalize each undirected edge to (lo, hi) and
    dedup; wedges = edges(a,b) ⋈ edges(b,c) on the middle vertex with
    a < b < c, so every candidate triangle is generated EXACTLY once;
    closing join probes the (a,c) edge. Two equi-join shuffles, no
    wedge double-counting, and the canonical a<b<c orientation is also
    what bounds the wedge fan-out by min-degree at 100 TB (each wedge
    is rooted at its middle vertex; skew-salting applies if a hub
    vertex dominates). Each closed triangle (a,b,c) is then credited
    to all three vertices via one explode."""
    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("lo"),
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    e1 = canon.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    e2 = canon.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    wedges = e1.join(e2, "b").select("a", "b", "c")
    close = canon.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    tris = wedges.join(close, ["a", "c"])
    return (
        tris.select(
            F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias("id")
        )
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def bfs_distances(
    edges: DataFrame,
    source,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 10,
) -> DataFrame:
    """Unweighted shortest-path distances from ``source`` over the
    undirected graph: frontier-expansion BFS as a driver loop of
    DataFrame steps (one join + one anti-join per level, localCheckpoint
    to cut lineage — the connected_components loop pattern). Returns
    (id, distance) for every vertex within ``max_depth`` hops.

    Scale shape: each level shuffles only the CURRENT frontier against
    the edge list (|frontier|·avg-degree), and the visited set grows
    monotonically — the standard iterative BFS on 100 TB graphs, where
    per-level cost tracks the expanding wavefront, not the whole
    graph. Converges early when a frontier empties."""
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("a"), F.col(dst).alias("b")),
                    F.struct(F.col(dst).alias("a"), F.col(src).alias("b")),
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    # r13 (guide §2.4/§5): two fixes from the r12/r13 loop protocol —
    # (1) settled levels accumulate as a LIST of checkpointed frames
    # unioned lazily (no per-level re-checkpoint of the whole growing
    # visited set), and (2) the checkpoint is lazy with the convergence
    # count as its materializing action: one driver job per level
    # instead of three (nxt checkpoint + limit-count + visited
    # re-checkpoint). The count is full (no limit) so every partition
    # of nxt is persisted before any later consumer reads it.
    levels = [
        spark.createDataFrame([(source, 0)], ["id", "distance"]).localCheckpoint(
            eager=True
        )
    ]
    frontier = levels[0].select("id")
    for depth in range(1, max_depth + 1):
        seen = levels[0].select("id")
        for lv in levels[1:]:
            seen = seen.unionByName(lv.select("id"))
        nxt = (
            sym.join(frontier, sym.a == frontier.id)
            .select(F.col("b").alias("id"))
            .distinct()
            .join(seen, "id", "left_anti")
            .withColumn("distance", F.lit(depth))
            .localCheckpoint(eager=False)
        )
        if nxt.count() == 0:
            break
        levels.append(nxt)
        frontier = nxt.select("id")
    visited = levels[0]
    for lv in levels[1:]:
        visited = visited.unionByName(lv)
    return visited
