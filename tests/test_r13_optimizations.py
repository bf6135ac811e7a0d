"""Round-13 optimization pins.

Each test pins an equivalence the r13 optimization round relies on:

1. The gram-dictionary pre-hash (md5 portable minhash family) produces
   BIT-IDENTICAL signatures to the old per-occurrence seed-explode
   form (dedup.dedup_minhash_estimate_accuracy, lsh._portable_banded).
2. The banded (id, band, bucket) rows from the rewritten
   _portable_banded equal the old collect_list/array_sort/array_join
   construction byte-for-byte.
3. The lazy-checkpoint + full-count convergence protocol (one driver
   action per round) leaves connected_components / bfs_distances /
   pagerank results identical to driver-side references.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from sales_agent_graphdb_spark.operators import graph, lsh


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "the quick brown fox vaults over the lazy dog"),
        (4, "entirely different text with no overlap at all"),
        (5, "sales agents process product orders for brands"),
        (6, "sales agents process product orders for brands daily"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _old_minw(toks, n_hashes):
    """The pre-r13 shape: 16-way seed explode -> md5 per (occurrence,
    seed) -> (id, seed) min -> pivot to one wide row."""
    seeded = toks.select(
        "id",
        "g",
        F.explode(F.array(*[F.lit(i) for i in range(n_hashes)])).alias("seed"),
    )
    minh = (
        seeded.select(
            "id", "seed", lsh._portable_hash(F.col("g"), F.col("seed")).alias("h")
        )
        .groupBy("id", "seed")
        .agg(F.min("h").alias("mh"))
    )
    return minh.groupBy("id").agg(
        *[
            F.min(F.when(F.col("seed") == s, F.col("mh"))).alias(f"mh{s}")
            for s in range(n_hashes)
        ]
    )


def _new_minw(toks, n_hashes):
    """The r13 shape: hash once per DISTINCT gram, broadcast-attach,
    one grouped pass of partial mins."""
    gh = toks.select("g").distinct().select(
        "g",
        *[
            lsh._portable_hash(F.col("g"), F.lit(s)).alias(f"h{s}")
            for s in range(n_hashes)
        ],
    )
    return (
        toks.join(F.broadcast(gh), "g")
        .groupBy("id")
        .agg(*[F.min(F.col(f"h{s}")).alias(f"mh{s}") for s in range(n_hashes)])
    )


def test_gram_prehash_signatures_bit_identical(spark, docs):
    toks = lsh.shingle_tokens(docs, "text", "doc_id", 5).distinct()
    old = {r["id"]: tuple(r[f"mh{s}"] for s in range(16)) for r in _old_minw(toks, 16).collect()}
    new = {r["id"]: tuple(r[f"mh{s}"] for s in range(16)) for r in _new_minw(toks, 16).collect()}
    assert old == new
    assert len(old) == 6


def test_portable_banded_matches_old_construction(spark, docs):
    toks = lsh.shingle_tokens(docs, "text", "doc_id", 5).distinct()
    n_hashes, n_bands = 16, 4
    rows_per_band = n_hashes // n_bands
    # Old construction, verbatim from the pre-r13 operator.
    seeded = toks.select(
        "id",
        "g",
        F.explode(F.array(*[F.lit(i) for i in range(n_hashes)])).alias("seed"),
    )
    minh = (
        seeded.select(
            "id", "seed", lsh._portable_hash(F.col("g"), F.col("seed")).alias("h")
        )
        .groupBy("id", "seed")
        .agg(F.min("h").alias("mh"))
    )
    old = (
        minh.withColumn("band", F.expr(f"seed div {rows_per_band}").cast("int"))
        .groupBy("id", "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("seed", "mh"))),
                        lambda s: s["mh"].cast("string"),
                    ),
                    ",",
                )
            ).alias("bucket")
        )
    )
    new = lsh._portable_banded(toks, n_hashes, n_bands)
    old_rows = sorted(tuple(r) for r in old.collect())
    new_rows = sorted(tuple(r) for r in new.collect())
    assert old_rows == new_rows
    assert len(new_rows) == 6 * n_bands


def _union_find_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def test_connected_components_lazy_count_protocol(spark):
    # A path (long diameter — exercises several pointer-doubling
    # rounds), a star, and an isolated self-contained pair.
    edges = [(i, i + 1) for i in range(1, 10)] + [
        (20, 21),
        (20, 22),
        (20, 23),
        (30, 31),
    ]
    nodes = sorted({x for e in edges for x in e})
    e = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["id"]: r["component"] for r in graph.connected_components(e).collect()}
    assert got == _union_find_components(edges, nodes)


def test_bfs_distances_level_list_protocol(spark):
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (2, 6), (6, 7), (8, 9)]
    e = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["id"]: r["distance"] for r in graph.bfs_distances(e, 1, max_depth=10).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 6: 2, 4: 3, 7: 3, 5: 4}


def test_pagerank_single_action_protocol(spark):
    # Reference: dense driver-side power iteration with the operator's
    # exact update rule (damping 0.85, dangling redistribution).
    edges = [(1, 2), (2, 3), (3, 1), (3, 4)]
    e = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["id"]: r["rank"] for r in graph.pagerank(e, n_iter=5).collect()}

    nodes = [1, 2, 3, 4]
    out = {1: [2], 2: [3], 3: [1, 4], 4: []}
    rank = {n: 1.0 for n in nodes}
    n = len(nodes)
    for _ in range(5):
        dangling = sum(rank[v] for v in nodes if not out[v])
        contrib = {v: 0.0 for v in nodes}
        for u in nodes:
            for v in out[u]:
                contrib[v] += rank[u] / len(out[u])
        rank = {
            v: 0.15 + 0.85 * (contrib[v] + dangling / n) for v in nodes
        }
    for v in nodes:
        assert got[v] == pytest.approx(rank[v], abs=1e-12)


def test_full_rcte_statement_engine_coverage(spark):
    """ADVICE r12: the registered sql_api_recursive_reachability now
    pre-materializes the edge CTEs, so the engine's
    non-recursive-CTE-referenced-from-recursive-step path (Spark
    re-evaluates those CTEs per iteration) is no longer exercised by
    any registered query. Keep the original single-statement
    WITH RECURSIVE text running through the engine here, and pin its
    equivalence to the optimized form at sf0.001."""
    from sales_agent_graphdb_spark import catalog
    from sales_agent_graphdb_spark.queries.relational import (
        _SQL_RCTE,
        sql_api_recursive_reachability,
    )

    sf = "/root/testdata/sf0.001"
    catalog.load_table(spark, sf, "lineitem").createOrReplaceTempView(
        "rcte_cov_lineitem"
    )
    full = spark.sql(_SQL_RCTE.format(li="rcte_cov_lineitem"))
    opt = sql_api_recursive_reachability(spark, sf)
    assert sorted(tuple(r) for r in full.collect()) == sorted(
        tuple(r) for r in opt.collect()
    )


def test_reliable_checkpoint_switch(tmp_path):
    """SPARK_GRAFT_RELIABLE_CHECKPOINT routes localCheckpoint through
    reliable checkpointing (VERDICT r12 #6). Needs a fresh JVM (the
    switch installs at session build), so run in a subprocess."""
    import subprocess
    import sys as _sys

    ckdir = str(tmp_path / "ck")
    prog = """
import os, sys
sys.path.insert(0, "/root/repo")
from sales_agent_graphdb_spark.session import get_spark
from sales_agent_graphdb_spark.operators import graph
spark = get_spark(app_name="reliable_ck", shuffle_partitions=4)
e = spark.createDataFrame([(1, 2), (2, 3), (8, 9)], ["src", "dst"])
got = {r["id"]: r["component"] for r in graph.connected_components(e).collect()}
assert got == {1: 1, 2: 1, 3: 1, 8: 8, 9: 8}, got
ck = os.environ["SPARK_GRAFT_RELIABLE_CHECKPOINT"]
walk = [os.path.join(d, f) for d, _, fs in os.walk(ck) for f in fs]
assert walk, "no reliable checkpoint files were written under " + ck
print("RELIABLE_OK", len(walk))
"""
    env = dict(
        **{k: v for k, v in __import__("os").environ.items()},
        SPARK_GRAFT_RELIABLE_CHECKPOINT=ckdir,
        SPARK_GRAFT_CPUS="4",
    )
    r = subprocess.run(
        [_sys.executable, "-c", prog], env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "RELIABLE_OK" in r.stdout


def test_basket_pair_expansion_equals_self_join(spark):
    """r13: the co-purchase edge build (k-core fixpoint, recursive
    reachability) moved from a lineitem self-join + distinct to a
    per-basket HOF expansion. Pin set equality on data with duplicate
    (order, part) rows and singleton baskets."""
    li = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 10), (1, 30), (2, 5), (2, 7), (3, 9),
         (4, 2), (4, 2)],
        ["l_orderkey", "l_partkey"],
    )
    a, b = li.alias("a"), li.alias("b")
    join_pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("lo"), F.col("b.l_partkey").alias("hi"))
        .distinct()
    )
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    hof_pairs = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps)), "
                    "y -> struct(x AS lo, y AS hi))))"
                )
            ).alias("p")
        )
        .select("p.lo", "p.hi")
        .distinct()
    )
    assert sorted(tuple(r) for r in join_pairs.collect()) == sorted(
        tuple(r) for r in hof_pairs.collect()
    ) == [(5, 7), (10, 20), (10, 30), (20, 30)]
