"""Round-12 operator properties: shortest-path counting BFS +
pair-splitting betweenness on crafted graphs, the skyline anti-chain
adversarial bound, parquet bloom-filter bytes + pushdown, seasonal
profile variance vs numpy, Theil-Sen outlier robustness, Spearman on
a perfectly monotone corpus, and TTR bounds."""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from sales_agent_graphdb_spark.registry import all_queries

SF = "/root/testdata/sf0.01"
SF_SMALL = "/root/testdata/sf0.001"
QS = all_queries()


# ---------------------------------------------------------------------------
# _bfs_sigma: shortest-path counts
# ---------------------------------------------------------------------------


def _edges(spark, pairs):
    bidir = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(
        sorted(set(bidir)), "src string, dst string"
    ).localCheckpoint(eager=True)


def test_bfs_sigma_counts_on_cycle(spark):
    """4-cycle a-b-c-d-a: opposite corners are at distance 2 with TWO
    shortest paths; adjacent at distance 1 with one."""
    from sales_agent_graphdb_spark.queries.graphq import _bfs_sigma

    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    got = {(r.src, r.dst): (r.d, r.sg) for r in _bfs_sigma(e).collect()}
    assert got[("a", "b")] == (1, 1) and got[("a", "d")] == (1, 1)
    assert got[("a", "c")] == (2, 2) and got[("b", "d")] == (2, 2)
    assert len(got) == 12  # all ordered pairs of the cycle reachable


def test_bfs_sigma_matches_bruteforce_random(spark):
    """Random 12-vertex graph: sigma from the level DP equals an
    explicit all-simple-shortest-path enumeration."""
    from itertools import permutations

    from sales_agent_graphdb_spark.queries.graphq import _bfs_sigma

    rng = np.random.default_rng(12)
    verts = [f"v{i}" for i in range(12)]
    pairs = [
        (a, b)
        for i, a in enumerate(verts)
        for b in verts[i + 1 :]
        if rng.random() < 0.25
    ]
    adj: dict[str, set[str]] = {v: set() for v in verts}
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)

    # brute force: BFS distances + DP path counts per source
    import collections

    expect = {}
    for s in verts:
        dist = {s: 0}
        sig = {s: 1}
        q = collections.deque([s])
        while q:
            u = q.popleft()
            for w in sorted(adj[u]):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    sig[w] = 0
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sig[w] += sig[u]
        for t, d in dist.items():
            if t != s and d <= 8:
                expect[(s, t)] = (d, sig[t])

    got = {
        (r.src, r.dst): (r.d, r.sg)
        for r in _bfs_sigma(_edges(spark, pairs)).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# Pair-splitting betweenness on hand-computable graphs
# ---------------------------------------------------------------------------


def test_betweenness_path_and_star(spark):
    from sales_agent_graphdb_spark.queries.graphq import (
        _pair_split_centrality,
    )

    # Path a-b-c: only b is interior; ordered pairs (a,c),(c,a).
    got = {
        r.brand: (r.stress, r.betweenness_micro)
        for r in _pair_split_centrality(
            _edges(spark, [("a", "b"), ("b", "c")])
        ).collect()
    }
    assert got == {
        "b": (2, 2_000_000),
        "a": (0, 0),
        "c": (0, 0),
    }

    # Star K1,3 centered at x: 3*2 ordered leaf pairs through x.
    got = {
        r.brand: (r.stress, r.betweenness_micro)
        for r in _pair_split_centrality(
            _edges(spark, [("x", "l1"), ("x", "l2"), ("x", "l3")])
        ).collect()
    }
    assert got["x"] == (6, 6_000_000)
    assert all(got[f"l{i}"] == (0, 0) for i in (1, 2, 3))


def test_betweenness_splits_credit_on_tied_paths(spark):
    """4-cycle: each vertex is the midpoint of exactly ONE opposite
    pair (both directions), whose sigma_st = 2 splits credit: stress
    = 1*1 per direction = 2, betweenness = 2 * (1e6*1)//2 = 1e6."""
    from sales_agent_graphdb_spark.queries.graphq import (
        _pair_split_centrality,
    )

    got = {
        r.brand: (r.stress, r.betweenness_micro)
        for r in _pair_split_centrality(
            _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
        ).collect()
    }
    assert got == {v: (2, 1_000_000) for v in "abcd"}


def test_betweenness_backbone_not_degenerate(spark):
    """The registered query must produce at least one strictly
    positive interior vertex at the driver SF (the COMPLETE raw
    projection would zero every stress — the reason the backbone is
    the measurement frame)."""
    rows = QS["graph_betweenness_backbone"].fn(spark, SF).collect()
    assert len(rows) >= 10
    assert any(r.stress > 0 for r in rows)
    assert all(r.betweenness_micro >= 0 for r in rows)


# ---------------------------------------------------------------------------
# Skyline adversarial anti-chain (VERDICT r11 #5)
# ---------------------------------------------------------------------------


def test_skyline_antichain_all_survive(spark):
    """All-on-front adversarial input: n pairwise-incomparable points
    (x=i, y=n-i). Nothing is dominated, so BOTH phases must keep all
    n rows — phase 2's input equals the survivors <= sum-of-local-
    fronts bound with equality."""
    from sales_agent_graphdb_spark.queries.curation import skyline_2d

    n = 500
    df = spark.createDataFrame(
        [(i, i, n - i) for i in range(n)], "id long, d1 long, d2 long"
    )
    got = sorted(r.id for r in skyline_2d(df, "d1", "d2", "id").collect())
    assert got == list(range(n))


# ---------------------------------------------------------------------------
# Parquet bloom probe: bytes on disk + pushed filter
# ---------------------------------------------------------------------------


def test_bloom_layout_has_bloom_bytes(spark, tmp_path):
    """The exact writer options the registered layout uses must grow
    the files vs a bloom-less twin of the same data — the on-disk
    proof the parquet-mr option plumbing works (the per-column
    enabled#col form measurably does NOT in this build)."""
    li = (
        spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
        .select("l_orderkey", "l_extendedprice")
        .repartition(2, F.col("l_orderkey"))
    )
    plain, bloom = str(tmp_path / "plain"), str(tmp_path / "bloom")
    li.write.mode("overwrite").parquet(plain)
    (
        li.write.mode("overwrite")
        .option("parquet.bloom.filter.enabled", "true")
        .option("parquet.bloom.filter.expected.ndv", "100000")
        .parquet(bloom)
    )

    def sz(d):
        return sum(os.path.getsize(p) for p in glob.glob(f"{d}/*.parquet"))

    assert sz(bloom) > sz(plain) + 10_000, (sz(bloom), sz(plain))


def test_bloom_probe_filter_pushed(spark):
    """The registered query's IN lookup must reach the parquet scan
    as a pushed filter (the row-group skip entry point)."""
    df = QS["s19_parquet_bloom_probe"].fn(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(l_orderkey" in plan, plan


# ---------------------------------------------------------------------------
# Seasonal profile: cell mean/variance vs numpy
# ---------------------------------------------------------------------------


def test_seasonal_profile_matches_numpy(spark):
    rows = QS["ts_seasonal_profile"].fn(spark, SF_SMALL).collect()
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ts = pd.to_datetime(ev["ts"])
    # pandas dayofweek: Monday=0; the query uses Sunday=0.
    how = ((ts.dt.dayofweek + 1) % 7) * 24 + ts.dt.hour
    ev = ev.assign(how=how)
    by = {(t, h): g["value"].to_numpy() for (t, h), g in ev.groupby(["event_type", "how"])}
    checked = 0
    for r in rows:
        vals = by[(r.event_type, r.how)]
        assert r.n_events == len(vals)
        assert abs(r.mean_value - float(np.mean(vals))) < 1e-5
        assert abs(r.var_value - float(np.var(vals))) < 1e-4
        checked += 1
        if r.n_events > 1:
            assert r.var_value >= 0.0
    assert checked == len(rows) and checked > 100


# ---------------------------------------------------------------------------
# Theil-Sen: outlier robustness on a crafted series
# ---------------------------------------------------------------------------


def _write_events(tmp_path, rows):
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df["ts"] = pd.to_datetime(df["ts"])
    d = str(tmp_path / "sf_ts")
    os.makedirs(d, exist_ok=True)
    df.to_parquet(f"{d}/events.parquet")
    return d


def test_theil_sen_ignores_single_outlier(spark, tmp_path):
    """Eleven days with a clean +1.00/day trend and ONE 100x outlier
    day: the pairwise-slope median stays 1.0 (OLS would not)."""
    rows = []
    for day in range(1, 12):
        v = 1000.0 if day == 6 else float(day)
        rows.append(
            (day, f"2024-02-{day:02d} 10:00:00", 1, "click", v, "{}")
        )
    d = _write_events(tmp_path, rows)
    got = {
        r.event_type: r for r in QS["ts_theil_sen_slope"].fn(spark, d).collect()
    }
    r = got["click"]
    assert r.n_days == 11 and r.n_pairs == 55
    assert abs(r.sen_slope_per_day - 1.0) < 1e-9


# ---------------------------------------------------------------------------
# Spearman: perfect monotone corpus; TTR bounds
# ---------------------------------------------------------------------------


def test_spearman_perfect_monotone_corpus(spark, tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": range(1, 9),
            "text": [" ".join(f"w{j}" for j in range(i)) for i in range(1, 9)],
            "lang": ["en"] * 8,
            "source": ["t"] * 8,
            "n_chars": [0] * 8,
        }
    )
    d = str(tmp_path / "sf_doc")
    os.makedirs(d, exist_ok=True)
    docs.to_parquet(f"{d}/documents.parquet")
    r = QS["stats_spearman_rho"].fn(spark, d).head()
    assert r.n_rows == 8
    assert abs(r.spearman_rho - 1.0) < 1e-9


def test_ttr_bounds_and_totals(spark):
    rows = QS["text_ttr_lexical_diversity"].fn(spark, SF_SMALL).collect()
    ev = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    assert sum(r.n_docs for r in rows) == len(ev)
    for r in rows:
        assert 0 <= r.ttr_decile <= 10
        assert r.sum_types <= r.sum_tokens
        assert 0 <= r.min_ttr_micro <= r.max_ttr_micro <= 1_000_000
        assert r.ttr_decile == r.min_ttr_micro // 100_000


# ---------------------------------------------------------------------------
# Oracle runtime budget (the MATERIALIZED-CTE lesson, pinned)
# ---------------------------------------------------------------------------


def test_r12_oracles_run_within_budget():
    """Each round-12 oracle must complete at sf0.01 well under the
    driver's patience. The betweenness oracle without MATERIALIZED
    hints burned 75 CPU-minutes at sf0.1 (DuckDB 1.0 re-inlines a
    CTE at every reference — exponential over chained levels that
    each touch the recursive walk); this pins the materialized form
    and guards every future chained-CTE oracle in this file's
    families."""
    import time

    import duckdb

    c = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    for name in (
        "graph_betweenness_backbone",
        "ts_seasonal_profile",
        "stats_spearman_rho",
        "eval_map_at_k",
        "text_ttr_lexical_diversity",
        "ts_theil_sen_slope",
        "s19_parquet_bloom_probe",
    ):
        t0 = time.monotonic()
        rows = c.execute(QS[name].oracle).fetchall()
        wall = time.monotonic() - t0
        assert rows, name
        assert wall < 30.0, (name, wall)
