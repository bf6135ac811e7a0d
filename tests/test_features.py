"""Semantics tests for the r03 feature-engineering / curation additions
beyond the oracle parity gate: winsorize invariants, correlation vs a
numpy reference, gap-fill density/LOCF, vocabulary ranking, leakage-safe
split invariants, and fuzzy-join planted recall.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from sales_agent_graphdb_spark import catalog
from sales_agent_graphdb_spark.registry import all_queries
from tests.conftest import SF_SMALL

QUERIES = all_queries()


def test_winsorize_invariants(spark):
    rows = {r["l_returnflag"]: r for r in QUERIES["feature_winsorize"].fn(spark, SF_SMALL).collect()}
    li = catalog.load_table(spark, SF_SMALL, "lineitem")
    raw = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("l_extendedprice").alias("mean_raw"),
            F.min("l_extendedprice").alias("mn"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    }
    assert rows.keys() == raw.keys()
    for flag, r in rows.items():
        # Cuts are real data values inside the group's range, ordered.
        assert raw[flag]["mn"] <= r["lo_cut"] < r["hi_cut"] <= raw[flag]["mx"]
        # ~1% clipped each side (position-pick makes the bound exact).
        n = r["n_rows"]
        assert r["n_clipped_low"] <= math.ceil(n * 0.01)
        assert r["n_clipped_high"] <= n - math.ceil(n * 0.99) + 1
        assert r["n_clipped_low"] + r["n_clipped_high"] > 0
        # Winsorized mean sits inside the clip interval.
        assert r["lo_cut"] <= r["mean_winsorized"] <= r["hi_cut"]


def test_correlation_matches_numpy(spark):
    out = {
        (r["col_x"], r["col_y"]): r["corr"]
        for r in QUERIES["feature_correlation"].fn(spark, SF_SMALL).collect()
    }
    li = (
        catalog.load_table(spark, SF_SMALL, "lineitem")
        .select("l_quantity", "l_extendedprice", "l_discount")
        .collect()
    )
    cols = {c: np.array([r[c] for r in li]) for c in ("l_quantity", "l_extendedprice", "l_discount")}
    for (x, y), got in out.items():
        assert -1.0 <= got <= 1.0
        ref = np.corrcoef(cols[x], cols[y])[0, 1]
        assert abs(got - ref) < 1e-5, (x, y, got, ref)


def test_gap_fill_dense_and_locf(spark):
    df = QUERIES["ts_gap_fill_locf"].fn(spark, SF_SMALL)
    rows = df.collect()
    e = catalog.load_table(spark, SF_SMALL, "events")
    types = {r[0] for r in e.select("event_type").distinct().collect()}
    b = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("mn"),
        F.date_trunc("hour", F.max("ts")).alias("mx"),
    ).collect()[0]
    n_hours = int((b["mx"] - b["mn"]).total_seconds() // 3600) + 1
    # Dense spine: every (type, hour) cell exactly once.
    assert len(rows) == len(types) * n_hours
    per_type = {}
    for r in rows:
        per_type.setdefault(r["event_type"], []).append(r)
    for t, rs in per_type.items():
        rs.sort(key=lambda r: r["hour"])
        seen_value = False
        for r in rs:
            if r["filled"]:
                assert r["n_events"] == 0
                # LOCF: once a value has been seen it can never go NULL.
                if seen_value:
                    assert r["total_value_locf"] is not None
            else:
                assert r["n_events"] > 0
                seen_value = True


def test_vocab_ids_dense_and_ranked(spark):
    rows = QUERIES["text_vocab_build"].fn(spark, SF_SMALL).collect()
    assert rows, "empty vocabulary"
    ids = [r["token_id"] for r in rows]
    assert ids == list(range(1, len(rows) + 1))
    tfs = [r["tf_total"] for r in rows]
    assert tfs == sorted(tfs, reverse=True)
    assert all(r["df_docs"] >= 5 for r in rows)


def test_split_leakage_safe_no_straddle(spark):
    from sales_agent_graphdb_spark.queries.dedup import dup_corpus

    rows = {r["split"]: r for r in QUERIES["split_leakage_safe"].fn(spark, SF_SMALL).collect()}
    assert set(rows) == {"train", "val"}
    # The planted dup corpus guarantees the naive split WOULD leak.
    assert sum(r["n_clusters_naive_would_leak"] for r in rows.values()) > 0

    # Independently recompute: no content cluster straddles splits.
    corpus = dup_corpus(spark, SF_SMALL)
    norm = F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]", "")
    key = F.md5(norm)
    shard = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint") % 10
    split = F.when(shard < 2, "val").otherwise("train")
    straddle = (
        corpus.select(key.alias("k"), split.alias("s"))
        .groupBy("k")
        .agg(F.countDistinct("s").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    assert straddle == 0
    # Totals line up with the corpus.
    assert sum(r["n_docs"] for r in rows.values()) == corpus.count()


def test_fuzzy_join_planted_recall(spark):
    rows = QUERIES["join_fuzzy_blocked"].fn(spark, SF_SMALL).collect()
    p = catalog.load_table(spark, SF_SMALL, "part").collect()
    names = {r["p_partkey"]: r["p_name"] for r in p}
    planted = {
        k + 1_000_000: names[k] for k in names if k % 3 == 0 and len(names[k]) > 1
    }
    matched = {}
    for r in rows:
        assert 0 <= r["dist"] <= 2
        matched.setdefault(r["probe_id"], set()).add(r["p_name"])
        # canon_key is the entity's canonical id: the MIN partkey
        # carrying that exact name.
        assert r["canon_key"] == min(
            k for k, n in names.items() if n == r["p_name"]
        )
    # Every probe resolves to its origin ENTITY (distance 1: one
    # deletion); the match side is the distinct-name catalog.
    for probe_id, origin_name in planted.items():
        assert origin_name in matched.get(probe_id, set()), (probe_id, origin_name)
    # EXACTLY one row per (probe, entity) — a regression to matching
    # raw catalog rows would emit one row per duplicate name copy.
    assert len(rows) == len({(r["probe_id"], r["canon_key"]) for r in rows})


def test_hll_rollup_verdicts_and_exact(spark):
    rows = QUERIES["agg_hll_rollup"].fn(spark, SF_SMALL).collect()
    by_day = {r["day"]: r for r in rows}
    assert "ALL" in by_day
    assert all(r["est_ok"] for r in rows), "HLL estimate out of bounds"
    e = catalog.load_table(spark, SF_SMALL, "events")
    exact_all = e.select("user_id").distinct().count()
    assert by_day["ALL"]["n_exact"] == exact_all
    # Daily exacts each bounded by the global distinct; union covers it.
    daily = [r for r in rows if r["day"] != "ALL"]
    assert all(r["n_exact"] <= exact_all for r in daily)
    assert sum(r["n_exact"] for r in daily) >= exact_all


def test_scd2_asof_matches_closed_form(spark):
    rows = {
        (r["segment"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in QUERIES["join_scd2_asof"].fn(spark, SF_SMALL).collect()
    }
    # With exactly two versions the as-of result has a closed form:
    # MOVED iff user%5==0 and ts >= the effective date.
    e = catalog.load_table(spark, SF_SMALL, "events")
    c = catalog.load_table(spark, SF_SMALL, "customer")
    j = e.join(c, e.user_id == c.c_custkey)
    seg = F.when(
        (F.col("user_id") % 5 == 0)
        & (F.col("ts") >= F.lit("2024-01-15 00:00:00").cast("timestamp")),
        "MOVED",
    ).otherwise(F.col("c_mktsegment"))
    ref = {
        (r["segment"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in j.groupBy(seg.alias("segment"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .collect()
    }
    assert rows == ref


def test_anomaly_planted_spikes_flagged(spark):
    rows = QUERIES["anomaly_rolling_zscore"].fn(spark, SF_SMALL).collect()
    flagged = {r["event_id"] for r in rows}
    assert flagged, "no anomalies flagged"
    # RECALL, pinned independently: recompute every planted spike's
    # trailing-72h baseline driver-side from the raw events and demand
    # that each spike whose independent z clears the threshold with
    # margin (>3.5; margin absorbs the engines' 6-dp rounding at the
    # boundary) appears in the flagged set.
    ev = catalog.load_table(spark, SF_SMALL, "events").select(
        "user_id", "event_id", "ts", "value"
    ).collect()
    by_user = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append((r["ts"], r["value"]))
    import datetime

    expected, seen_ok = [], 0
    for r in ev:
        if r["event_id"] % 211 != 0:
            continue
        spike_ts = r["ts"] + datetime.timedelta(microseconds=1)
        lo = spike_ts - datetime.timedelta(hours=72)
        base = [
            v for (t, v) in by_user[r["user_id"]] if lo <= t < spike_ts
        ]
        n = len(base)
        if n < 5:
            continue
        mean = sum(base) / n
        var = (sum(v * v for v in base) - sum(base) ** 2 / n) / (n - 1)
        z = (r["value"] + 500.0 - mean) / math.sqrt(var + 1e-12)
        if z > 3.5:
            expected.append(-r["event_id"] - 1)
        seen_ok += 1
    assert expected, "test corpus produced no checkable planted spike"
    for eid in expected:
        assert eid in flagged, f"planted spike {eid} not flagged"
    # Every flagged row respects the threshold and baseline minimum,
    # and planted spikes are extreme-positive.
    for r in rows:
        assert abs(r["z"]) > 3.0 and r["n_baseline"] >= 5
        if r["event_id"] < 0:
            assert r["z"] > 3.0
