"""Round-9 operator semantics: value checks beyond the oracle hash —
the AUC identity against a brute-force reference, the Misra-Gries
recovery guarantee, interval-union arithmetic against a pure-Python
sweep, the MinHash-estimator calibration claims, and the total-order
property of the keep-best-copy dedup policy.
"""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_roc_auc_matches_bruteforce(spark):
    """stats_roc_auc — the histogram rank-sum AUC must equal the
    O(n_pos·n_neg) pairwise definition: P(score_pos > score_neg) +
    0.5·P(tie), computed here exactly with Fractions."""
    from fractions import Fraction

    from sales_agent_graphdb_spark import catalog
    from sales_agent_graphdb_spark.queries.features import stats_roc_auc

    row = stats_roc_auc(spark, SF_SMALL).collect()[0]
    ev = catalog.load_table(spark, SF_SMALL, "events").select(
        "event_type", "value"
    ).collect()
    pos = sorted(r.value for r in ev if r.event_type == "purchase")
    neg = sorted(r.value for r in ev if r.event_type != "purchase")
    assert row.n_pos == len(pos) and row.n_neg == len(neg)
    import bisect

    wins = ties = 0
    for p in pos:
        wins += bisect.bisect_left(neg, p)
        ties += bisect.bisect_right(neg, p) - bisect.bisect_left(neg, p)
    auc = Fraction(2 * wins + ties, 2 * len(pos) * len(neg))
    assert abs(row.auc - float(auc)) < 1e-6, (row.auc, float(auc))


def test_misra_gries_guarantee_and_bound(spark):
    """agg_spacesaving_topk — (a) every exact heavy hitter carries
    in_mg_summary=True (the recovery guarantee the query's hash
    enforces), (b) the planted skew is real: both hot keys appear."""
    from sales_agent_graphdb_spark.queries.aggregates import agg_spacesaving_topk

    rows = agg_spacesaving_topk(spark, SF_SMALL).collect()
    assert rows, "planted hot keys must produce heavy hitters"
    assert all(r.in_mg_summary for r in rows)
    assert {r.key for r in rows} >= {"hot_0", "hot_1"}


def test_misra_gries_counter_logic():
    """The per-partition MG loop recovers any key with freq > n/k on a
    crafted worst-case stream (heavy key interleaved with k distinct
    cold keys — the pattern that forces maximal decrements)."""
    k = 4
    stream = []
    for i in range(60):
        stream.append("H" if i % 2 == 0 else f"c{i}")
    counters: dict[str, int] = {}
    for key in stream:
        if key in counters:
            counters[key] += 1
        elif len(counters) < k:
            counters[key] = 1
        else:
            for c in list(counters):
                counters[c] -= 1
                if counters[c] == 0:
                    del counters[c]
    # H has freq 30 > 60/4 = 15 -> must survive
    assert "H" in counters


def test_interval_union_matches_python_sweep(spark):
    """ts_interval_union_coverage — covered_ms and n_islands equal a
    pure-Python merge of the same 5-minute intervals."""
    from sales_agent_graphdb_spark import catalog
    from sales_agent_graphdb_spark.queries.temporal import (
        _IUC_LEN_US,
        ts_interval_union_coverage,
    )

    got = {
        r.user_id: (r.n_intervals, r.n_islands, r.covered_ms)
        for r in ts_interval_union_coverage(spark, SF_SMALL).collect()
    }
    ev = (
        catalog.load_table(spark, SF_SMALL, "events")
        .filter("user_id < 50")
        .select("user_id", "ts")
        .collect()
    )
    by_user: dict[int, list[int]] = {}
    for r in ev:
        import calendar

        us = calendar.timegm(r.ts.timetuple()) * 1_000_000 + r.ts.microsecond
        by_user.setdefault(r.user_id, []).append(us)
    for uid, starts in by_user.items():
        ivs = sorted((s, s + _IUC_LEN_US) for s in starts)
        covered = islands = 0
        cur_s, cur_e = None, None
        for s, e in ivs:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    covered += cur_e - cur_s
                cur_s, cur_e = s, e
                islands += 1
            else:
                cur_e = max(cur_e, e)
        covered += cur_e - cur_s
        n_iv, n_isl, cov_ms = got[uid]
        assert n_iv == len(ivs)
        assert n_isl == islands, uid
        assert cov_ms == covered // 1000, uid


def test_minhash_estimator_calibration_claims(spark):
    """dedup_minhash_estimate_accuracy — the two claims its docstring
    makes must hold on live data: the planted-pair verdict is green
    (bounded estimator error) and the candidate-population bias is
    strongly POSITIVE (LSH selection bias)."""
    from sales_agent_graphdb_spark.queries.dedup import (
        dedup_minhash_estimate_accuracy,
    )

    row = dedup_minhash_estimate_accuracy(spark, SF_SMALL).collect()[0]
    assert row.estimator_ok
    assert row.n_planted >= 50
    assert row.candidate_bias > 0.1, row.candidate_bias


def test_canonical_by_quality_total_order(spark):
    """curation_canonical_by_quality — for every cluster, the kept doc
    is the unique maximum under (en-first, longest, lowest-id): no
    other member may beat it."""
    from pyspark.sql import functions as F

    from sales_agent_graphdb_spark import catalog
    from sales_agent_graphdb_spark.queries.curation import (
        curation_canonical_by_quality,
    )

    kept = {
        r.keep_doc_id: r.n_members
        for r in curation_canonical_by_quality(spark, SF_SMALL).collect()
    }
    docs = (
        catalog.load_table(spark, SF_SMALL, "documents")
        .withColumn(
            "ck",
            F.array_join(F.slice(F.split(F.lower("text"), "[^a-z]+"), 1, 8), " "),
        )
        .collect()
    )
    clusters: dict[str, list] = {}
    for r in docs:
        clusters.setdefault(r.ck, []).append(r)
    n_multi = 0
    for members in clusters.values():
        if len(members) < 2:
            continue
        n_multi += 1
        best = min(
            members,
            key=lambda r: (0 if r.lang == "en" else 1, -r.n_chars, r.doc_id),
        )
        assert best.doc_id in kept
        assert kept[best.doc_id] == len(members)
    assert n_multi == len(kept)


def test_resource_allocation_discounts_promiscuous_orders(spark):
    """graph_resource_allocation — ppm scores are bounded by the pair's
    co-occurrence count (each common order contributes at most
    1000000//2 since a shared order has >= 2 brands) and every pair
    also appears in the raw projection."""
    from sales_agent_graphdb_spark.queries.graphq import (
        graph_resource_allocation,
    )

    rows = graph_resource_allocation(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 < r.ra_score_ppm <= r.n_common * 500_000


def test_misra_gries_guarantee_property():
    """Property (hypothesis): for ANY stream and k, every key with
    frequency > n/k survives the MG counter loop — the theorem the
    query's verdict column rests on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400),
        st.integers(min_value=2, max_value=12),
    )
    def prop(stream, k):
        counters: dict[int, int] = {}
        for key in stream:
            if key in counters:
                counters[key] += 1
            elif len(counters) < k:
                counters[key] = 1
            else:
                for c in list(counters):
                    counters[c] -= 1
                    if counters[c] == 0:
                        del counters[c]
        n = len(stream)
        from collections import Counter

        for key, freq in Counter(stream).items():
            if freq * k > n:
                assert key in counters, (key, freq, n, k)

    prop()


def test_interval_union_property():
    """Property (hypothesis): the sweep-line recurrence (running max of
    prior ends, contribution max(0, e - max(s, prev_max_end))) equals
    the union length computed by explicit interval merging, for any
    interval multiset."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=1000),
                st.integers(min_value=1, max_value=300),
            ),
            min_size=1,
            max_size=60,
        )
    )
    def prop(raw):
        ivs = sorted((s, s + w) for s, w in raw)
        # sweep-line recurrence (what the window computes)
        covered_sweep = 0
        pme = None
        for s, e in ivs:
            lo = s if pme is None else max(s, pme)
            covered_sweep += max(0, e - lo)
            pme = e if pme is None else max(pme, e)
        # explicit merge
        covered_merge = 0
        cur_s = cur_e = None
        for s, e in ivs:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    covered_merge += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        covered_merge += cur_e - cur_s
        assert covered_sweep == covered_merge

    prop()
