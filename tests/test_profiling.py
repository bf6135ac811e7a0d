"""Property pins for queries/profiling.py beyond the registry-wide
oracle parity test: the CMS overestimate guarantee for EVERY key (not
just the probed top-10), the rank-filter pushdown plans, and the
centroid's agreement with a driver-side numpy reference."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from sales_agent_graphdb_spark import catalog
from sales_agent_graphdb_spark.queries.profiling import (
    _CMS_DEPTH,
    _CMS_WIDTH,
    _cms_bucket,
    agg_countmin_portable,
    data_quality_report,
    sample_group_topk,
    text_tfidf_keywords,
    vec_centroid_per_label,
)
from tests.conftest import SF_SMALL


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cms_estimate_ge_true_for_every_key(spark):
    """The count-min guarantee est >= true holds for ALL keys, not just
    the registered query's top-10 probe set."""
    li = catalog.load_table(spark, SF_SMALL, "lineitem").select(
        F.col("l_partkey").alias("k")
    )
    hashed = li.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("i"), _cms_bucket(i, F.col("k")).alias("b"))
                    for i in range(_CMS_DEPTH)
                ]
            )
        ).alias("x")
    ).select("x.i", "x.b")
    cells = hashed.groupBy("i", "b").agg(F.count(F.lit(1)).alias("c"))
    true = li.groupBy("k").agg(F.count(F.lit(1)).alias("true_cnt"))
    probes = true.select(
        "k",
        "true_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("i"), _cms_bucket(i, F.col("k")).alias("b"))
                    for i in range(_CMS_DEPTH)
                ]
            )
        ).alias("x"),
    ).select("k", "true_cnt", "x.i", "x.b")
    est = (
        probes.join(cells, ["i", "b"])
        .groupBy("k", "true_cnt")
        .agg(F.min("c").alias("est"))
    )
    bad = est.filter(F.col("est") < F.col("true_cnt")).count()
    assert bad == 0
    # Buckets are in range and the sketch really is bounded-size state.
    n_cells = cells.count()
    assert n_cells <= _CMS_DEPTH * _CMS_WIDTH
    assert cells.filter((F.col("b") < 0) | (F.col("b") >= _CMS_WIDTH)).count() == 0


def test_cms_query_overcount_nonnegative(spark):
    rows = agg_countmin_portable(spark, SF_SMALL).collect()
    assert len(rows) == 10
    assert all(r.overcount >= 0 for r in rows)
    # Probe order is (true_cnt desc, part_key asc).
    counts = [r.true_cnt for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_sample_group_topk_bounded_and_pushed(spark):
    df = sample_group_topk(spark, SF_SMALL)
    rows = df.collect()
    per_group: dict[str, int] = {}
    for r in rows:
        per_group[r.source] = per_group.get(r.source, 0) + 1
        assert 1 <= r.rk <= 5
    assert per_group and all(v <= 5 for v in per_group.values())
    # Rank filter is pushed below the window sort: partial top-k per
    # input partition before the shuffle.
    assert "WindowGroupLimit" in _plan(df)


def test_tfidf_topk_ranked_and_pushed(spark):
    df = text_tfidf_keywords(spark, SF_SMALL)
    rows = df.collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_rows in by_doc.values():
        assert [r.rk for r in doc_rows] == list(range(1, len(doc_rows) + 1))
        scores = [r.score for r in doc_rows]
        assert scores == sorted(scores, reverse=True)
        assert all(math.isfinite(s) and s > 0 for s in scores)
    assert "WindowGroupLimit" in _plan(df)


def test_data_quality_report_matches_table(spark):
    rows = {r.metric: r.value for r in data_quality_report(spark, SF_SMALL).collect()}
    o = catalog.load_table(spark, SF_SMALL, "orders")
    assert rows["row_count"] == o.count()
    assert rows["distinct:o_orderstatus"] == o.select("o_orderstatus").distinct().count()
    # Synthetic testdata ships complete, in-domain orders — every null /
    # violation metric must be exactly zero (a nonzero here means the
    # metric expression itself drifted).
    for m, v in rows.items():
        if m.startswith(("null:", "rule:")):
            assert v == 0, (m, v)


def test_vec_centroid_matches_numpy(spark):
    out = vec_centroid_per_label(spark, SF_SMALL)
    rows = out.collect()
    emb = catalog.load_table(spark, SF_SMALL, "embeddings").collect()
    by_label: dict[int, list] = {}
    for r in emb:
        by_label.setdefault(r.label, []).append(r.embedding)
    got = {}
    for r in rows:
        got.setdefault(r.label, [None] * 64)[r.dim] = (r.centroid, r.n_vecs)
    assert set(got) == set(by_label)
    for label, vecs in by_label.items():
        ref = np.floor(np.array(vecs, dtype=np.float64) * 1e8).sum(axis=0)
        ref = ref / len(vecs) / 1e8
        for d in range(64):
            centroid, n_vecs = got[label][d]
            assert n_vecs == len(vecs)
            assert centroid == ref[d], (label, d)
