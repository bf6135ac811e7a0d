"""Batch/stream parity for the Structured Streaming layer."""

from __future__ import annotations

from pyspark.sql import functions as F

from sales_agent_graphdb_spark import catalog
from sales_agent_graphdb_spark.streaming import pipelines

SF = "/root/testdata/sf0.001"


def test_stream_tumbling_matches_batch(spark):
    streamed = pipelines.tumbling_counts_stream(spark, SF)
    e = catalog.load_table(spark, SF, "events")
    batch = (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    srows = sorted(map(tuple, streamed.collect()))
    brows = sorted(map(tuple, batch.collect()))
    assert srows == brows


def test_stateful_sessions_prefix_of_batch(spark):
    flushed = pipelines.stateful_sessions_stream(spark, SF).collect()
    assert len(flushed) > 0
    e = catalog.load_table(spark, SF, "events")
    batch = (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
            "total_value",
        )
    )
    bset = {
        (r.user_id, r.session_start, r.n_events, round(r.total_value, 6))
        for r in batch.collect()
    }
    for r in flushed:
        key = (r.user_id, r.session_start, r.n_events, round(r.total_value, 6))
        assert key in bset, f"flushed session not in batch result: {key}"


def test_stream_dedup_exactly_once(spark):
    """dropDuplicatesWithinWatermark over the self-unioned (×2) source
    must return each event exactly once — equal to the batch table."""
    from sales_agent_graphdb_spark import catalog
    from sales_agent_graphdb_spark.streaming import pipelines

    out = pipelines.dedup_stream(spark, SF)
    got = [(r.event_id, r.event_type, round(r.value, 9)) for r in out.collect()]
    batch = catalog.load_table(spark, SF, "events").select(
        "event_id", "event_type", "value"
    )
    want = sorted(
        (r.event_id, r.event_type, round(r.value, 9)) for r in batch.collect()
    )
    assert got == want
    assert len(got) == len({g[0] for g in got})  # ids unique
