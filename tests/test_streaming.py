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


def test_user_profile_stream_matches_batch(spark):
    """st_stream_user_profile — the stateful profile equals the batch
    GROUP BY (count / exact-decimal total / distinct types / modal type
    with lexicographic tie-break) for every user."""
    streamed = {tuple(r) for r in pipelines.user_profile_stream(spark, SF).collect()}
    e = catalog.load_table(spark, SF, "events")
    per = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("c").desc(), "event_type")
    top = (
        per.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("top_type"))
    )
    agg = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(20,6)")).cast("double").alias("total_value"),
        F.countDistinct("event_type").alias("n_types"),
    )
    batch = {
        tuple(r)
        for r in agg.join(top, "user_id")
        .select("user_id", "n_events", "total_value", "n_types", "top_type")
        .collect()
    }
    assert streamed == batch


def test_transform_with_state_twin_gated_or_parity(spark):
    """user_profile_transform_with_state — when the protobuf wheel is
    absent the v2-API twin must fail loudly with the documented
    NotImplementedError (never a silent wrong answer); when present it
    must produce exactly the v1 operator's rows."""
    import pytest as _pytest

    if not pipelines._protobuf_available():
        with _pytest.raises(NotImplementedError, match="protobuf"):
            pipelines.user_profile_transform_with_state(spark, SF)
        return
    v2 = {
        tuple(r)
        for r in pipelines.user_profile_transform_with_state(spark, SF).collect()
    }
    v1 = {tuple(r) for r in pipelines.user_profile_stream(spark, SF).collect()}
    assert v2 == v1


def test_full_outer_interval_join_covers_all_three_row_classes(spark):
    """st_stream_interval_join_full — the oracle hash certifies values;
    this pins NON-VACUITY of the full-outer semantics: the drained
    stream must contain matched pairs, null-purchase views AND
    null-view purchases (a left-outer regression would zero the third
    class while still passing a left-join-shaped comparison), and no
    sentinel rows may survive the drain filter."""
    from pyspark.sql import functions as F

    from sales_agent_graphdb_spark.streaming import pipelines

    out = pipelines.interval_join_full_stream(spark, SF)
    counts = out.agg(
        F.sum((F.col("purchase_id").isNull()).cast("int")).alias("null_buy"),
        F.sum((F.col("view_id").isNull()).cast("int")).alias("null_view"),
        F.sum(
            (F.col("view_id").isNotNull() & F.col("purchase_id").isNotNull()).cast("int")
        ).alias("matched"),
        F.sum((F.col("view_id") == -1).cast("int")).alias("sentinel_v"),
        F.sum((F.col("purchase_id") == -1).cast("int")).alias("sentinel_b"),
    ).collect()[0]
    assert counts.null_buy > 0, counts
    assert counts.null_view > 0, counts
    assert counts.matched > 0, counts
    assert not counts.sentinel_v and not counts.sentinel_b, counts
