"""Streaming-execution queries: the batch oracles re-checked against
REAL Structured Streaming runs (readStream → watermark → window →
memory sink, availableNow trigger). Batch/stream parity is the claim:
`st_stream_tumbling_exec` must hash-match the same DuckDB SQL as the
batch `st_tumbling_window`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sales_agent_graphdb_spark.registry import register
from sales_agent_graphdb_spark.streaming import pipelines


@register(
    "st_stream_tumbling_exec",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY window_start, event_type
    ORDER BY window_start, event_type
    """,
)
def st_stream_tumbling_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.12 — watermarked tumbling windows executed as an actual
    streaming query (file source, state store, availableNow drain);
    checked against the identical batch oracle. Complete mode emits
    every window on drain."""
    return pipelines.tumbling_counts_stream(spark, sf_dir)


@register("st_stream_stateful_sessions", oracle=None)
def st_stream_stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.12 — custom stateful sessionization via
    applyInPandasWithState (30-min gap). Rows-only for the driver
    (terminal open sessions stay in state, so the flushed set is a
    strict prefix of the batch session list); pytest asserts every
    flushed session matches the batch session_window result exactly."""
    return pipelines.stateful_sessions_stream(spark, sf_dir)


@register(
    "st_stream_dedup",
    oracle="""
    SELECT event_id, event_type, value FROM events ORDER BY event_id
    """,
)
def st_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.12 / dedup family — streaming exactly-once dedup over an
    at-least-once (self-unioned) source via
    dropDuplicatesWithinWatermark: watermark-bounded seen-key state
    (evicted past the horizon — viable on unbounded streams, unlike a
    forever-growing seen set). Hash-checked: the deduped stream must
    equal the batch table exactly."""
    return pipelines.dedup_stream(spark, sf_dir)
