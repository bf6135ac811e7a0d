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


@register(
    "st_stream_stateful_sessions",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                       > 1800 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    islands AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM ordered),
    sess AS (
      SELECT user_id, session_no,
             strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS total_value
      FROM islands
      GROUP BY user_id, session_no)
    SELECT user_id, session_start, n_events, total_value
    FROM sess
    QUALIFY session_no < MAX(session_no) OVER (PARTITION BY user_id)
    ORDER BY user_id, session_start
    """,
)
def st_stream_stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.12 — custom stateful sessionization via
    applyInPandasWithState (30-min gap), the honest unbounded-stream
    shape: terminal open sessions stay in state, so the flushed set is
    the batch session list MINUS each user's last session — which the
    oracle states exactly (gap-and-islands QUALIFY-filtered to drop the
    per-user max session_no), making this query hash-checked since r03
    (VERDICT r02 #5) instead of rows-only. The drain-to-completion
    variant is st_stream_sessions_complete."""
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


@register(
    "st_stream_interval_join",
    oracle="""
    SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id
    FROM events v JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND v.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
    ORDER BY v.user_id, view_id, purchase_id
    """,
)
def st_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.12 — stream-stream interval join (view→purchase attribution
    within 1h) executed as a real watermarked streaming query;
    hash-checked against the identical batch join SQL. The time-range
    condition bounds join state on both sides — see
    streaming/pipelines.py:interval_join_stream."""
    return pipelines.interval_join_stream(spark, sf_dir)


@register(
    "st_stream_interval_join_outer",
    oracle="""
    SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     AND v.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
    ORDER BY v.user_id, view_id, purchase_id
    """,
)
def st_stream_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.12 — stream-stream LEFT OUTER interval join: null rows are
    watermark-driven (a view is provably unmatched only once the
    watermark passes its eviction bound), flushed deterministically by
    a far-future sentinel on both sides so the drained result equals
    the complete batch LEFT JOIN the oracle states. Completes the
    streaming join family: inner interval + stream-static + left
    outer. See streaming/pipelines.py:interval_join_outer_stream."""
    return pipelines.interval_join_outer_stream(spark, sf_dir)


@register(
    "st_stream_interval_join_full",
    oracle="""
    SELECT COALESCE(v.user_id, p.user_id) AS user_id,
           v.event_id AS view_id, p.event_id AS purchase_id
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     AND v.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
    ORDER BY user_id, view_id, purchase_id
    """,
)
def st_stream_interval_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.12 — stream-stream FULL OUTER interval join (VERDICT r06 #5):
    both sides' null rows are watermark-driven and sentinel-flushed, so
    the drained result equals the complete batch FULL JOIN the oracle
    states. Completes the stream-stream outer-join matrix: inner (r02)
    + left outer (r04) + full outer. See
    streaming/pipelines.py:interval_join_full_stream."""
    return pipelines.interval_join_full_stream(spark, sf_dir)


@register(
    "st_stream_sessions_complete",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                       > 1800 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    islands AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM ordered)
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS total_value
    FROM islands
    GROUP BY user_id, session_no
    ORDER BY user_id, session_start
    """,
)
def st_stream_sessions_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.12 — the stateful sessionizer drained to completion via
    per-user end-of-stream sentinels, making the custom stateful
    streaming operator FULLY oracle-checked (st_stream_stateful_sessions
    stays registered as the honest unbounded-stream shape whose open
    sessions remain in state). Exact-decimal accumulation in the
    Python state fn so totals match DuckDB's DECIMAL sums bit-for-bit.
    See streaming/pipelines.py:stateful_sessions_complete_stream."""
    return pipelines.stateful_sessions_complete_stream(spark, sf_dir)


@register(
    "st_stream_foreachbatch_upsert",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def st_stream_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.12 — foreachBatch sink maintaining a lake aggregate table
    across 3 microbatches (partial-aggregate merge per batch, i.e.
    streaming incremental view maintenance); the maintained table must
    equal the one-shot batch aggregate. See
    streaming/pipelines.py:foreachbatch_upsert_stream."""
    return pipelines.foreachbatch_upsert_stream(spark, sf_dir)


@register(
    "st_stream_user_profile",
    oracle="""
    WITH per AS (
      SELECT user_id, event_type, COUNT(*) AS c
      FROM events GROUP BY user_id, event_type),
    top AS (
      SELECT user_id, event_type AS top_type FROM per
      QUALIFY row_number() OVER (
        PARTITION BY user_id ORDER BY c DESC, event_type) = 1),
    agg AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS total_value,
             CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
      FROM events GROUP BY user_id)
    SELECT a.user_id, a.n_events, a.total_value, a.n_types, t.top_type
    FROM agg a JOIN top t USING (user_id)
    ORDER BY a.user_id
    """,
)
def st_stream_user_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.12 — streaming per-user lifetime profile ("customer 360"):
    a custom stateful operator maintains per user the event count, the
    exact-decimal value total, and per-event-type counts (modal type,
    ties → lexicographically smallest), flushed by the per-user
    end-of-stream sentinel so the drained result equals the batch
    GROUP BY exactly — which the oracle hash-checks. Spark 4's
    transformWithState v2 twin (ValueState + real MapState, TTL-capable
    handles) is implemented alongside, import-gated on the protobuf
    wheel this runtime lacks — see streaming/pipelines.py:
    user_profile_transform_with_state."""
    return pipelines.user_profile_stream(spark, sf_dir)


@register(
    "st_stream_static_enrich",
    oracle="""
    SELECT c.c_mktsegment AS segment, e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(20,6))) AS DOUBLE) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY segment, e.event_type
    ORDER BY segment, e.event_type
    """,
)
def st_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.12 — stream-STATIC dimension enrichment (fact stream ×
    broadcast dim table, the third join shape next to the
    stream-stream interval join and the batch lookup joins): events
    enriched with the customer's market segment per microbatch, rolled
    up per segment × event type; hash-matches the identical batch
    join+agg SQL. No join state — the static side broadcasts — so
    state cost is only the low-cardinality aggregate. See
    streaming/pipelines.py:stream_static_enrich."""
    return pipelines.stream_static_enrich(spark, sf_dir)


@register(
    "st_stream_sliding_exec",
    oracle="""
    WITH g AS (SELECT unnest([0, 1]) AS k),
    w AS (
      SELECT e.event_type, e.value,
             to_timestamp((floor(epoch(e.ts))::BIGINT // 1800 - g.k) * 1800) AS window_start
      FROM events e, g
      WHERE floor(epoch(e.ts))::BIGINT // 1800 - g.k >= 0)
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS total_value
    FROM w
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def st_stream_sliding_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.12 — watermarked SLIDING windows (1 h length / 30 min slide)
    executed as an actual streaming query (file source, expanded
    per-window state, availableNow drain) — completes the streaming
    window-exec matrix next to tumbling/session/dedup/interval-join.
    Hash-checked against the same epoch-grid oracle as the batch
    st_sliding_window, so batch/stream parity is the verified claim."""
    return pipelines.sliding_counts_stream(spark, sf_dir)


@register(
    "st_stream_ewma_exec",
    oracle=f"""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           list_reduce(list(CAST(value AS DOUBLE) ORDER BY ts, event_id),
                       (acc, x) -> x * CAST(0.3 AS DOUBLE)
                                   + acc * CAST(0.7 AS DOUBLE)) AS ewma
    FROM events
    GROUP BY user_id ORDER BY user_id
    """,
)
def st_stream_ewma_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.12 — per-user EWMA as a CUSTOM STATEFUL streaming operator
    (applyInPandasWithState): state carries (n, ewma, seeded) per user
    and each micro-batch folds its rows in (ts, event_id) order from
    the carried value — the streaming twin of the batch in-plan fold
    (ts_ewma_per_user), hash-checked against the same list_reduce
    oracle because Python/JVM/DuckDB all run the identical IEEE
    expression in the identical order. State is O(1) per key (three
    scalars) — the property that makes per-entity smoothing viable on
    an unbounded stream, vs the batch form's per-key event list."""
    return pipelines.ewma_stream(spark, sf_dir)


def _scd2_oracle() -> str:
    from sales_agent_graphdb_spark.queries.temporal import SCD2_ASOF_ORACLE

    return SCD2_ASOF_ORACLE


@register("st_stream_scd2_enrich", oracle=_scd2_oracle())
def st_stream_scd2_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.12 — stream × SCD2-dimension TEMPORAL enrichment: the fourth
    streaming join shape (next to stream-stream interval, stream-static
    broadcast, and the batch as-of family): every streamed event picks
    the dimension version in force AT EVENT TIME via the union-tag-
    window as-of applied per microbatch in foreachBatch, with
    idempotent per-batch_id partition landing. Shares join_scd2_asof's
    oracle VERBATIM (queries/temporal.py:SCD2_ASOF_ORACLE), so
    batch/stream temporal-join parity is the hash-certified claim —
    a plain stream-static join would misattribute every event before a
    dimension change. See streaming/pipelines.py:scd2_enrich_stream."""
    return pipelines.scd2_enrich_stream(spark, sf_dir)


@register(
    "st_stream_kmv_maintain",
    oracle="""
    WITH users AS (SELECT DISTINCT user_id FROM events),
    hashed AS (
      SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || 'kmv8'), 1, 13)) AS BIGINT)
               / 4503599627370496.0 AS h
      FROM users),
    direct AS (
      SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn
                     FROM hashed)
      WHERE rn <= 64),
    est AS (SELECT CAST(COUNT(*) AS BIGINT) AS m, MAX(h) AS kth FROM direct),
    ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_users FROM users)
    SELECT 64 AS k, est.m, ex.exact_users,
           ROUND(CASE WHEN est.m < 64 THEN CAST(est.m AS DOUBLE)
                      ELSE 63 / est.kth END, 6) AS union_est
    FROM est, ex
    """,
)
def st_stream_kmv_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.12 — STREAMING sketch maintenance: a foreachBatch pipeline
    folds each microbatch's k-row KMV sketch into a standing k-row
    state table (mergeability proved on data by agg_kmv_incremental);
    the drained state must equal the sketch built directly from the
    full corpus, which the oracle rebuilds — the driver hash-checks
    the whole streaming fold, estimate included. O(k) state per
    stream forever. See streaming/pipelines.py:kmv_sketch_stream."""
    return pipelines.kmv_sketch_stream(spark, sf_dir)


@register(
    "st_stream_topk_maintain",
    oracle="""
    WITH r AS (
      SELECT event_type, event_id, CAST(value AS DECIMAL(18,2)) AS v,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY CAST(value AS DECIMAL(18,2)) DESC, event_id) AS rk
      FROM events)
    SELECT event_type, CAST(rk AS BIGINT) AS rank, event_id,
           CAST(v AS DOUBLE) AS value
    FROM r WHERE rk <= 3 ORDER BY event_type, rank
    """,
)
def st_stream_topk_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.12 — foreachBatch sink maintaining the exact per-event_type
    top-3 leaderboard across 3 microbatches. Top-k selection is a
    semilattice (topk(topk(A) ∪ topk(B)) = topk(A ∪ B)), so the
    drained k·|types|-row state must equal the one-shot batch top-k,
    which the driver hash-checks. Publication reuses the
    version-addressed atomic-rename commit (second consumer of
    make_upsert_sink's protocol; the fold is also idempotent, so
    replay is safe by algebra AND by marker). See
    streaming/pipelines.py:topk_maintain_stream."""
    return pipelines.topk_maintain_stream(spark, sf_dir)
