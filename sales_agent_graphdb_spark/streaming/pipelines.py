"""Structured Streaming pipelines over the events table.

The reference has no data streaming (SURVEY.md §2.12 — its SSE chat is
token transport; Redis TTL is its only time-based semantics). The
events table is the designated extension surface: here the SAME window
expressions used by the batch queries in ``queries/event_windows.py``
run as real ``readStream`` pipelines — file source over the testdata
parquet, event-time watermark, windowed aggregation, memory sink,
``availableNow`` trigger so a bounded run drains the source and
terminates. Batch/stream parity is the correctness claim: the driver
oracle-checks the streamed result against the same DuckDB SQL as the
batch form.

Scale design: in production the source is a real log stream (Kafka/
files on object storage); state lives in the state store partitioned
by grouping key, so 1000 executors shard windows by (window, key)
hash. ``availableNow`` is also the production backfill path — the same
pipeline replays history with bounded per-batch file counts.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout

SCRATCH = "/root/repo/.scratch/streaming"

# events schema as written. ts has shipped as TIMESTAMP(NANOS) (=> long
# ns with nanosAsLong) or plain TIMESTAMP_NTZ depending on testdata
# generation; the streaming source pins whichever the file actually has
# (streaming sources never infer), detected via a cheap batch read.
def _events_raw_schema(spark: SparkSession, sf_dir: str) -> T.StructType:
    from sales_agent_graphdb_spark.catalog import ensure_events_readable

    path = f"{sf_dir}/events.parquet"
    ensure_events_readable(spark, path)
    ts_type = spark.read.parquet(path).schema["ts"].dataType
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as an unbounded source: file-stream over the testdata
    parquet (schema pinned — streaming sources never infer), ts
    normalized to session-TZ TimestampType identical to the batch
    loader (nanos→µs floor when long-encoded)."""
    schema = _events_raw_schema(spark, sf_dir)
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{sf_dir}/events.[p]arquet")  # glob => file-source basePath is the dir
    )
    from sales_agent_graphdb_spark.catalog import normalize_events_ts

    return normalize_events_ts(raw)


def _run_to_memory(stream: DataFrame, mode: str) -> DataFrame:
    """Execute a bounded streaming query into a memory sink and return
    the result table. Checkpoint + sink name are per-run unique."""
    run_id = uuid.uuid4().hex[:12]
    ckpt = os.path.join(SCRATCH, f"ckpt_{run_id}")
    q = (
        stream.writeStream.format("memory")
        .queryName(f"sink_{run_id}")
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark_ = stream.sparkSession
    sink = spark_.table(f"sink_{run_id}")
    # Materialize and DROP the memory-sink view: the sink pins the full
    # result in driver memory for the session lifetime otherwise (one
    # orphaned table per streaming run — tests/audits run dozens).
    out = spark_.createDataFrame(sink.collect(), schema=sink.schema)
    spark_.catalog.dropTempView(f"sink_{run_id}")
    shutil.rmtree(ckpt, ignore_errors=True)
    return out


def _windowed_counts_stream(
    spark: SparkSession, sf_dir: str, window_col
) -> DataFrame:
    """ONE streaming windowed-count pipeline (watermark → per-window
    exact-DECIMAL agg → complete-mode drain → formatted projection)
    parameterized by the window expression — tumbling and sliding are
    the same query shape differing only in F.window(...), so a fix to
    the watermark/sum/projection reaches both twins or neither."""
    events = stream_events(spark, sf_dir)
    agg = (
        events.withWatermark("ts", "2 hours")
        .groupBy(window_col.alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,6)")).cast("double").alias("total_value"),
        )
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    ).orderBy("window_start", "event_type")


def tumbling_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked 1-hour tumbling windows per event_type — the
    streaming twin of queries/event_windows.st_tumbling_window (same
    window expression, same exact-DECIMAL sums). Complete output mode
    so the bounded run emits every window including those still inside
    the watermark when the source drains."""
    return _windowed_counts_stream(spark, sf_dir, F.window("ts", "1 hour"))


def sliding_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked SLIDING windows (1-hour length, 30-minute slide) per
    event_type executed as a real streaming query — the streaming twin
    of queries/event_windows.st_sliding_window. Each event feeds 2
    overlapping window states (Spark expands the row per window);
    state per key is bounded by length/slide windows past the
    watermark. Complete mode emits every window on drain, matching the
    batch grid oracle exactly."""
    return _windowed_counts_stream(
        spark, sf_dir, F.window("ts", "1 hour", "30 minutes")
    )


# ---------------------------------------------------------------------------
# Custom stateful operator: per-user session aggregation via
# applyInPandasWithState (SURVEY.md §2.12 "custom stateful operators").
# ---------------------------------------------------------------------------

SESSION_GAP_S = 1800  # 30 min, the reference's session-ish constant

_OUT_SCHEMA = (
    "user_id long, session_start timestamp, n_events long, total_value double"
)


def stateful_sessions_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completed (flushed) sessions per user from the stateful
    operator. Terminal open sessions remain in state — so the result is
    exactly the batch gap-and-islands session list MINUS each user's
    last session, which is what the r03 DuckDB oracle checks (the
    QUALIFY-prefix form of st_stream_sessions_complete's oracle).
    Exact-decimal accumulation so totals match the oracle's DECIMAL
    sums bit-for-bit; session_start formatted like the complete
    variant."""
    events = stream_events(spark, sf_dir).select(
        "user_id",
        (F.unix_micros(F.col("ts"))).alias("ts_us"),
        "event_id",
        "value",
    )
    result = events.groupBy("user_id").applyInPandasWithState(
        _make_session_fn_exact(SESSION_GAP_S),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA_EXACT,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = _run_to_memory(result, "append")
    return out.select(
        "user_id",
        F.date_format(F.col("session_start"), "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        "n_events",
        "total_value",
    ).orderBy("user_id", "session_start")


def dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once dedup: the events source unioned with
    itself (every event arrives twice — the at-least-once delivery
    shape Kafka consumers actually see), deduplicated by event_id with
    ``dropDuplicatesWithinWatermark``. State is the seen-key set
    BOUNDED BY THE WATERMARK HORIZON — keys older than the watermark
    are evicted, so state size tracks the delay window (2h of keys),
    not stream length: the property that makes streaming dedup viable
    on an unbounded 100 TB/day stream, where an unbounded seen-set
    (plain dropDuplicates) would grow forever. Result: each event
    exactly once — hash-checked against the batch table."""
    a = stream_events(spark, sf_dir)
    b = stream_events(spark, sf_dir)
    doubled = a.unionByName(b)
    deduped = doubled.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    out = _run_to_memory(deduped, "append")
    return out.select("event_id", "event_type", "value").orderBy("event_id")


def interval_join_cond():
    """THE view→purchase attribution join condition — equi-key on
    user_id plus the 1h time-range bound. Shared with
    tests/test_plans.py so the plan-shape test exercises the REAL
    condition: losing the equi-key here would degrade the state-store
    sharding to a nested-loop shape, and the test must see that."""
    return F.expr(
        "v_user_id = b_user_id AND "
        "view_ts BETWEEN buy_ts - INTERVAL 1 HOUR AND buy_ts"
    )


def interval_join_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: purchase events joined to the same
    user's view events from the preceding hour — the attribution join
    every clickstream pipeline runs. Both sides are watermarked, so the
    join STATE is bounded: a buffered view can be evicted once the
    purchase-side watermark passes view_ts + 1h (the time-range
    condition gives Spark the eviction bound; an unconstrained
    stream-stream join would buffer forever). Inner-join matches emit
    as they form; availableNow drains the source, so the streamed
    result equals the batch join exactly and the driver hash-checks it
    against the batch SQL. At 100 TB/day both sides shard by user_id
    in the state store across executors."""
    views = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "2 hours")
    )
    buys = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("b_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("buy_ts"),
        )
        .withWatermark("buy_ts", "2 hours")
    )
    joined = views.join(buys, interval_join_cond(), "inner")
    out = _run_to_memory(joined, "append")
    return out.select(
        F.col("v_user_id").alias("user_id"), "view_id", "purchase_id"
    ).orderBy("user_id", "view_id", "purchase_id")


def interval_join_outer_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every view event, with
    its attributed purchase (next hour, same user) or NULL if none —
    the attribution join that also has to account for the views that
    converted to nothing. Unlike the inner form, the null rows are
    WATERMARK-DRIVEN: Spark can only declare a view unmatched once the
    watermark passes view_ts + 1h (the range bound) — before that a
    matching purchase could still arrive — so each null row emits at
    state eviction in a later microbatch.

    Bounded-run determinism: the sentinel (10h past the global max on
    BOTH sides — it must survive each side's event-type filter or it
    cannot advance that side's watermark) pushes the final watermark
    past every view's eviction bound, so ALL unmatched views flush
    their null rows in the drain's no-data batch and the streamed
    result equals the complete batch LEFT JOIN, which the oracle
    states. At 100 TB/day the state store shards by user_id and holds
    only the watermark horizon on each side."""
    src_dir, stream = _sentinel_source(spark, sf_dir, sentinel_gap_s=36000)
    try:
        views = (
            stream.filter(F.col("event_type").isin("view", "__sentinel__"))
            .select(
                F.col("user_id").alias("v_user_id"),
                F.col("event_id").alias("view_id"),
                F.col("ts").alias("view_ts"),
                F.col("event_type").alias("v_type"),
            )
            .withWatermark("view_ts", "2 hours")
        )
        buys = (
            stream.filter(F.col("event_type").isin("purchase", "__sentinel__"))
            .select(
                F.col("user_id").alias("b_user_id"),
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("buy_ts"),
            )
            .withWatermark("buy_ts", "2 hours")
        )
        joined = views.join(buys, interval_join_cond(), "leftOuter")
        out = _run_to_memory(joined, "append")
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
    # Sentinel view rows pair with the same user's sentinel purchase
    # (equal ts satisfies the range) — dropped here either way.
    return (
        out.filter(F.col("v_type") != "__sentinel__")
        .select(F.col("v_user_id").alias("user_id"), "view_id", "purchase_id")
        .orderBy("user_id", "view_id", "purchase_id")
    )


def interval_join_full_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join (the last outer-join
    shape after inner + left outer): every view with its attributed
    purchase, every unconverted view with NULL purchase, AND every
    unattributed purchase with NULL view — the complete attribution
    reconciliation both sides of a funnel audit need. Null flushes are
    watermark-driven on BOTH sides: an unmatched view flushes when the
    watermark passes view_ts + 1h, an unmatched purchase when it
    passes buy_ts (its candidate views all precede it), so the state
    store holds only each side's horizon and evicts symmetrically.

    Bounded-run determinism: the shared per-user sentinel (10h past
    the global max, surviving BOTH event-type filters) advances both
    watermarks past every eviction bound, so the drain's no-data batch
    flushes ALL remaining null rows on both sides and the streamed
    result equals the complete batch FULL JOIN the oracle states.
    Sentinel rows can only pair with the same user's sentinel on the
    other side (equal ts; real events are >1h away in event time on
    the wrong side of the bound), so they emit as matched pairs
    identified by event_id -1 on both columns and are dropped after
    the drain. At 100 TB/day both state sides shard by user_id."""
    src_dir, stream = _sentinel_source(spark, sf_dir, sentinel_gap_s=36000)
    try:
        views = (
            stream.filter(F.col("event_type").isin("view", "__sentinel__"))
            .select(
                F.col("user_id").alias("v_user_id"),
                F.col("event_id").alias("view_id"),
                F.col("ts").alias("view_ts"),
            )
            .withWatermark("view_ts", "2 hours")
        )
        buys = (
            stream.filter(F.col("event_type").isin("purchase", "__sentinel__"))
            .select(
                F.col("user_id").alias("b_user_id"),
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("buy_ts"),
            )
            .withWatermark("buy_ts", "2 hours")
        )
        joined = views.join(buys, interval_join_cond(), "fullOuter")
        out = _run_to_memory(joined, "append")
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
    # Sentinels always emit as same-user matched pairs (never against a
    # real event), so event_id -1 on either column marks the whole row.
    return (
        out.filter(
            (F.coalesce(F.col("view_id"), F.lit(0)) != -1)
            & (F.coalesce(F.col("purchase_id"), F.lit(0)) != -1)
        )
        .select(
            F.coalesce(F.col("v_user_id"), F.col("b_user_id")).alias("user_id"),
            "view_id",
            "purchase_id",
        )
        .orderBy("user_id", "view_id", "purchase_id")
    )


def _make_session_fn_exact(gap_s: int):
    """Per-group stateful sessionizer (a self-contained closure:
    cloudpickle serializes it by VALUE, so executors need no package
    import path). Accumulates value in exact decimal, so the flushed
    total matches SUM(CAST(value AS
    DECIMAL(20,6))) bit-for-bit — required for the oracle-checked
    complete-sessions query. Each event is quantized to 6 dp with
    HALF_UP on the shortest repr, which is exactly Spark's
    double→DECIMAL(20,6) cast (BigDecimal.valueOf → setScale(6,
    HALF_UP)) — the same cast every other oracle-green query applies
    JVM-side, so this query diverges from the DuckDB oracle only if
    they all do. Sentinel events (event-time far past every real
    event) close each user's final session; the sentinel's own
    singleton session stays in state and is never emitted."""
    import decimal as _decimal

    import pandas as _pd

    _Q6 = _decimal.Decimal("0.000001")

    def _dec6(value) -> _decimal.Decimal:
        return _decimal.Decimal(str(value)).quantize(
            _Q6, rounding=_decimal.ROUND_HALF_UP
        )

    def session_fn(key, pdf_iter, state):
        (user_id,) = key
        # (ts_us, event_id) — total order, so tied timestamps cannot
        # reorder between runs (mirrors the oracle's window ordering).
        rows = _pd.concat(list(pdf_iter)).sort_values(["ts_us", "event_id"])
        if state.exists:
            last_ts, start, n, total_str = state.get
            total = _decimal.Decimal(total_str)
        else:
            last_ts, start, n, total = None, None, 0, _decimal.Decimal(0)
        out = []
        for ts_us, value in zip(rows["ts_us"], rows["value"]):
            ts_us = int(ts_us)
            if last_ts is not None and ts_us - last_ts > gap_s * 1_000_000:
                out.append((user_id, start, n, float(total)))
                start, n, total = ts_us, 1, _dec6(value)
            else:
                start = ts_us if start is None else start
                n += 1
                total += _dec6(value)
            last_ts = ts_us
        state.update((last_ts, start, n, str(total)))
        if out:
            yield _pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "session_start": [_pd.Timestamp(o[1], unit="us") for o in out],
                    "n_events": [o[2] for o in out],
                    "total_value": [o[3] for o in out],
                }
            )

    return session_fn


_STATE_SCHEMA_EXACT = "last_ts long, session_start long, n long, total string"


def _sentinel_source(
    spark: SparkSession, sf_dir: str, sentinel_gap_s: int = 2 * SESSION_GAP_S
) -> tuple[str, DataFrame]:
    """Scratch streaming source = the events parquet (symlinked;
    testdata is read-only) plus one end-of-stream sentinel event per
    user at event-time ``sentinel_gap_s`` (default 2*SESSION_GAP_S)
    past the global max — the drain-a-bounded-run move every
    sentinel-flushed stateful query shares. The outer interval join
    passes a larger gap: its null-side flush needs the watermark to
    clear every view's eviction bound (view_ts + 1h + 2h delay), not
    just the session gap. Returns (scratch dir to rm after the run,
    normalized stream).

    No maxFilesPerTrigger: both files land in ONE microbatch, so the
    state fn's in-batch event-time sort fully determines order. (With
    per-file batches, correctness would rest on the file source's
    mtime ordering putting the sentinel last — a sentinel-first batch
    would seed state at the far-future sentinel ts and absorb every
    real event into a never-emitted sentinel session.)"""
    run_id = uuid.uuid4().hex[:12]
    src_dir = os.path.join(SCRATCH, f"sentinel_src_{run_id}")
    os.makedirs(src_dir, exist_ok=True)
    os.symlink(
        os.path.realpath(f"{sf_dir}/events.parquet"),
        os.path.join(src_dir, "events.parquet"),
    )

    schema = _events_raw_schema(spark, sf_dir)
    ts_kind = schema["ts"].dataType.simpleString()
    # Batch-read the events to compute per-user sentinels (one tiny
    # row per user; 2*gap past the global max so every user's gap to
    # its sentinel exceeds the session gap).
    from sales_agent_graphdb_spark import catalog as _catalog

    ev = _catalog.load_table(spark, sf_dir, "events")
    sent = (
        ev.select("user_id")
        .distinct()
        .crossJoin(ev.agg(F.max("ts").alias("gmx")))
        .select(
            F.lit(-1).cast("long").alias("event_id"),
            (F.col("gmx") + F.expr(f"INTERVAL {sentinel_gap_s} SECONDS")).alias(
                "ts_t"
            ),
            F.col("user_id"),
            F.lit("__sentinel__").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
    )
    if ts_kind == "bigint":
        sent = sent.withColumn("ts", F.unix_micros(F.col("ts_t")) * F.lit(1000))
    else:
        sent = sent.withColumn("ts", F.col("ts_t").cast(schema["ts"].dataType))
    sent = sent.select("event_id", "ts", "user_id", "event_type", "value", "props")
    sent.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src_dir, "sentinel.parquet")
    )

    raw = spark.readStream.schema(schema).parquet(f"{src_dir}/*.parquet")
    return src_dir, _catalog.normalize_events_ts(raw)


def stateful_sessions_complete_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL sessions from the stateful operator — open sessions are
    closed by injecting one end-of-stream sentinel event per user
    (event-time 2 gaps past the global max), the standard
    drain-a-bounded-run move for stateful streaming: the sentinel
    exceeds every user's inactivity gap, so each final real session
    flushes, while the sentinel's own singleton session stays in
    state unemitted. The streamed result then equals the batch
    gap-and-islands sessionization EXACTLY, and the driver
    hash-checks it against the same DuckDB oracle as
    st_session_window. Source = a scratch dir holding the original
    events parquet plus the tiny sentinel file (testdata itself is
    read-only)."""
    src_dir, stream = _sentinel_source(spark, sf_dir)

    events = stream.select(
        "user_id", F.unix_micros(F.col("ts")).alias("ts_us"), "event_id", "value"
    )
    result = events.groupBy("user_id").applyInPandasWithState(
        _make_session_fn_exact(SESSION_GAP_S),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA_EXACT,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = _run_to_memory(result, "append")
    shutil.rmtree(src_dir, ignore_errors=True)
    return out.select(
        "user_id",
        F.date_format(F.col("session_start"), "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        "n_events",
        "total_value",
    ).orderBy("user_id", "session_start")


def latest_committed_version(tbl_root: str):  # noqa: ANN201
    """Highest committed version under a version-addressed table root:
    ``(batch_id, path)`` of the max ``v_<batch_id>`` dir, or None. Only
    dirs published by the atomic rename in ``make_upsert_sink`` exist
    under these names, so "present" == "committed"."""
    if not os.path.isdir(tbl_root):
        return None
    best = None
    for name in os.listdir(tbl_root):
        if not name.startswith("v_"):
            continue
        try:
            bid = int(name[2:])
        except ValueError:
            continue
        if best is None or bid > best[0]:
            best = (bid, os.path.join(tbl_root, name))
    return best


# Superseded versions kept after each publish (VERDICT r11 #3). N+1
# dirs bound the root regardless of stream length; the N most recent
# markers stay on disk so the common replay (latest batch re-delivered
# after a crash) hits its own marker, and OLDER replays no-op via the
# monotone-batch guard in the sinks (any committed version with
# bid >= batch_id proves the batch was applied, because foreachBatch
# only starts batch b+1 after batch b's checkpoint commit).
_RETAIN_VERSIONS = 3


def prune_versions(tbl_root: str, keep_last: int = _RETAIN_VERSIONS) -> None:
    """Keep-last-N retention for a version-addressed table root: remove
    ``v_<bid>`` dirs with ``bid < max_committed - keep_last``. Runs
    only AFTER a successful publish, never touches the current version
    or the ``keep_last`` behind it, and tolerates concurrent pruners
    (rmtree ignore_errors — losing a delete race is success)."""
    cur = latest_committed_version(tbl_root)
    if cur is None:
        return
    cutoff = cur[0] - keep_last
    for name in os.listdir(tbl_root):
        if not name.startswith("v_"):
            continue
        try:
            bid = int(name[2:])
        except ValueError:
            continue
        if bid < cutoff:
            shutil.rmtree(os.path.join(tbl_root, name), ignore_errors=True)


def make_upsert_sink(tbl_root: str):  # noqa: ANN201
    """The foreachBatch fold of ``foreachbatch_upsert_stream``, exposed
    as a factory so tests can drive replay directly. foreachBatch's
    contract is at-least-once per batch_id: on a retry after a
    completed write but before the checkpoint commit, the same batch is
    re-delivered — and this SUM/COUNT merge (unlike the idempotent KMV
    k-min fold) would double-count it.

    Exactly-once is achieved by making the applied-batch marker and the
    new table version the SAME filesystem object: each batch writes the
    merged aggregate to a private ``.build_*`` dir, then publishes it
    as ``tbl_root/v_<batch_id>`` with one atomic ``os.rename`` (the
    ``_order_brand_pairs`` publication template, queries/graphq.py).
    There is no table-write→marker-write window (VERDICT r10 #2): a
    crash before the rename leaves only an orphaned build dir and the
    retry re-merges from the previous version; a crash after it leaves
    the version visible and the retry no-ops. A builder losing a
    publish race discards its own build and defers to the committed
    winner. The last ``_RETAIN_VERSIONS`` superseded versions are
    retained as replay markers and older ones pruned after each
    publish (the lakehouse VACUUM analogue, VERDICT r11 #3) — safe
    because batch ids are monotone: any committed version with
    ``bid >= batch_id`` proves that batch was applied, so a replay of
    a PRUNED batch still no-ops on the newer marker.
    tests/test_streaming.py pins replay of batch 0, a simulated
    crash between the table write and the publication rename, and
    replay-after-prune."""

    def upsert(batch_df, batch_id):  # noqa: ANN001
        version_dir = os.path.join(tbl_root, f"v_{batch_id}")
        prev = latest_committed_version(tbl_root)
        if prev is not None and prev[0] >= batch_id:
            # Replay of an applied batch: its own marker, or ANY newer
            # committed version (its own may have been pruned), proves
            # the checkpoint-commit ordering already folded it in.
            return
        part = batch_df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,6)")).alias("total_d"),
        )
        if prev is not None:
            existing = batch_df.sparkSession.read.parquet(prev[1])
            merged = existing.unionByName(part)
        else:
            merged = part
        out = merged.groupBy("event_type").agg(
            F.sum("n_events").alias("n_events"),
            F.sum("total_d").alias("total_d"),
        )
        os.makedirs(tbl_root, exist_ok=True)
        build = os.path.join(tbl_root, f".build_{uuid.uuid4().hex[:12]}")
        # Writes into a FRESH dir — the previous version being read
        # stays intact, so no localCheckpoint detachment is needed.
        out.write.mode("overwrite").parquet(build)
        try:
            os.rename(build, version_dir)  # THE commit: data+marker, atomic
        except OSError:
            shutil.rmtree(build, ignore_errors=True)
            if os.path.exists(version_dir):
                return  # lost a publish race; the committed version wins
            raise  # genuine failure: nothing published, retry is safe
        prune_versions(tbl_root)  # after commit only; keeps last N markers

    return upsert


def foreachbatch_upsert_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming → lake-table maintenance via ``foreachBatch``: the
    events stream (split into multiple microbatches) incrementally
    upserts a per-event_type aggregate table on disk — each batch
    merges its PARTIAL aggregate into the standing table (read → union
    → re-aggregate → atomic version publish), the exact
    incremental-view shape of incremental_agg_maintenance driven by a
    stream. Counts and DECIMAL sums combine associatively, so after
    the drain the maintained table must equal the one-shot batch
    aggregate, which the driver hash-checks. At 100 TB the sink is a
    real MERGE INTO (Delta/Iceberg); the version-addressed parquet
    publish of the tiny aggregate stands in with identical commit
    semantics (see make_upsert_sink)."""
    run_id = uuid.uuid4().hex[:12]
    src_dir = os.path.join(SCRATCH, f"febu_src_{run_id}")
    tbl_dir = os.path.join(SCRATCH, f"febu_tbl_{run_id}")

    from sales_agent_graphdb_spark import catalog as _catalog

    ev = _catalog.load_table(spark, sf_dir, "events")
    # Split the source into 3 files => 3 microbatches with
    # maxFilesPerTrigger=1: the upsert must be exercised as an UPDATE
    # of existing keys, not just a first insert.
    ev.repartition(3).write.mode("overwrite").parquet(src_dir)

    batch_schema = spark.read.parquet(src_dir).schema

    # Version-addressed root: each batch publishes v_<id> (data+marker
    # in one atomic rename — see make_upsert_sink).
    upsert = make_upsert_sink(tbl_dir)

    stream = (
        spark.readStream.schema(batch_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/*.parquet")
    )
    ckpt = os.path.join(SCRATCH, f"ckpt_febu_{run_id}")
    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    current = latest_committed_version(tbl_dir)
    # An empty source drains zero batches and commits nothing — fail
    # with the table root named instead of an opaque TypeError on
    # current[1] (ADVICE r11 #2).
    assert current is not None, (
        f"no committed version under {tbl_dir}: the drained stream "
        "produced zero batches"
    )
    final = (
        spark.read.parquet(current[1])
        .select(
            "event_type",
            "n_events",
            F.col("total_d").cast("double").alias("total_value"),
        )
        .orderBy("event_type")
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(src_dir, ignore_errors=True)
    shutil.rmtree(tbl_dir, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return final


# ---------------------------------------------------------------------------
# Streaming per-user profile — the "customer 360" materialization: one
# stateful pass maintains, per user, the lifetime event count, the
# exact-decimal value total, and the per-event-type counts (modal type).
# Sentinel-flushed so a bounded drain emits exactly the batch answer.
# ---------------------------------------------------------------------------

_PROFILE_OUT_SCHEMA = (
    "user_id long, n_events long, total_value double, "
    "n_types long, top_type string"
)
# per-type counts ride in the fixed-shape state struct as a JSON object
# (the v1 API takes a flat struct; the v2 twin below uses real MapState).
_PROFILE_STATE_SCHEMA = "n long, total string, type_counts string"


def _make_profile_fn():
    """Per-user profile accumulator (closure ⇒ cloudpickle serializes
    by value, same rationale as _make_session_fn_exact, whose exact
    decimal quantization it reuses verbatim: each event is quantized
    to 6 dp HALF_UP — Spark's double→DECIMAL(20,6) cast — so the total
    matches SUM(CAST(value AS DECIMAL(20,6))) bit-for-bit). The
    sentinel row sorts last (far-future event time); on seeing it the
    user's profile row flushes and state clears."""
    import decimal as _decimal
    import json as _json

    import pandas as _pd

    _Q6 = _decimal.Decimal("0.000001")

    def _dec6(value) -> _decimal.Decimal:
        return _decimal.Decimal(str(value)).quantize(
            _Q6, rounding=_decimal.ROUND_HALF_UP
        )

    def profile_fn(key, pdf_iter, state):
        (user_id,) = key
        rows = _pd.concat(list(pdf_iter)).sort_values(["ts_us", "event_id"])
        if state.exists:
            n, total_str, counts_json = state.get
            total = _decimal.Decimal(total_str)
            counts = _json.loads(counts_json)
        else:
            n, total, counts = 0, _decimal.Decimal(0), {}
        flush = False
        for et, value in zip(rows["event_type"], rows["value"]):
            if et == "__sentinel__":
                flush = True
                continue
            n += 1
            total += _dec6(value)
            counts[et] = counts.get(et, 0) + 1
        if flush:
            top = (
                sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
                if counts
                else None
            )
            state.remove()
            yield _pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value": [float(total)],
                    "n_types": [len(counts)],
                    "top_type": [top],
                }
            )
        else:
            state.update((n, str(total), _json.dumps(counts, sort_keys=True)))

    return profile_fn


def user_profile_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lifetime profile (n_events, exact-decimal total, modal
    event type) maintained by a custom stateful operator and flushed by
    the per-user sentinel — the streaming materialization of a
    "customer 360" table. Hash-checked against the plain batch GROUP BY
    oracle. State is O(users)·O(types) and sharded by user hash across
    the state store at scale."""
    src_dir, stream = _sentinel_source(spark, sf_dir)
    events = stream.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_id",
        "event_type",
        "value",
    )
    result = events.groupBy("user_id").applyInPandasWithState(
        _make_profile_fn(),
        outputStructType=_PROFILE_OUT_SCHEMA,
        stateStructType=_PROFILE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = _run_to_memory(result, "append")
    shutil.rmtree(src_dir, ignore_errors=True)
    return out.orderBy("user_id")


def _protobuf_available() -> bool:
    """transformWithStateInPandas needs the protobuf wheel (its state
    API speaks protobuf to the JVM); absent in this runtime image."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def user_profile_transform_with_state(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The SAME per-user profile via Spark 4's transformWithState v2
    API (transformWithStateInPandas + StatefulProcessor): the running
    (n, exact-decimal total) pair lives in a ValueState and the
    per-type counts in a real MapState — the composite-state shape the
    v1 flat-struct API had to emulate with a JSON column — and the
    handles accept ttlDurationMs for processing-time state eviction
    (not used here: TTL is wall-clock-dependent, which would break the
    deterministic oracle). Requires the RocksDB state store provider
    and the protobuf wheel; the runtime image ships the JVM side but
    not protobuf, so this twin raises cleanly when unavailable
    (import-gated like sources/multimodal.py:decode_media) — the
    registered, oracle-checked form is user_profile_stream. Covered by
    tests/test_streaming.py: gating asserted always, parity with the
    v1 result asserted when protobuf exists."""
    if not _protobuf_available():
        raise NotImplementedError(
            "transformWithStateInPandas requires the protobuf package, "
            "not present in this runtime; use user_profile_stream "
            "(applyInPandasWithState) for the identical result"
        )
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class _ProfileProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._agg = handle.getValueState("agg", "n long, total string")
            self._types = handle.getMapState("types", "t string", "c long")

        def handleInputRows(self, key, rows, timer_values):
            import decimal as _decimal

            import pandas as _pd

            _q6 = _decimal.Decimal("0.000001")
            (user_id,) = key
            pdf = _pd.concat(list(rows)).sort_values(["ts_us", "event_id"])
            if self._agg.exists():
                n, total_str = self._agg.get()
                total = _decimal.Decimal(total_str)
            else:
                n, total = 0, _decimal.Decimal(0)
            flush = False
            for et, value in zip(pdf["event_type"], pdf["value"]):
                if et == "__sentinel__":
                    flush = True
                    continue
                n += 1
                total += _decimal.Decimal(str(value)).quantize(
                    _q6, rounding=_decimal.ROUND_HALF_UP
                )
                prev = (
                    self._types.getValue((et,))[0]
                    if self._types.containsKey((et,))
                    else 0
                )
                self._types.updateValue((et,), (prev + 1,))
            if flush:
                counts = [(k[0], v[0]) for k, v in self._types.iterator()]
                top = (
                    sorted(counts, key=lambda kv: (-kv[1], kv[0]))[0][0]
                    if counts
                    else None
                )
                self._agg.clear()
                self._types.clear()
                yield _pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "n_events": [n],
                        "total_value": [float(total)],
                        "n_types": [len(counts)],
                        "top_type": [top],
                    }
                )
            else:
                self._agg.update((n, str(total)))

        def close(self) -> None:
            pass

    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    src_dir = None
    # Everything after reading prev_provider sits inside the try: a
    # failure in the conf set, the sentinel-source build, or the run
    # must not leak the RocksDB override (or the scratch dir) into the
    # rest of the session.
    try:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        src_dir, stream = _sentinel_source(spark, sf_dir)
        events = stream.select(
            "user_id",
            F.unix_micros(F.col("ts")).alias("ts_us"),
            "event_id",
            "event_type",
            "value",
        )
        result = events.groupBy("user_id").transformWithStateInPandas(
            _ProfileProcessor(),
            outputStructType=_PROFILE_OUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
        out = _run_to_memory(result, "append")
    finally:
        if src_dir is not None:
            shutil.rmtree(src_dir, ignore_errors=True)
        if prev_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )
    return out.orderBy("user_id")


def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC enrichment join + aggregation: the events stream
    joined to the customer dimension (a plain batch DataFrame — no
    watermark, no state: the static side is re-read per microbatch and
    BROADCAST, the standard fact-stream × dim-table shape), then
    revenue rolled up per market segment × event type. Complete output
    mode emits the full aggregate on drain, which must equal the batch
    join+agg exactly. At 100 TB/day the dim side stays broadcast (or
    becomes a slowly-refreshed Delta snapshot) and the stream never
    shuffles for the join — only for the low-cardinality agg."""
    from sales_agent_graphdb_spark import catalog as _catalog

    events = stream_events(spark, sf_dir)
    dim = _catalog.load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = events.join(F.broadcast(dim), "user_id")
    agg = enriched.groupBy("c_mktsegment", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(20,6)"))
        .cast("double")
        .alias("total_value"),
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        F.col("c_mktsegment").alias("segment"),
        "event_type",
        "n_events",
        "total_value",
    ).orderBy("segment", "event_type")


# ---------------------------------------------------------------------------
# Custom stateful operator #2: per-user streaming EWMA — the streaming
# twin promised by queries/temporal.py:ts_ewma_per_user. State carries
# (n, ewma, seeded) per user; each micro-batch folds its rows in
# (ts, event_id) order starting from the carried value, so the result
# is the SAME left-to-right recursion as the batch in-plan fold and
# the DuckDB list_reduce — bit-exact across all three, because Python,
# the JVM and DuckDB all execute the identical IEEE double expression
# x*alpha + acc*(1-alpha) in the identical order.
# ---------------------------------------------------------------------------

EWMA_ALPHA = 0.3  # mirrors queries/temporal.py _EWMA_ALPHA

_EWMA_OUT_SCHEMA = "user_id long, n_events long, ewma double"
_EWMA_STATE_SCHEMA = "n bigint, ewma double, seeded int"


def _make_ewma_fn(alpha: float):
    """Self-contained closure (pickled by value to executors). The
    per-row Python loop is bounded by one user's events per batch —
    this is the custom-state path where the recursion itself is the
    point; the bulk math stays vectorized upstream."""
    beta = 1.0 - alpha

    def fn(key, pdf_iter, state):
        import pandas as pd

        if state.exists:
            n, ewma, seeded = state.get
            seeded = bool(seeded)
        else:
            n, ewma, seeded = 0, 0.0, False
        parts = [pdf for pdf in pdf_iter if len(pdf)]
        if parts:
            df = pd.concat(parts).sort_values(["ts_us", "event_id"])
            for x in df["value"].to_numpy():
                x = float(x)
                ewma = x if not seeded else x * alpha + ewma * beta
                seeded = True
                n += 1
            state.update((n, float(ewma), 1 if seeded else 0))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "ewma": [float(ewma)]}
            )

    return fn


def ewma_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user cumulative EWMA from the stateful operator. Each
    invocation emits the user's running (n_events, ewma) as of that
    micro-batch; the post-aggregation keeps the row with the highest
    n_events per user (the latest state), so the result is correct
    whatever the source's batch split. On the bounded availableNow
    drain this equals the batch ts_ewma_per_user exactly."""
    events = stream_events(spark, sf_dir).select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_id",
        "value",
    )
    result = events.groupBy("user_id").applyInPandasWithState(
        _make_ewma_fn(EWMA_ALPHA),
        outputStructType=_EWMA_OUT_SCHEMA,
        stateStructType=_EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = _run_to_memory(result, "append")
    return (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.expr("max_by(ewma, n_events)").alias("ewma"),
        )
        .orderBy("user_id")
    )


def scd2_enrich_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream × SCD2-dimension TEMPORAL enrichment: each streamed event
    is enriched with the dimension version in force AT EVENT TIME (not
    the current one — the mistake a plain stream-static join bakes in
    when dimensions change under a long-running stream). Per
    microbatch, foreachBatch applies the union-tag-window as-of form
    (queries/temporal.py:join_scd2_asof) against the FULL version
    history: correct regardless of how events split across batches,
    because each event's as-of lookup depends only on (event, history),
    never on other events. Batch results land in per-batch_id
    partition dirs (overwrite => idempotent under foreachBatch's
    at-least-once replay), and the drained union must equal the
    one-shot batch as-of join, which the shared oracle hash-checks.

    At 100 TB/day the history frame is dimension-sized (broadcastable;
    a real deployment snapshots it per batch from the SCD2 table), and
    per-batch cost is O(batch + |hist slice|) with ONE user-key
    shuffle — no unbounded stream-join state, which is what makes the
    temporal join viable in a stream at all."""
    from pyspark.sql import Window as W

    from sales_agent_graphdb_spark.queries.temporal import scd2_history

    run_id = uuid.uuid4().hex[:12]
    src_dir = os.path.join(SCRATCH, f"scd2e_src_{run_id}")
    out_dir = os.path.join(SCRATCH, f"scd2e_out_{run_id}")

    from sales_agent_graphdb_spark import catalog as _catalog

    ev = _catalog.load_table(spark, sf_dir, "events")
    ev.repartition(3).write.mode("overwrite").parquet(src_dir)
    batch_schema = spark.read.parquet(src_dir).schema

    hist = scd2_history(spark, sf_dir).localCheckpoint(eager=True)

    def enrich(batch_df, batch_id):  # noqa: ANN001
        side0 = hist.select(
            "user_id",
            "ts",
            F.lit(0).alias("side"),
            "seg",
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("string").alias("event_type"),
            F.lit(None).cast("double").alias("value"),
        )
        side1 = batch_df.select(
            "user_id",
            "ts",
            F.lit(1).alias("side"),
            F.lit(None).cast("string").alias("seg"),
            "event_id",
            "event_type",
            "value",
        )
        w = (
            W.partitionBy("user_id")
            .orderBy("ts", "side", "event_id")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        enriched = (
            side0.unionByName(side1)
            .select(
                "side",
                "event_type",
                "value",
                F.last("seg", ignorenulls=True).over(w).alias("seg_at"),
            )
            .filter(F.col("side") == 1)
            .select("seg_at", "event_type", "value")
        )
        # Idempotent per-batch landing: overwrite of this batch's own
        # partition dir; an at-least-once redelivery rewrites the same
        # bytes instead of appending duplicates.
        enriched.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    stream = (
        spark.readStream.schema(batch_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/*.parquet")
    )
    ckpt = os.path.join(SCRATCH, f"ckpt_scd2e_{run_id}")
    q = (
        stream.writeStream.foreachBatch(enrich)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = (
        spark.read.parquet(os.path.join(out_dir, "*"))
        .groupBy(F.col("seg_at").alias("segment"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("segment", "event_type")
    )
    out = spark.createDataFrame(out.collect(), schema=out.schema)
    shutil.rmtree(src_dir, ignore_errors=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# Streaming KMV sketch maintenance — the stream twin of
# agg_kmv_incremental: each microbatch's k-row sketch folds into a
# standing k-row state table, so distinct-cardinality (and, via
# agg_kmv_intersection's estimator, audience overlap) stays queryable
# at any moment with O(k) state — no per-member state, no rescan.
# ---------------------------------------------------------------------------

_KMV_STREAM_K = 64
_KMV_STREAM_SALT = "kmv8"  # shared with queries/aggregates.py sketches
_KMV_STREAM_DENOM = 4503599627370496.0  # 2^52


def _kmv_h(col):  # noqa: ANN001, ANN202
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(col.cast("string"), F.lit(_KMV_STREAM_SALT))),
                1,
                13,
            ),
            16,
            10,
        ).cast("bigint")
        / F.lit(_KMV_STREAM_DENOM)
    )


def make_kmv_fold_sink(tbl_dir: str, applied_dir: str):  # noqa: ANN201
    """The foreachBatch fold of ``kmv_sketch_stream``, exposed as a
    factory so tests can drive replay directly. This keeps the simpler
    two-step protocol (table overwrite, THEN marker): a crash between
    the two re-applies the batch on retry, which is HARMLESS here —
    the union+distinct+k-min fold is idempotent, unlike the SUM/COUNT
    merge in ``make_upsert_sink``, which therefore publishes data and
    marker in one atomic rename. ``applied_dir`` MUST live outside
    ``tbl_dir`` (each batch's overwrite deletes tbl_dir wholesale —
    ADVICE r08; tests/test_streaming.py pins the class)."""

    def fold(batch_df, batch_id):  # noqa: ANN001
        marker = os.path.join(applied_dir, str(batch_id))
        if os.path.exists(marker):
            return  # idempotent replay
        batch_sk = (
            batch_df.select(_kmv_h(F.col("user_id")).alias("h"))
            .distinct()
            .orderBy("h")
            .limit(_KMV_STREAM_K)
        )
        if os.path.exists(os.path.join(tbl_dir, "_SUCCESS")):
            existing = batch_df.sparkSession.read.parquet(tbl_dir)
            merged = existing.unionByName(batch_sk)
        else:
            merged = batch_sk
        out = (
            merged.select("h")
            .distinct()
            .orderBy("h")
            .limit(_KMV_STREAM_K)
            .localCheckpoint(eager=True)  # detach from the table being overwritten
        )
        out.write.mode("overwrite").parquet(tbl_dir)
        os.makedirs(applied_dir, exist_ok=True)
        open(marker, "w").close()

    return fold


def kmv_sketch_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch KMV maintenance: 3 microbatches each build their
    own k-row sketch and FOLD it into the standing sketch table
    (read → union → distinct → k-min → overwrite, with the applied-
    batch idempotency markers of foreachbatch_upsert_stream). KMV
    mergeability (proved on data by agg_kmv_incremental) guarantees
    the drained state equals the sketch built directly from the full
    corpus — which the DuckDB oracle rebuilds, so the driver
    hash-checks the entire streaming fold. State is k rows REGARDLESS
    of stream length: at 100 TB this is the always-on distinct /
    overlap dashboard with O(k) memory per (segment, window)."""
    run_id = uuid.uuid4().hex[:12]
    src_dir = os.path.join(SCRATCH, f"kmv_src_{run_id}")
    tbl_dir = os.path.join(SCRATCH, f"kmv_tbl_{run_id}")
    # Idempotency markers live BESIDE the table, not inside it: each
    # batch's overwrite deletes tbl_dir wholesale, so a marker stored
    # within it would survive only for the latest batch and replay
    # protection would be vacuous (ADVICE r08) — correct results would
    # then rest on the KMV fold's idempotence alone instead of the
    # exactly-once contract this query demonstrates.
    applied_dir = os.path.join(SCRATCH, f"kmv_applied_{run_id}")

    from sales_agent_graphdb_spark import catalog as _catalog

    ev = _catalog.load_table(spark, sf_dir, "events")
    ev.select("user_id").repartition(3).write.mode("overwrite").parquet(src_dir)
    batch_schema = spark.read.parquet(src_dir).schema

    fold = make_kmv_fold_sink(tbl_dir, applied_dir)

    stream = (
        spark.readStream.schema(batch_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/*.parquet")
    )
    ckpt = os.path.join(SCRATCH, f"ckpt_kmv_{run_id}")
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sk = spark.read.parquet(tbl_dir)
    est = sk.agg(F.count(F.lit(1)).alias("m"), F.max("h").alias("kth"))
    exact = ev.agg(F.countDistinct("user_id").alias("exact_users"))
    union_est = F.when(
        F.col("m") < _KMV_STREAM_K, F.col("m").cast("double")
    ).otherwise(F.lit(float(_KMV_STREAM_K - 1)) / F.col("kth"))
    final = (
        est.crossJoin(F.broadcast(exact))
        .select(
            F.lit(_KMV_STREAM_K).alias("k"),
            "m",
            "exact_users",
            F.round(union_est, 6).alias("union_est"),
        )
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(src_dir, ignore_errors=True)
    shutil.rmtree(tbl_dir, ignore_errors=True)
    shutil.rmtree(applied_dir, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return final


_TOPK_STREAM_K = 3  # maintained leaderboard depth per event_type


def make_topk_fold_sink(tbl_root: str):  # noqa: ANN201
    """foreachBatch fold maintaining the EXACT top-k rows per
    event_type — the streaming leaderboard: each batch ranks itself,
    keeps its per-type top-k, merges with the standing k rows, and
    re-ranks (top-k selection is a semilattice: topk(topk(A) ∪
    topk(B)) = topk(A ∪ B), proved in the algebra the agg_kmv family
    uses). State is k·|types| rows regardless of stream length.

    Publication reuses make_upsert_sink's version-addressed atomic
    commit (second consumer of latest_committed_version): data and
    applied-batch marker are ONE directory renamed into place. This
    fold is additionally IDEMPOTENT (re-merging already-folded rows
    is a no-op under distinct+rank), so replay is doubly safe —
    by algebra and by marker."""
    from pyspark.sql.window import Window as W

    w = W.partitionBy("event_type").orderBy(F.col("v").desc(), "event_id")

    def fold(batch_df, batch_id):  # noqa: ANN001
        version_dir = os.path.join(tbl_root, f"v_{batch_id}")
        prev = latest_committed_version(tbl_root)
        if prev is not None and prev[0] >= batch_id:
            return  # applied: own marker or a newer one (post-prune replay)
        part = batch_df.select(
            "event_type",
            "event_id",
            F.col("value").cast("decimal(18,2)").alias("v"),
        )
        topb = (
            part.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= _TOPK_STREAM_K)
            .drop("rk")
        )
        if prev is not None:
            standing = batch_df.sparkSession.read.parquet(prev[1])
            merged = standing.unionByName(topb).dropDuplicates(
                ["event_type", "event_id"]
            )
        else:
            merged = topb
        out = (
            merged.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= _TOPK_STREAM_K)
            .drop("rk")
        )
        os.makedirs(tbl_root, exist_ok=True)
        build = os.path.join(tbl_root, f".build_{uuid.uuid4().hex[:12]}")
        out.write.mode("overwrite").parquet(build)
        try:
            os.rename(build, version_dir)
        except OSError:
            shutil.rmtree(build, ignore_errors=True)
            if os.path.exists(version_dir):
                return
            raise
        prune_versions(tbl_root)

    return fold


def topk_maintain_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming top-k leaderboard maintenance via foreachBatch: the
    events stream (3 microbatches) maintains the per-event_type top-3
    values table; after the drain the table must equal the one-shot
    batch top-k, which the driver hash-checks. At 100 TB this is the
    always-on 'largest transactions' dashboard — per-batch state is
    k·|types| rows, the merge is map-side trivial, and the version
    publish is the same atomic-rename commit as the SUM/COUNT upsert."""
    run_id = uuid.uuid4().hex[:12]
    src_dir = os.path.join(SCRATCH, f"topk_src_{run_id}")
    tbl_root = os.path.join(SCRATCH, f"topk_tbl_{run_id}")

    from sales_agent_graphdb_spark import catalog as _catalog

    ev = _catalog.load_table(spark, sf_dir, "events")
    ev.select("event_id", "event_type", "value").repartition(3).write.mode(
        "overwrite"
    ).parquet(src_dir)
    batch_schema = spark.read.parquet(src_dir).schema

    fold = make_topk_fold_sink(tbl_root)
    stream = (
        spark.readStream.schema(batch_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/*.parquet")
    )
    ckpt = os.path.join(SCRATCH, f"ckpt_topk_{run_id}")
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from pyspark.sql.window import Window as W

    current = latest_committed_version(tbl_root)
    assert current is not None, (
        f"no committed version under {tbl_root}: the drained stream "
        "produced zero batches"
    )
    w = W.partitionBy("event_type").orderBy(F.col("v").desc(), "event_id")
    final = (
        spark.read.parquet(current[1])
        .withColumn("rk", F.row_number().over(w))
        .select(
            "event_type",
            F.col("rk").cast("bigint").alias("rank"),
            "event_id",
            F.col("v").cast("double").alias("value"),
        )
        .orderBy("event_type", "rank")
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(src_dir, ignore_errors=True)
    shutil.rmtree(tbl_root, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return final
