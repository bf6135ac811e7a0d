"""Two-pass GLOBAL prefix sum — the scale-out form of
``SUM(x) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)``.

A global ordered window in Spark degrades to a single partition (the
self-flagged weakness of w5_ntile_buckets); this operator computes the
identical result with no single-partition stage:

1. range-repartition by the order key (partitions hold disjoint,
   ordered key ranges) and materialize ONCE (localCheckpoint) so every
   consumer sees the same physical partitioning;
2. local pass: per-partition running sum (window partitioned by
   ``spark_partition_id()`` — each partition sorts independently);
3. offset pass: per-partition totals (one tiny row per partition)
   get an EXCLUSIVE running sum over the partition-id order — an
   n_partitions-row frame, broadcast back — and every row adds its
   partition's offset.

The output is independent of where the range boundaries land (integer
arithmetic, disjoint ranges), so the result is deterministic even
though the boundaries are sampled.

Cost note: the checkpoint erases the range partitioning's clustering
info, so the _pid-partitioned window re-shuffles by _pid — two
balanced full-data exchanges total (range + hash) plus the
O(n_partitions) side plan. That is still the right trade at 100 TB:
the alternative is ONE exchange into a SINGLE partition (the
w5_ntile_buckets degenerate shape), which serializes the entire
dataset through one task. Eliminating the second exchange would take
a mapInPandas/mapPartitions local pass; kept as the documented
follow-up if the extra shuffle ever shows up in a profile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global running sum of ``value_col`` in ``order_col`` order
    (order key must be unique — it defines a total order). Returns the
    input columns plus ``out_col``."""
    reserved = {"_pid", "_local", "_ptotal", "_offset"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"global_prefix_sum: input columns collide with internal names {sorted(clash)}"
        )
    if num_partitions is None:
        conf = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        num_partitions = int(conf) if str(conf).isdigit() else 32  # "auto" etc.
    ranged = (
        df.repartitionByRange(num_partitions, F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("_local", F.sum(value_col).over(w_local))
    # Exclusive prefix over the per-partition totals: n_partitions rows,
    # a driver-scale frame regardless of data size.
    offsets = (
        ranged.groupBy("_pid")
        .agg(F.sum(value_col).alias("_ptotal"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_ptotal").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_offset")
    )
    out = (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_local") + F.col("_offset")))
        .drop("_pid", "_local", "_offset")
    )
    return out
