"""Feature-engineering extensions over the fact tables.

The reference has no feature-prep surface at all (SURVEY §2.4/§2.5
record only plain aggregates and no windows); these are the column
statistics a training pipeline computes over 100 TB fact data before
model input: robust clipping (winsorization) and exact correlation
matrices. Both follow the repo's exact-moment technique
(feature_zscore_stats, aggregates.py): all data-sized sums are exact
DECIMAL arithmetic, the closed-form statistic is then evaluated in
doubles over an identical expression tree on both engines, with a
final 6-dp round absorbing the engines' one-ulp DECIMAL→DOUBLE
conversion drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from sales_agent_graphdb_spark import catalog
from sales_agent_graphdb_spark.registry import register


@register(
    "feature_winsorize",
    oracle="""
    WITH r AS (
      SELECT l_returnflag, l_extendedprice AS v,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem),
    cuts AS (
      SELECT l_returnflag,
             CAST(MAX(n) AS BIGINT) AS n_rows,
             MIN(CASE WHEN rn = CAST(ceil(n * 0.01) AS BIGINT) THEN v END) AS lo_cut,
             MIN(CASE WHEN rn = CAST(ceil(n * 0.99) AS BIGINT) THEN v END) AS hi_cut
      FROM r GROUP BY l_returnflag),
    clipped AS (
      SELECT l.l_returnflag, c.n_rows, c.lo_cut, c.hi_cut,
             CASE WHEN l.l_extendedprice < c.lo_cut THEN c.lo_cut
                  WHEN l.l_extendedprice > c.hi_cut THEN c.hi_cut
                  ELSE l.l_extendedprice END AS cv,
             CAST(l.l_extendedprice < c.lo_cut AS BIGINT) AS is_lo,
             CAST(l.l_extendedprice > c.hi_cut AS BIGINT) AS is_hi
      FROM lineitem l JOIN cuts c ON l.l_returnflag = c.l_returnflag)
    SELECT l_returnflag,
           CAST(MAX(n_rows) AS BIGINT) AS n_rows,
           MAX(lo_cut) AS lo_cut, MAX(hi_cut) AS hi_cut,
           CAST(SUM(is_lo) AS BIGINT) AS n_clipped_low,
           CAST(SUM(is_hi) AS BIGINT) AS n_clipped_high,
           ROUND(CAST(SUM(CAST(cv AS DECIMAL(20,6))) AS DOUBLE) / MAX(n_rows), 6)
             AS mean_winsorized
    FROM clipped GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def feature_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust clipping (winsorization at p01/p99) — the outlier
    treatment applied to numeric features before training. Two passes:
    (1) EXACT cut values per group by position-pick (rank within the
    (group, value) window; value-at-rank is deterministic under ties
    because tied ranks hold the same value), (2) the tiny cuts frame
    (one row per group) broadcast back onto the fact scan, clip, and an
    exact-DECIMAL mean of the clipped column. The second pass is
    map-side-combinable; only pass 1 sorts, sharded by group — the
    100 TB degradation path is the same GK-sketch cut as
    pct_approx_value, verified here in its exact form."""
    li = catalog.load_table(spark, sf_dir, "lineitem")
    wr = W.partitionBy("l_returnflag").orderBy("l_extendedprice")
    wn = W.partitionBy("l_returnflag")
    r = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )

    def pick(p: float, alias: str):
        pos = F.ceil(F.col("n") * F.lit(p)).cast("long")
        return F.min(F.when(F.col("rn") == pos, F.col("v"))).alias(alias)

    cuts = r.groupBy("l_returnflag").agg(
        F.max("n").alias("n_rows"), pick(0.01, "lo_cut"), pick(0.99, "hi_cut")
    )
    j = li.join(F.broadcast(cuts), "l_returnflag")
    cv = (
        F.when(F.col("l_extendedprice") < F.col("lo_cut"), F.col("lo_cut"))
        .when(F.col("l_extendedprice") > F.col("hi_cut"), F.col("hi_cut"))
        .otherwise(F.col("l_extendedprice"))
    )
    return (
        j.groupBy("l_returnflag")
        .agg(
            F.max("n_rows").alias("n_rows"),
            F.max("lo_cut").alias("lo_cut"),
            F.max("hi_cut").alias("hi_cut"),
            F.sum((F.col("l_extendedprice") < F.col("lo_cut")).cast("long")).alias(
                "n_clipped_low"
            ),
            F.sum((F.col("l_extendedprice") > F.col("hi_cut")).cast("long")).alias(
                "n_clipped_high"
            ),
            F.round(
                F.sum(cv.cast("decimal(20,6)")).cast("double") / F.max("n_rows"), 6
            ).alias("mean_winsorized"),
        )
        .orderBy("l_returnflag")
    )


# The three lineitem measure pairs whose linear relationship a feature
# audit checks. Declared once; the oracle below is generated from the
# same list so the two sides cannot drift.
_CORR_PAIRS = [
    ("l_quantity", "l_extendedprice"),
    ("l_quantity", "l_discount"),
    ("l_extendedprice", "l_discount"),
]


def _corr_pair_sql(x: str, y: str) -> str:
    return f"""
    SELECT '{x}' AS col_x, '{y}' AS col_y,
           ROUND((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
             AS corr
    FROM (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST({x} AS DECIMAL(19,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST({y} AS DECIMAL(19,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST({x} AS DECIMAL(19,6)) * CAST({x} AS DECIMAL(19,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST({y} AS DECIMAL(19,6)) * CAST({y} AS DECIMAL(19,6))) AS DOUBLE) AS syy,
             CAST(SUM(CAST({x} AS DECIMAL(19,6)) * CAST({y} AS DECIMAL(19,6))) AS DOUBLE) AS sxy
      FROM lineitem)
    """


@register(
    "feature_correlation",
    oracle=" UNION ALL ".join(
        _corr_pair_sql(x, y) for x, y in _CORR_PAIRS
    )
    + " ORDER BY col_x, col_y",
)
def feature_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Pearson correlation matrix (long form) over lineitem
    measure pairs — the feature-audit primitive that catches redundant
    or leaking features before training. Spark's built-in ``corr`` is
    a streaming co-moment kernel whose intermediate rounding is
    engine-specific; the portable form is the five EXACT DECIMAL power
    sums per pair (one map-side-combinable pass over the fact scan for
    ALL pairs together), then the closed-form correlation in doubles
    with an identical expression tree, rounded to 6 dp (the
    feature_zscore_stats technique). The result is |pairs| rows from a
    single scan — no shuffle grows with the data."""
    li = catalog.load_table(spark, sf_dir, "lineitem")

    def d6(c: str):
        return F.col(c).cast("decimal(19,6)")

    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for x, y in _CORR_PAIRS:
        tag = f"{x}__{y}"
        aggs += [
            F.sum(d6(x)).cast("double").alias(f"sx_{tag}"),
            F.sum(d6(y)).cast("double").alias(f"sy_{tag}"),
            F.sum(d6(x) * d6(x)).cast("double").alias(f"sxx_{tag}"),
            F.sum(d6(y) * d6(y)).cast("double").alias(f"syy_{tag}"),
            F.sum(d6(x) * d6(y)).cast("double").alias(f"sxy_{tag}"),
        ]
    m = li.agg(*aggs)

    # One row of moments -> |pairs| result rows via inline(array<struct>):
    # the fact table is scanned exactly once for the whole matrix.
    def corr_struct(x: str, y: str):
        tag = f"{x}__{y}"
        n = F.col("n")
        sx, sy = F.col(f"sx_{tag}"), F.col(f"sy_{tag}")
        sxx, syy, sxy = F.col(f"sxx_{tag}"), F.col(f"syy_{tag}"), F.col(f"sxy_{tag}")
        return F.struct(
            F.lit(x).alias("col_x"),
            F.lit(y).alias("col_y"),
            F.round(
                (n * sxy - sx * sy)
                / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
                6,
            ).alias("corr"),
        )

    return m.select(
        F.inline(F.array(*[corr_struct(x, y) for x, y in _CORR_PAIRS]))
    ).orderBy("col_x", "col_y")

# Robust outlier stats: median / MAD / modified z-score flags. The
# classic robust alternative to mean/stddev z-scores
# (feature_zscore_stats, anomaly_rolling_zscore): a handful of extreme
# values cannot move the median or the MAD, so the threshold stays
# meaningful under contamination — exactly the property a data-quality
# gate needs on raw event streams. 1.4826 is the standard
# normal-consistency constant (modified z = 0.6745*(x-med)/MAD; flag
# at |z| > 3.5 <=> |x-med| > 3.5*1.4826*MAD). Both medians are
# percentile_disc / quantile_disc — a DISCRETE pick of an actual data
# value (no interpolation arithmetic), which the two engines resolve
# identically (verified: lower-middle at even counts), so every double
# in the comparison chain is bit-shared.
_MAD_K = 1.4826
_MAD_CUT = 3.5

_MAD_SQL = """
    WITH m AS (
      SELECT event_type, {pdisc_value} AS med
      FROM {ev} GROUP BY event_type),
    d AS (
      SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS dev
      FROM {ev} e JOIN m USING (event_type)),
    s AS (
      SELECT event_type, any_value(med) AS med, {pdisc_dev} AS mad
      FROM d GROUP BY event_type)
    SELECT d.event_type,
           CAST(any_value(s.med) AS DOUBLE) AS med,
           CAST(any_value(s.mad) AS DOUBLE) AS mad,
           CAST(SUM(CASE WHEN d.dev > {cut} * {k} * s.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM d JOIN s USING (event_type)
    GROUP BY d.event_type ORDER BY d.event_type
"""


@register(
    "anomaly_mad_robust_z",
    oracle=_MAD_SQL.format(
        ev="events",
        pdisc_value="quantile_disc(value, 0.5)",
        pdisc_dev="quantile_disc(dev, 0.5)",
        cut=_MAD_CUT,
        k=_MAD_K,
    ),
)
def anomaly_mad_robust_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type robust outlier profile (see the _MAD_K comment):
    median, MAD, and the count of modified-z outliers at the standard
    3.5 cut. Three grouped passes over the fact (median, MAD over
    deviations, flag count), each a per-type aggregate; the 5-row
    med/MAD frames broadcast back onto the fact. Scale note: EXACT
    percentile_disc buffers a group's values in its aggregate state —
    this operator is the family's exactness anchor; at 100 TB the
    same shape runs on approx_percentile or the equi-depth histogram
    (agg_equidepth_histogram), trading the bit-exact median for fixed
    memory, and the flag-count pass is unchanged."""
    catalog.load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "mad_events"
    )
    return spark.sql(
        _MAD_SQL.format(
            ev="mad_events",
            pdisc_value=(
                "percentile_disc(0.5) WITHIN GROUP (ORDER BY value)"
            ),
            pdisc_dev="percentile_disc(0.5) WITHIN GROUP (ORDER BY dev)",
            cut=_MAD_CUT,
            k=_MAD_K,
        )
    )
