"""Planning-layer queries (SURVEY.md §3.1–3.2 + P5): the deterministic
router, the NL→plan template dispatch, and the multi-stage fallback
matcher — each end-to-end and oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sales_agent_graphdb_spark import catalog
from sales_agent_graphdb_spark.operators import matcher
from sales_agent_graphdb_spark.plans import graph_planner, router
from sales_agent_graphdb_spark.registry import register


@register(
    "route_dispatch",
    oracle=f"""
    SELECT doc_id, {router.duckdb_route_sql("text")} AS route
    FROM documents ORDER BY doc_id
    """,
)
def route_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.1 stage 4 — the 6-way router as one codegen'd projection over
    a batch of 500 real questions (document texts): the deterministic
    equivalent of the reference's LLM dispatch (agent_graph.py:275-317).
    Word-boundary regex precedence must match the oracle exactly."""
    d = catalog.load_table(spark, sf_dir, "documents")
    return d.select("doc_id", router.route_col(F.col("text")).alias("route")).orderBy(
        "doc_id"
    )


_P5_QUERY = "widget red"  # no exact/substring hit => stage-3 fallback wins


@register(
    "p5_multistage_fallback",
    oracle=f"""
    WITH scored AS (
      SELECT p_partkey AS id, p_name AS name,
             {matcher.duckdb_stage_sql("p_name", _P5_QUERY)} AS match_stage
      FROM part),
    hit AS (SELECT * FROM scored WHERE match_stage IS NOT NULL)
    SELECT id, name, CAST(match_stage AS INT) AS match_stage FROM hit
    WHERE match_stage = (SELECT MIN(match_stage) FROM hit)
    ORDER BY id
    """,
)
def p5_multistage_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 — multi-stage fallback match (reference tools.py:31-85:
    exact → substring → two-word AND → one-word, first stage with rows
    wins). One scan + 1-row broadcast instead of four sequential
    queries; '{query}' forces the stage-3 branch."""
    p = catalog.products(spark, sf_dir).select("id", "name")
    hits = matcher.multistage_match(p, _P5_QUERY, name_col="name")
    return hits.select(
        "id", "name", F.col("match_stage").cast("int").alias("match_stage")
    ).orderBy("id")


@register(
    "nl2plan_category_browse",
    oracle="""
    SELECT CAST(p_partkey AS VARCHAR) AS sku, p_name AS name,
           p_retailprice AS price, p_brand AS category_name
    FROM part WHERE lower(p_brand) LIKE '%brand#13%'
    ORDER BY p_partkey LIMIT 10
    """,
)
def nl2plan_category_browse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.2 T2 — 'show me Brand#13 products' → core-noun extraction →
    category-browse template (join + contains filter + LIMIT 10), the
    deterministic form of the reference's LLM Cypher codegen
    (neo4j_service.py:72-73)."""
    plan = graph_planner.plan_for("show me Brand#13 products")
    assert plan.template == "category" and plan.param == "brand#13", plan
    return graph_planner.execute(spark, sf_dir, plan)


@register(
    "nl2plan_fuzzy_name",
    oracle="""
    WITH idx AS (
      SELECT DISTINCT CAST(p_partkey AS VARCHAR) AS id, t.token
      FROM part, unnest(string_split_regex(lower(p_name), '\\s+')) AS t(token)
      WHERE length(t.token) > 0),
    hits AS (
      SELECT id, MIN(levenshtein(token, 'widgit')) AS distance
      FROM idx
      WHERE length(token) BETWEEN 4 AND 8 AND levenshtein(token, 'widgit') <= 2
      GROUP BY id ORDER BY distance, id LIMIT 10)
    SELECT h.id AS sku, p.p_name AS name, p.p_retailprice AS price,
           CAST(h.distance AS INT) AS distance
    FROM hits h JOIN part p ON p.p_partkey = CAST(h.id AS BIGINT)
    ORDER BY distance, sku
    """,
)
def nl2plan_fuzzy_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.2 T1 — "a product named widgit" → fuzzy-name template
    (inverted index + levenshtein ≤ 2, LIMIT 10 — the Lucene `~` query
    at neo4j_service.py:71), then a join back for name/price per the
    prompt's projection rule."""
    plan = graph_planner.plan_for("a product named widgit")
    assert plan.template == "fuzzy_name" and plan.param == "widgit", plan
    return graph_planner.execute(spark, sf_dir, plan).withColumn(
        "distance", F.col("distance").cast("int")
    ).orderBy("distance", "sku")


@register(
    "nl2plan_broad_scan",
    oracle="""
    SELECT CAST(p_partkey AS VARCHAR) AS sku, p_name AS name,
           p_retailprice AS price
    FROM part ORDER BY p_partkey LIMIT 10
    """,
)
def nl2plan_broad_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.2 T3 — a question with no extractable noun → broad-scan
    template (project name/price, LIMIT 10 — neo4j_service.py:74)."""
    plan = graph_planner.plan_for("show me all of the")
    assert plan.template == "broad", plan
    return graph_planner.execute(spark, sf_dir, plan)
