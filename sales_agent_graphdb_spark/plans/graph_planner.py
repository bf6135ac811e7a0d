"""NL→plan template dispatch (SURVEY.md §3.2 — the "query compiler").

The reference compiles questions to Cypher with an LLM prompt that
hardcodes exactly three query templates (neo4j_service.py:71-74):

  T1 fuzzy product-name:  CALL db.index.fulltext.queryNodes(
                          "product_name_index", "<term>~") LIMIT 10
  T2 category browse:     MATCH (p)-[:IN_CATEGORY]->(c)
                          WHERE toLower(c.name) CONTAINS toLower($kw)
                          RETURN p.name, p.price, p.url LIMIT 10
  T3 broad scan:          MATCH (p:Product)
                          RETURN p.name, p.price, p.url LIMIT 10

plus prompt rules: extract the core category noun, always project
name/price/url, always LIMIT 10. Here the "compiler" is a
deterministic classifier + parameter extractor mapping a question to
one of three parameterized DataFrame plans — template dispatch
replaces LLM codegen (SURVEY.md §3.2), so the whole pipeline is
oracle-testable.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sales_agent_graphdb_spark import catalog
from sales_agent_graphdb_spark.operators import fulltext

LIMIT = 10  # every generated query caps at 10 (neo4j_service.py:71-74)

# Words the core-noun extractor drops (the prompt's "extract the core
# category noun" rule, neo4j_service.py:73).
_STOP = frozenset(
    "a an the any some show me all list of in for products product "
    "category categories what which do you have".split()
)


@dataclass(frozen=True)
class GraphPlan:
    template: str  # 'fuzzy_name' | 'category' | 'broad'
    param: str | None


def extract_core_noun(question: str) -> str | None:
    """Last non-stopword token, lowercased and stripped of punctuation —
    the deterministic stand-in for the prompt's noun extraction."""
    tokens = [re.sub(r"[^a-z0-9#]", "", w) for w in question.lower().split()]
    content = [t for t in tokens if t and t not in _STOP]
    return content[-1] if content else None


def plan_for(question: str) -> GraphPlan:
    """Classify a question into one of the three templates:
    quoted/'named'/'called' → fuzzy name; a surviving core noun →
    category browse; else broad scan."""
    # Same-quote pairs only, and single quotes must be word-delimited —
    # a contraction apostrophe ("what's ... isn't") must not read as a
    # quoted product name (review r03: the old ['\"]...['\"]  class
    # paired the two apostrophes and produced a garbage fuzzy term).
    m = re.search(
        r""""([^"]+)"|(?:^|\s)'([^']+)'(?=\s|$|[?.!,;:])|named (\S+)|called (\S+)""",
        question,
    )
    if m:
        term = next(g for g in m.groups() if g)
        return GraphPlan("fuzzy_name", term.strip().lower())
    noun = extract_core_noun(question)
    if noun:
        return GraphPlan("category", noun)
    return GraphPlan("broad", None)


def execute(spark: SparkSession, sf_dir: str, plan: GraphPlan) -> DataFrame:
    """Run a plan. All three templates project (name, price) + key and
    cap at LIMIT 10, mirroring the prompt's projection rule."""
    prods = catalog.products(spark, sf_dir)
    if plan.template == "fuzzy_name":
        idx = fulltext.inverted_index(prods, text_col="name", id_col="sku")
        hits = fulltext.fuzzy_search(idx, plan.param or "", max_distance=2, k=LIMIT)
        return (
            hits.join(prods, hits.id == prods.sku)
            .select("sku", "name", "price", "distance")
            .orderBy("distance", F.col("sku").cast("bigint"))
            .limit(LIMIT)
        )
    if plan.template == "category":
        edges = catalog.in_category(spark, sf_dir)
        kw = (plan.param or "").lower()
        return (
            prods.join(edges, "sku")
            .filter(F.lower(F.col("category_name")).contains(kw))
            .select("sku", "name", "price", "category_name")
            .orderBy(F.col("sku").cast("bigint"))
            .limit(LIMIT)
        )
    return (
        prods.select("sku", "name", "price")
        .orderBy(F.col("sku").cast("bigint"))
        .limit(LIMIT)
    )


def answer(spark: SparkSession, sf_dir: str, question: str) -> DataFrame:
    """question → plan → DataFrame (the full §3.2 pipeline)."""
    return execute(spark, sf_dir, plan_for(question))
