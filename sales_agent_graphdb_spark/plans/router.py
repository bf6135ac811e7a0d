"""Deterministic 6-way router (SURVEY.md §3.1 stage 4).

The reference routes each question with an LLM emitting
``{reasoning, route}`` ∈ {graph_db, vector_db, order_form,
check_order_status, cancel_order, general}
(agent_graph.py:275-317), falling back to vector_db on parse failure
(agent_graph.py:301-303). Here the dispatch is a rule table — a
deterministic, oracle-testable equivalent (SURVEY.md §2.12: "the
router's 6-way dispatch → a dispatch function"). The rules mirror the
routing prompt's own criteria: order verbs → order routes, product/
price/category nouns → graph_db, content/social questions →
vector_db, else general.

Set-oriented form: ``route_col`` is a pure column expression (a
``when`` cascade over ``rlike`` tests), so routing a batch of N
questions is one codegen'd projection — no driver loop, no Python in
the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ROUTES = (
    "graph_db",
    "vector_db",
    "order_form",
    "check_order_status",
    "cancel_order",
    "general",
)

# (route, regex) — first match wins, mirroring the routing prompt's
# precedence (order intents before knowledge intents,
# agent_graph.py:283-299).
_RULES: tuple[tuple[str, str], ...] = (
    ("cancel_order", r"\bcancel\b"),
    ("check_order_status", r"\b(order status|status of my order|track|my orders?)\b"),
    ("order_form", r"\b(buy|purchase|order|add to cart|checkout)\b"),
    ("graph_db", r"\b(price|cost|how much|stock|category|categories|product|cheapest|expensive)\b"),
    ("vector_db", r"\b(post|review|article|about|tell me|what is|describe|facebook|tiktok)\b"),
)

_FALLBACK = "general"


def route_col(question: Column) -> Column:
    """Route for a question column: first-match-wins ``when`` cascade."""
    q = F.lower(question)
    expr: Column | None = None
    for route, pattern in _RULES:
        cond = q.rlike(pattern)
        expr = F.when(cond, route) if expr is None else expr.when(cond, route)
    assert expr is not None
    return expr.otherwise(F.lit(_FALLBACK))


def route(question: str) -> str:
    """Driver-side scalar form (single interactive question)."""
    import re

    q = question.lower()
    for r, pattern in _RULES:
        if re.search(pattern, q):
            return r
    return _FALLBACK


def duckdb_route_sql(question_expr: str) -> str:
    """The identical cascade as DuckDB SQL, for oracle parity."""
    clauses = "\n".join(
        f"WHEN regexp_matches(lower({question_expr}), '{pat}') THEN '{route}'"
        for route, pat in _RULES
    )
    return f"CASE {clauses} ELSE '{_FALLBACK}' END"
