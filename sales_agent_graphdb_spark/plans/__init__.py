"""Query planning layer (SURVEY.md §3.1–3.2): the deterministic
re-expression of the reference's LLM-driven routing and NL→Cypher
template dispatch."""
