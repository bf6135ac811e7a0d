"""Oracle-checked query inventory — importing this package registers
every query into sales_agent_graphdb_spark.registry."""

from sales_agent_graphdb_spark.queries import (  # noqa: F401
    aggregates,
    dedup,
    event_windows,
    graphq,
    joins,
    mutations,
    relational,
    scalar_fns,
    text,
    vector,
    windows,
)
