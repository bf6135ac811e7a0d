"""Oracle-checked query inventory — importing this package registers
every query into sales_agent_graphdb_spark.registry."""

from sales_agent_graphdb_spark.queries import (  # noqa: F401
    aggregates,
    joins,
    relational,
    scalar_fns,
    windows,
)
