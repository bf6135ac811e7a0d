from sales_agent_graphdb_spark.functions.scalar import (  # noqa: F401
    money,
    money_sum,
    normalize_alnum,
    surrogate_sku,
)
