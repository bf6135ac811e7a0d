"""Oracle-checked query inventory — importing this package registers
every query into sales_agent_graphdb_spark.registry."""

from sales_agent_graphdb_spark.queries import (  # noqa: F401
    aggregates,
    ann_search,
    curation,
    dedup,
    event_windows,
    features,
    graphq,
    ingestion,
    joins,
    multimodal_q,
    mutations,
    plans_nl,
    profiling,
    relational,
    scale_joins,
    scalar_fns,
    sources_io,
    streaming_exec,
    temporal,
    text,
    tpch,
    vector,
    windows,
)
