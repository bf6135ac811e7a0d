"""sales_agent_graphdb_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference system ``SLTDigitalLab/sales_agent_graphdb``
(a FastAPI + LangGraph e-commerce agent over Neo4j / PostgreSQL /
ChromaDB / Redis), built Spark-first: every operator is declared with
the DataFrame / Spark SQL API so Catalyst + Tungsten pick the physical
plan, with Pandas-UDF fallbacks only where built-ins cannot express the
semantics (text chunking, multimodal decode).

Package layout:
  session    — SparkSession factory tuned for both local[32] tests and
               large-cluster deployment (AQE, adaptive shuffle, Arrow)
  catalog    — loaders for the testdata star schema + the derived
               reference-shaped views (products / categories / edges /
               customers / orders / order_items / chat_messages)
  registry   — query registry: name -> (spark_fn, oracle_sql)
  operators/ — reusable distributed operators (keyed merge, top-k,
               cosine/LSH similarity, fulltext scoring, sessionize,
               chunker, minhash/simhash dedup)
  functions/ — scalar expression kit (price regex, surrogate keys,
               normalization, tokenization, quality scores)
  sources/   — CSV/JSON dialect-aware readers, parquet catalog
  plans/     — deterministic query planners replacing the reference's
               LLM query generation (3-template graph planner, router)
  streaming/ — Structured Streaming pipelines over the events stream
  queries/   — the oracle-checked query inventory (SURVEY.md §2)
"""

__version__ = "0.1.0"
