"""Keyed-merge operators (SURVEY.md §2.10 G1-G3, §2.11 M1-M5).

The reference mutates row-at-a-time (per-row Cypher MERGE at
neo4j_service.py:131-143, ORM upserts at db_service.py:164-195). Batch
Spark semantics: a mutation is a pure function old-table → new-table,
implemented with anti-joins + unions so it is deterministic,
idempotent (property-tested), and shuffle-minimal (one hash join on
the key). On a real deployment these write through a transactional
table format's MERGE INTO; the logical plan is identical.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_create_only(existing: DataFrame, new: DataFrame, key: str | Sequence[str]) -> DataFrame:
    """G1 — MERGE ... ON CREATE SET: existing rows win; only
    genuinely-new keys are inserted (neo4j_service.py:113-146)."""
    keys = [key] if isinstance(key, str) else list(key)
    inserts = new.join(existing.select(*keys), keys, "left_anti")
    return existing.unionByName(inserts)


def merge_overwrite(existing: DataFrame, new: DataFrame, key: str | Sequence[str]) -> DataFrame:
    """G2/V3 — MERGE ... SET: new rows win on key collision
    (neo4j_service.py:256-303 admin sync)."""
    keys = [key] if isinstance(key, str) else list(key)
    kept = existing.join(new.select(*keys), keys, "left_anti")
    return kept.unionByName(new)


def delete_by_key(table: DataFrame, keys_df: DataFrame, key: str | Sequence[str]) -> DataFrame:
    """G3/J7 — DETACH DELETE / delete-by-sku as a left-anti rewrite
    (neo4j_service.py:305-323, db_service.py:120-128)."""
    keys = [key] if isinstance(key, str) else list(key)
    return table.join(keys_df.select(*keys), keys, "left_anti")
