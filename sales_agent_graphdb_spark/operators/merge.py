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


def table_diff(
    a: DataFrame,
    b: DataFrame,
    key: str,
    compare_cols: Sequence[str],
) -> DataFrame:
    """Snapshot reconciliation: classify every business key as
    ``added`` (only in ``b``), ``removed`` (only in ``a``), or
    ``changed`` (present in both, any compare column null-safe
    different) — the table-diff primitive behind data validation,
    CDC backfill checks, and migration sign-off. Unchanged keys are
    dropped.

    One full-outer equi-join on the key; the per-column null-safe
    comparison is a codegen'd projection. At 100 TB both snapshots are
    bucketed by the key, so the join co-locates without an exchange;
    output size tracks the CHANGE volume, not table size. Returns
    (key, change, <col>_old, <col>_new ...). Assumes the key is unique
    within each snapshot (the reconciliation contract); duplicate keys
    would cross-product inside the join rather than error."""
    if not compare_cols:
        raise ValueError("table_diff: compare_cols must be non-empty")
    # Presence markers, NOT key-null checks: the null-safe join matches a
    # NULL key on both sides, where testing a.key.isNotNull() would
    # misread the matched row as absent-from-a ('added').
    aa = a.select(key, *compare_cols, F.lit(True).alias("_in_a")).alias("a")
    bb = b.select(key, *compare_cols, F.lit(True).alias("_in_b")).alias("b")
    joined = aa.join(bb, F.col(f"a.{key}").eqNullSafe(F.col(f"b.{key}")), "full_outer")
    in_a = F.col("a._in_a").isNotNull()
    in_b = F.col("b._in_b").isNotNull()
    same = None
    for c in compare_cols:
        eq = F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
        same = eq if same is None else (same & eq)
    change = (
        F.when(~in_a, F.lit("added"))
        .when(~in_b, F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    out_cols = [
        F.coalesce(F.col(f"a.{key}"), F.col(f"b.{key}")).alias(key),
        change.alias("change"),
    ]
    for c in compare_cols:
        out_cols.append(F.col(f"a.{c}").alias(f"{c}_old"))
        out_cols.append(F.col(f"b.{c}").alias(f"{c}_new"))
    return joined.filter(change.isNotNull()).select(*out_cols)
