"""Local mirror of the driver's correctness gate: run every registered
Spark query and its DuckDB oracle on the same parquet, compare
row-count + column names + exact values (rows sorted, columns sorted by
name) — stricter than a hash, so anything that would hash-mismatch
fails here first.
"""

from __future__ import annotations

import math

import pytest

from sales_agent_graphdb_spark.registry import all_queries
from tests.conftest import SF_SMALL, duck_with_views

QUERIES = all_queries()


def normalize(rows, columns):
    """Sort columns by name, stringify values canonically, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def canon(v):
        if v is None:
            return "\x00NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(v)
        if isinstance(v, bool):
            return str(v)
        return str(v)

    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return [columns[i] for i in order], out


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    spec = QUERIES[name]
    sdf = spec.fn(spark, SF_SMALL)

    # Registry-wide scalar-output sweep (VERDICT r07 #2, r08 #1): the
    # driver canonicalizes through pandas sort_values/factorize, which
    # throws on array/map/struct cells (r07's red row:
    # `ann_filtered_ivf_topk` emitting array<long>) and DIVERGES on
    # DECIMAL (r08's red row: `sql_api_lateral_column_alias` — Spark
    # toPandas() keeps Decimal objects, DuckDB fetchdf() converts to
    # float64) and BINARY (bytes vs bytearray) outputs. Every
    # registered query must present a top-level schema of the
    # certified-safe scalar types only (bool/int/float/str/date/
    # timestamp — pinned by tests/test_type_parity.py).
    from pyspark.sql.types import (
        ArrayType,
        BinaryType,
        DecimalType,
        MapType,
        StructType,
    )

    bad = [
        f.name
        for f in sdf.schema.fields
        if isinstance(
            f.dataType, (ArrayType, MapType, StructType, DecimalType, BinaryType)
        )
    ]
    assert not bad, (
        f"{name}: driver-unsafe output columns {bad} — arrays/maps/structs "
        "break the driver's pandas canonicalizer; DECIMAL/BINARY hash "
        "differently between Spark toPandas() and DuckDB fetchdf() "
        "(scalarize with concat_ws/to_json; CAST decimals to DOUBLE; "
        "hex-encode binary)"
    )

    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)

    if spec.oracle is None:
        # rows-only, mirroring the driver's weaker gate — but every
        # oracle-less query in this registry (ANN top-k, planted-dup
        # pair/cluster perf paths) must return SOMETHING at sf0.001; an
        # empty result means the operator silently broke.
        assert scols, f"{name}: no output columns"
        assert srows, f"{name}: rows-only query returned no rows"
        return

    cur = duck_with_views(duck, SF_SMALL)
    res = cur.execute(spec.oracle)
    ocols = [d[0] for d in res.description]
    orows = [tuple(r) for r in res.fetchall()]

    assert len(srows) == len(orows), f"{name}: rowcount {len(srows)} != oracle {len(orows)}"
    ncols_s, nrows_s = normalize(srows, scols)
    ncols_o, nrows_o = normalize(orows, ocols)
    assert ncols_s == ncols_o, f"{name}: columns {ncols_s} != oracle {ncols_o}"
    mismatches = [
        (a, b) for a, b in zip(nrows_s, nrows_o) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first: {mismatches[0]}"
