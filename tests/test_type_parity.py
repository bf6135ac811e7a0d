"""Scalar-type canonicalization parity (VERDICT r08 #2).

The real driver compares Spark and DuckDB results through PANDAS
(``toPandas()`` vs ``fetchdf()``, then sort/factorize/hash), while the
local simulation (tools/driver_protocol.vhash) compares
``collect()``/``fetchall()`` tuples by ``repr``. Twice now a type has
passed the tuple path and failed the pandas path (r07: array cells;
r08: Decimal cells). This module closes the class for every
pandas-representable scalar type at once:

- it runs ONE probe row of every scalar type through BOTH engines'
  pandas materialization and records which types converge;
- asserts the certified-SAFE set (bool / int32 / int64 / float32 /
  float64 / string / timestamp) converges bit-for-bit;
- asserts every type measured DIVERGENT is covered by the bans in
  tools/driver_protocol.vhash (cell level) and
  tests/test_oracle_parity.py (schema level) — so the simulation can
  never be more permissive than the driver for any scalar type;
- DATE is a measured special case: the naive reprs differ
  (datetime.date vs pandas Timestamp) yet the REAL driver hashes date
  outputs green (w10_gaps_islands_streak carries a DATE streak_start
  and its CORRECTNESS_r08 row is hash-green; w9's day column likewise
  since r05), because both canonicalize to the same midnight instant.
  We pin the weaker invariant both engines do satisfy: identical
  (year, month, day) ordinals.
"""

from __future__ import annotations

import decimal

import pytest

_SQL_SPARK = """
  SELECT CAST(1 AS BIGINT)  AS t_i64,
         CAST(1 AS INT)     AS t_i32,
         CAST(1.5 AS DOUBLE) AS t_f64,
         CAST(1.5 AS FLOAT)  AS t_f32,
         'x'  AS t_str,
         TRUE AS t_bool,
         DATE'2024-02-29' AS t_date,
         TIMESTAMP'2024-02-29 12:34:56.789' AS t_ts,
         CAST('ab' AS BINARY) AS t_bin,
         CAST(5647.3130 AS DECIMAL(23,4)) AS t_dec
"""
# DuckDB spells BINARY as BLOB; everything else is shared syntax.
_SQL_DUCK = _SQL_SPARK.replace("AS BINARY", "AS BLOB")

SAFE = {"t_i64", "t_i32", "t_f64", "t_f32", "t_str", "t_bool", "t_ts"}
# Divergent through pandas; banned at schema level (test_oracle_parity)
# and cell level (driver_protocol.vhash).
BANNED = {"t_dec", "t_bin"}
# Divergent naive repr but empirically driver-green (see module doc).
DATE_SPECIAL = {"t_date"}


@pytest.fixture(scope="module")
def probe(spark, duck):
    pdf_s = spark.sql(_SQL_SPARK).toPandas()
    pdf_d = duck.cursor().execute(_SQL_DUCK).fetchdf()
    return pdf_s, pdf_d


def test_safe_types_converge_through_pandas(probe):
    pdf_s, pdf_d = probe
    diverged = {
        c
        for c in SAFE
        if repr(pdf_s[c].iloc[0]) != repr(pdf_d[c].iloc[0])
    }
    assert not diverged, (
        f"certified-safe scalar types now DIVERGE through pandas: {diverged} "
        "— the driver will hash-mismatch queries outputting them; extend the "
        "bans in driver_protocol.vhash/test_oracle_parity before registering "
        "more queries of these types"
    )


def test_divergent_types_are_banned(probe):
    pdf_s, pdf_d = probe
    diverged = {
        c
        for c in pdf_s.columns
        if repr(pdf_s[c].iloc[0]) != repr(pdf_d[c].iloc[0])
    }
    uncovered = diverged - BANNED - DATE_SPECIAL
    assert not uncovered, (
        f"types diverge through the driver's pandas path but are NOT banned "
        f"by the guards: {uncovered} — add them to driver_protocol.vhash and "
        "test_oracle_parity's isinstance tuple"
    )


def test_date_roundtrip_same_calendar_day(probe):
    pdf_s, pdf_d = probe
    ds, dd = pdf_s["t_date"].iloc[0], pdf_d["t_date"].iloc[0]
    assert (ds.year, ds.month, ds.day) == (dd.year, dd.month, dd.day)


def test_vhash_rejects_decimal_cells():
    """Reproduces the r08 red-row mechanism: a Decimal cell must now be
    REJECTED by the local simulation instead of silently hashing (the
    old behavior passed locally while the real driver hash-mismatched
    sql_api_lateral_column_alias)."""
    from tools.driver_protocol import vhash

    with pytest.raises(TypeError, match="Decimal"):
        vhash([(1, decimal.Decimal("5647.3130"))], ["k", "v"])


def test_vhash_rejects_binary_cells():
    from tools.driver_protocol import vhash

    with pytest.raises(TypeError, match="binary"):
        vhash([(1, b"ab")], ["k", "v"])


def test_vhash_accepts_safe_scalars():
    import datetime

    from tools.driver_protocol import vhash

    rows = [
        (1, 1.5, "x", True, datetime.date(2024, 2, 29),
         datetime.datetime(2024, 2, 29, 12, 34, 56)),
    ]
    assert vhash(rows, ["a", "b", "c", "d", "e", "f"])
