from __future__ import annotations

import duckdb
import pytest

from sales_agent_graphdb_spark.catalog import TABLES
from sales_agent_graphdb_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    # Bare connection; tests bind unqualified views per-SF through
    # duck_with_views (idempotent CREATE OR REPLACE), matching the
    # driver's protocol. (Prefixed sf0001_*/sf001_* views used to be
    # pre-bound here but nothing referenced them.)
    con = duckdb.connect()
    yield con
    con.close()


def duck_with_views(con: duckdb.DuckDBPyConnection, sf_dir: str) -> duckdb.DuckDBPyConnection:
    """A cursor whose unqualified view names point at one sf dir —
    mirrors the driver's pre-registered views."""
    cur = con.cursor()
    for t in TABLES:
        cur.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return cur
