"""Python DataSource V2 `product_api` (S8): row-level fidelity of the
paged ingest and the pagination → partition mapping. The registered
query's aggregate oracle lives in test_oracle_parity; here we pin the
stronger full-row equality and the source mechanics."""

from __future__ import annotations

from sales_agent_graphdb_spark.sources.api_source import (
    _N_PAGES,
    ProductApiReader,
    ensure_api_pages,
    register_api_source,
)
from tests.conftest import SF_SMALL


def _api_df(spark):
    endpoint = ensure_api_pages(spark, SF_SMALL)
    register_api_source(spark)
    return (
        spark.read.format("product_api").option("endpoint", endpoint).load(),
        endpoint,
    )


def test_api_source_roundtrip_exact(spark):
    """Every row and every double bit survives part → JSON pages →
    paginated Arrow read (symmetric difference empty)."""
    api, _ = _api_df(spark)
    ref = spark.read.parquet(f"{SF_SMALL}/part.parquet").select(
        "p_partkey", "p_name", "p_brand", "p_retailprice"
    )
    assert api.count() == ref.count()
    assert api.exceptAll(ref).count() == 0
    assert ref.exceptAll(api).count() == 0


def test_api_source_paginates(spark):
    """One InputPartition per page file — the API's pagination is the
    scan's parallelism (8 pages => 8 partitions)."""
    _, endpoint = _api_df(spark)
    parts = ProductApiReader({"endpoint": endpoint}).partitions()
    assert len(parts) == _N_PAGES


def test_api_source_missing_endpoint_fails_loudly(spark):
    import pytest

    with pytest.raises(FileNotFoundError):
        ProductApiReader({"endpoint": "/nonexistent/endpoint"}).partitions()


def test_stream_reader_offsets_and_replay(spark):
    """The streaming reader's recovery contract, exercised directly
    (a live restart would be needed to hit readBetweenOffsets through
    Spark): offsets advance one page per read, the tail read reports
    caught-up (empty iterator, offset unchanged), and replaying a
    committed [start, end) range yields exactly the rows the original
    reads produced, in the same order."""
    from sales_agent_graphdb_spark.sources.api_source import (
        ProductApiStreamReader,
        ensure_api_pages,
    )
    from tests.conftest import SF_SMALL

    endpoint = ensure_api_pages(spark, SF_SMALL)
    r = ProductApiStreamReader({"endpoint": endpoint})
    assert r.initialOffset() == {"page": 0}

    seen, off = [], r.initialOffset()
    for _ in range(100):  # drain with a hard stop
        rows, nxt = r.read(off)
        rows = list(rows)
        if nxt == off:
            assert rows == [], "caught-up read must be empty"
            break
        assert rows, "each page batch must carry rows"
        seen.append((off["page"], rows))
        off = nxt
    n_pages = len(seen)
    assert n_pages >= 2, "endpoint should paginate"

    # replay the full committed range — exact same rows, same order
    replayed = list(
        r.readBetweenOffsets({"page": 0}, {"page": n_pages})
    )
    assert replayed == [row for _, rows in seen for row in rows]
    # replay of a middle slice
    mid = list(r.readBetweenOffsets({"page": 1}, {"page": 2}))
    assert mid == seen[1][1]
