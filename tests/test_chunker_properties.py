"""Chunker boundary invariants (SURVEY.md §5): every char covered,
exact overlap, dense chunk_idx — plus hypothesis over sizes."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sales_agent_graphdb_spark import catalog
from sales_agent_graphdb_spark.operators.chunker import chunk_documents

SF = "/root/testdata/sf0.001"


def _reassemble(chunks: list[tuple[int, str]], stride: int) -> str:
    """Rebuild the original text from (idx, chunk) via stride offsets."""
    out: dict[int, str] = {}
    for idx, text in chunks:
        for i, ch in enumerate(text):
            out[idx * stride + i] = ch
    return "".join(out[i] for i in range(len(out)))


@pytest.mark.parametrize("size,overlap", [(120, 20), (50, 0), (64, 63)])
def test_chunker_invariants(spark, size, overlap):
    stride = size - overlap
    docs = catalog.load_table(spark, SF, "documents").orderBy("doc_id").limit(30)
    src = {r.doc_id: r.text for r in docs.collect()}
    rows = chunk_documents(docs, size=size, overlap=overlap).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # empty-text docs produce zero chunks by design (chunker.py)
    assert set(by_doc) == {d for d, t in src.items() if len(t) > 0}
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.chunk_idx)
        # dense idx from 0
        assert [r.chunk_idx for r in rs] == list(range(len(rs)))
        # consecutive chunks agree on their overlap region (the
        # penultimate chunk may be shorter than `size` when the text
        # ends inside its window)
        for a, b in zip(rs, rs[1:]):
            assert len(a.chunk_text) <= size
            tail = a.chunk_text[stride:]
            assert tail == b.chunk_text[: len(tail)]
        # full coverage: reassembly reproduces the source text — both by
        # offset map and by stride-prefix concatenation (the two rebuild
        # styles previously split across duplicated tests)
        assert (
            _reassemble([(r.chunk_idx, r.chunk_text) for r in rs], stride)
            == src[doc_id]
        )
        rebuilt = "".join(r.chunk_text[:stride] for r in rs[:-1]) + rs[-1].chunk_text
        assert rebuilt == src[doc_id]
        # chunk_id is content-derived and unique
        assert len({r.chunk_id for r in rs}) == len(rs)


@given(
    size=st.integers(min_value=2, max_value=300),
    overlap_frac=st.floats(min_value=0.0, max_value=0.95),
)
@settings(max_examples=15, deadline=None)
def test_chunker_hypothesis_sizes(spark, size, overlap_frac):
    overlap = min(int(size * overlap_frac), size - 1)
    docs = catalog.load_table(spark, SF, "documents").orderBy("doc_id").limit(5)
    src = {r.doc_id: r.text for r in docs.collect()}
    rows = chunk_documents(docs, size=size, overlap=overlap).collect()
    stride = size - overlap
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_text))
    # every non-empty doc must be covered, or a zero-chunk regression
    # would pass the loop below vacuously
    assert set(by_doc) == {d for d, t in src.items() if len(t) > 0}
    for doc_id, cs in by_doc.items():
        assert _reassemble(cs, stride) == src[doc_id]
