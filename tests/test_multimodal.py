"""Multimodal plumbing: schema, decode stub, frame signatures."""

from __future__ import annotations

import hashlib

import pytest

from sales_agent_graphdb_spark import catalog
from sales_agent_graphdb_spark.sources import multimodal

SF = "/root/testdata/sf0.001"


def _media(spark):
    return multimodal.synthesize_media(catalog.load_table(spark, SF, "documents"))


def test_media_schema_binary_last(spark):
    m = _media(spark)
    assert m.schema.fields[-1].dataType.typeName() == "binary"
    meta = dict(m.select("meta.*").dtypes)
    assert meta == {
        "media_type": "string",
        "width": "int",
        "height": "int",
        "duration_ms": "bigint",
    }


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"\x00\x01", "video/mp4")


def test_frame_sigs_match_local_hash(spark):
    m = _media(spark).limit(5)
    src = {r.doc_id: bytes(r.payload) for r in m.collect()}
    for r in multimodal.frame_sample(m).collect():
        b = src[r.doc_id][r.frame_no * 256 : r.frame_no * 256 + 256]
        assert r.frame_len == len(b)
        assert r.frame_sig == hashlib.md5(b).hexdigest()[:16]


def test_features_roundtrip_bytes_exactly(spark):
    m = _media(spark).limit(20)
    feats = {r.doc_id: r for r in multimodal.media_features(m).collect()}
    for r in m.collect():
        f = feats[r.doc_id]
        assert f.n_bytes == len(bytes(r.payload))
        assert f.sig == hashlib.md5(bytes(r.payload)).hexdigest()[:16]
        assert f.media_type == r.meta.media_type


def test_arrow_twin_matches_jvm_features(spark):
    """The mapInPandas feature path must byte-exactly reproduce the JVM
    built-in path — the Arrow round-trip fidelity claim."""
    m = _media(spark)
    jvm = sorted(tuple(r) for r in multimodal.media_features(m).collect())
    arrow = sorted(tuple(r) for r in multimodal.media_features_arrow(m).collect())
    assert jvm == arrow


def test_arrow_twin_matches_jvm_frames(spark):
    """Per-frame binary slices through Arrow == JVM binary substring."""
    m = _media(spark).limit(50)
    jvm = sorted(tuple(r) for r in multimodal.frame_sample(m).collect())
    arrow = sorted(tuple(r) for r in multimodal.frame_sample_arrow(m).collect())
    assert jvm == arrow


def test_audio_segments_zero_duration_emits_no_rows(spark):
    """ADVICE r08: a zero-duration audio row must produce ZERO
    segments (the oracle's range() already does; the Spark side used
    to truncate -1/seg_ms to 0 and emit one null-byte-range row)."""
    from pyspark.sql import functions as F

    m = _media(spark).limit(1).withColumn(
        "meta",
        F.col("meta")
        .withField("duration_ms", F.lit(0).cast("long"))
        .withField("media_type", F.lit("audio/wav")),
    )
    assert multimodal.audio_segments(m).count() == 0
