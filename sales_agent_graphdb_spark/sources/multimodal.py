"""Multimodal column surface: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs.

The decode step (real JPEG/WAV/MP4 parsing) is STUBBED — the image/
audio libraries are not in this container — behind ``decode_media``,
which raises ``NotImplementedError`` unless PIL/soundfile are
importable. Everything Spark-side is real and tested: the schema, the
``mapInPandas`` batch shape (iterator of record batches, bounded
memory), the feature/frame-sample plumbing, and the deterministic
fake decode used by the oracle-checked queries.

Scale design: binary payloads dominate row size, so media tables are
stored with the binary column LAST in the schema and read with column
pruning — metadata-only queries never touch the bytes; payload stages
cap ``spark.sql.files.maxPartitionBytes`` so one task's Arrow batches
(payload × rows-per-batch) fit executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("media_type", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
        T.StructField("payload", T.BinaryType()),  # binary LAST: prune-friendly
    ]
)

FRAME_BYTES = 256  # fake "frame" stride for the sampler


def synthesize_media(docs: DataFrame) -> DataFrame:
    """documents → media rows: payload = utf-8 bytes of the text
    (deterministic fake media), typed metadata derived from doc
    fields. Pure column expressions — the shape real ingestion
    produces when landing scraped media (SURVEY.md S7/S8)."""
    mt = (
        F.when(F.col("doc_id") % 3 == 0, "image/jpeg")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
    )
    return docs.select(
        "doc_id",
        F.struct(
            mt.alias("media_type"),
            (F.col("n_chars") % 640 + 16).cast("int").alias("width"),
            (F.col("n_chars") % 480 + 16).cast("int").alias("height"),
            (F.col("n_chars") * 40).cast("long").alias("duration_ms"),
        ).alias("meta"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def decode_media(payload: bytes, media_type: str):
    """Real decode — STUB. Raises unless a decoder library is present
    (none are in this container; the Spark-side plumbing above/below
    is what this engine owns)."""
    if media_type.startswith("image/"):
        try:
            import io

            from PIL import Image  # noqa: F401
        except ImportError as e:
            raise NotImplementedError("image decode requires PIL") from e
        return Image.open(io.BytesIO(payload))
    raise NotImplementedError(f"no decoder for {media_type}")


FEATURES_SCHEMA = "doc_id long, n_bytes long, sig string, media_type string"


def media_features(media: DataFrame) -> DataFrame:
    """Feature extraction over binary payloads, JVM-side: byte length
    (``octet_length``) and md5 signature are built-in codegen'd
    expressions — no Python in the hot path. This is the registered
    production form; ``media_features_arrow`` below is the same
    computation through mapInPandas, kept as the Arrow round-trip
    fidelity probe (both are oracle-checked to identical results)."""
    return media.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.substring(F.md5("payload"), 1, 16).alias("sig"),
        F.col("meta.media_type").alias("media_type"),
    )


def media_features_arrow(media: DataFrame) -> DataFrame:
    """The mapInPandas twin of ``media_features``: Arrow moves the
    binary batches, pandas computes the same features row-wise. Exists
    to prove payload bytes survive Spark→Arrow→pandas→Arrow→Spark
    exactly (its md5 must equal the JVM md5); swap the hash for a
    vision/audio model client and the plan is the real inference
    stage."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "sig": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()[:16]
                    ),
                    "media_type": pdf["meta"].map(lambda m: m["media_type"]),
                }
            )

    return media.mapInPandas(extract, schema=FEATURES_SCHEMA)


FRAMES_SCHEMA = "doc_id long, frame_no int, frame_len int, frame_sig string"


def frame_sample(media: DataFrame, stride: int = FRAME_BYTES) -> DataFrame:
    """Frame sampler, JVM-side: one row per fixed-stride byte 'frame'
    via sequence→explode, frame bytes sliced with binary ``substring``
    and signed with built-in md5 — the explode-shaped plumbing a video
    frame pipeline needs, with no Python. ``frame_sample_arrow`` is the
    mapInPandas twin (pytest asserts identical output, covering
    byte-slice fidelity through Arrow)."""
    n = F.octet_length("payload")
    last = (F.greatest(n, F.lit(1)) - 1).cast("int") / F.lit(stride)
    frames = media.select(
        "doc_id",
        n.alias("n"),
        F.col("payload"),
        F.explode(F.sequence(F.lit(0), last.cast("int"))).alias("frame_no"),
    )
    chunk = F.expr(f"substring(payload, frame_no * {stride} + 1, {stride})")
    return frames.select(
        "doc_id",
        F.col("frame_no").cast("int").alias("frame_no"),
        F.least(F.lit(stride), F.col("n") - F.col("frame_no") * stride)
        .cast("int")
        .alias("frame_len"),
        F.substring(F.md5(chunk), 1, 16).alias("frame_sig"),
    )


def frame_sample_arrow(media: DataFrame, stride: int = FRAME_BYTES) -> DataFrame:
    """mapInPandas twin of ``frame_sample`` (Arrow-fidelity probe for
    per-frame byte slices; the codec is the stubbed part)."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, lens, sigs = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for i in range(0, max(len(b), 1), stride):
                    chunk = b[i : i + stride]
                    ids.append(doc_id)
                    nos.append(i // stride)
                    lens.append(len(chunk))
                    sigs.append(hashlib.md5(chunk).hexdigest()[:16])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_no": nos, "frame_len": lens, "frame_sig": sigs}
            )

    return media.mapInPandas(frames, schema=FRAMES_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, src_w int, src_h int, dst_w int, dst_h int,"
    " est_bytes long, sig string"
)


def resize_plan_arrow(media: DataFrame, target: int = 224) -> DataFrame:
    """Aspect-preserving resize stage for image payloads, as the
    Arrow-batched mapInPandas an inference preprocessor runs: per
    batch, compute the fit-into-target dims (scale = min(t/w, t/h),
    dst = max(1, floor(src·scale))), the decoded-tensor byte estimate
    (dst_w·dst_h·3), and the payload md5 (fidelity passthrough). The
    PIXEL transform is the stubbed codec step (decode_media): a real
    deployment decodes, resizes and re-encodes inside this same
    function with the identical batch shape — the Spark-side plumbing
    (schema, Arrow batching, partition-parallel execution) is what
    this engine owns. All dimension math is IEEE double then floor,
    identical in pandas, the JVM and the DuckDB oracle."""

    def plan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        t = float(target)
        for pdf in batches:
            w = pdf["meta"].map(lambda m: int(m["width"]))
            h = pdf["meta"].map(lambda m: int(m["height"]))
            scale = [min(t / float(a), t / float(b)) for a, b in zip(w, h)]
            dst_w = [max(1, math.floor(float(a) * s)) for a, s in zip(w, scale)]
            dst_h = [max(1, math.floor(float(b) * s)) for b, s in zip(h, scale)]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "src_w": pd.Series(w, dtype="int32"),
                    "src_h": pd.Series(h, dtype="int32"),
                    "dst_w": pd.Series(dst_w, dtype="int32"),
                    "dst_h": pd.Series(dst_h, dtype="int32"),
                    "est_bytes": pd.Series(
                        [int(a) * int(b) * 3 for a, b in zip(dst_w, dst_h)],
                        dtype="int64",
                    ),
                    "sig": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()[:16]
                    ),
                }
            )

    return media.mapInPandas(plan, schema=RESIZE_SCHEMA)


SEGMENT_MS = 5_000  # fixed-duration audio analysis window


def audio_segments(media: DataFrame, seg_ms: int = SEGMENT_MS) -> DataFrame:
    """Audio SEGMENTATION plan, JVM-side: audio rows only (metadata
    predicate — the binary column is untouched until the byte-range
    math), one row per fixed-duration window of ``meta.duration_ms``,
    each segment mapped to its proportional byte range of the payload
    (what a WAV/PCM pipeline does before handing windows to a feature
    extractor; the codec-aware slice is the stubbed decode step, the
    windowing/partitioning/byte arithmetic here is the real engine
    work). All integer arithmetic: seg boundaries in ms, byte offsets
    floor(n_bytes·t/dur) — deterministic, oracle-replayable.

    Scale: sequence→explode streams segments out of each row (a task
    never materializes a doc's full segment list), the audio filter
    prunes the scan BEFORE the explode, and downstream feature stages
    inherit ~uniform segment sizes — the skew-free unit of work a
    100 TB audio corpus needs."""
    dur = F.col("meta.duration_ms")
    n = F.octet_length("payload").cast("long")
    # dur > 0 guard (ADVICE r08): a zero-duration row must emit ZERO
    # segments on both engines. Without it, Spark's ((dur-1)/seg_ms)
    # .cast('long') truncates -1/seg_ms to 0 and emits one segment
    # with divide-by-zero-null byte ranges, while the oracle's
    # range(0, ((dur-1)//seg_ms)+1) floors -1//seg_ms to -1 and emits
    # none. `div` keeps the bound in integer arithmetic outright.
    segs = media.filter(
        (F.col("meta.media_type") == "audio/wav") & (dur > 0)
    ).select(
        "doc_id",
        dur.alias("dur"),
        n.alias("n_bytes"),
        F.explode(
            F.sequence(F.lit(0).cast("long"),
                       F.expr(f"(meta.duration_ms - 1) div {int(seg_ms)}"))
        ).alias("seg_no"),
    )
    start_ms = F.col("seg_no") * seg_ms
    end_ms = F.least(start_ms + seg_ms, F.col("dur"))
    b0 = F.floor(F.col("n_bytes") * start_ms / F.col("dur"))
    b1 = F.floor(F.col("n_bytes") * end_ms / F.col("dur"))
    return segs.select(
        "doc_id",
        F.col("seg_no").cast("long").alias("seg_no"),
        start_ms.cast("long").alias("seg_start_ms"),
        (end_ms - start_ms).cast("long").alias("seg_len_ms"),
        b0.cast("long").alias("byte_start"),
        (b1 - b0).cast("long").alias("seg_bytes"),
    )
