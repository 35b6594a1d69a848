"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata structs, processed by Arrow-batched pandas UDFs
over mapInPandas.

The container has no image/audio codec libraries, so the decode kernels are
STUBBED (deterministic fake features, clearly marked); everything Spark-side
— schema, batch iteration, partitioning, UDF signatures — is real and
tested. Swapping the stub for PIL/librosa/ffmpeg keeps the plan identical.

Scale: mapInPandas streams Arrow batches through Python one partition at a
time — memory is bounded by the batch size (spark.sql.execution.arrow.
maxRecordsPerBatch), and the operation is a narrow map: no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..views import load

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), True),    # image|audio|video
    T.StructField("content", T.BinaryType(), True),        # opaque payload
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("codec", T.StringType(), True),
    ]), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), True),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("content_sha256", T.StringType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


def synthetic_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table derived from documents: the text bytes act
    as the opaque binary payload. Real pipelines replace this with a parquet
    of actual blobs; the plan shape is identical."""
    docs = load(spark, sf_dir, "documents")
    mt = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                      (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            (F.col("n_chars") % 1920).cast("int").alias("width"),
            (F.col("n_chars") % 1080).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
            F.lit("stub").alias("codec"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, feature rows out.
    Batch shape and schema are production-real; only the decode kernel is a
    STUB (a real deployment decodes the payload with PIL / librosa / pyav
    and runs a feature extractor; those libs are absent in this container,
    so features are a deterministic hash-derived fake of the same
    shape/dtype).

    The closure is fully self-contained (stdlib + pandas only), so executor
    Python workers need NO access to this package — it survives drivers
    that don't ship the repo on PYTHONPATH."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        def decode_stub(payload, media_type):
            digest = _hl.sha256(
                (media_type or "").encode() + (payload or b"")).digest()
            return [b / 255.0 for b in digest[:dim]]

        for pdf in batches:
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
                "content_sha256": pdf["content"].map(
                    lambda b: _hl.sha256(b or b"").hexdigest()),
                "feature": [
                    decode_stub(c, t)
                    for c, t in zip(pdf["content"], pdf["media_type"])
                ],
            })
            yield out

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int = 224,
                  height: int = 224) -> DataFrame:
    """Image resize over mapInPandas: filter to images (partition-pruning-
    friendly narrow filter), then one Arrow batch -> one batch of resized
    payloads. The decode step is a deterministic STUB — nearest-neighbor
    resampling of the RAW payload bytes, out[i] = in[floor(i*n/(w*h))] — a
    real deployment replaces exactly the inner ``resample`` with
    PIL.Image.open(...).resize((w, h)); schema, batch shape, and plan are
    unchanged by that swap. Output rows keep MEDIA_SCHEMA with content =
    resized bytes and meta reflecting the new dimensions."""
    out_n = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def resample(payload: bytes) -> bytes:
            n = len(payload or b"")
            if n == 0:
                return b""
            return bytes(payload[i * n // out_n] for i in range(out_n))

        for pdf in batches:
            out = pdf.copy()
            out["content"] = out["content"].map(resample)
            out["meta"] = [
                {"width": width, "height": height,
                 "duration_ms": (m or {}).get("duration_ms"),
                 "codec": "raw-stub"}
                for m in out["meta"]
            ]
            yield out

    return media.filter(F.col("media_type") == "image").mapInPandas(run, MEDIA_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),    # 0..k-1 output
    T.StructField("src_frame", T.LongType(), False),       # source frame no.
    T.StructField("ts_ms", T.LongType(), True),            # frame timestamp
    T.StructField("frame_sha256", T.StringType(), True),
])


def frame_sample(media: DataFrame, frame_bytes: int = 64,
                 n_frames: int = 4) -> DataFrame:
    """Video frame sampling over mapInPandas: treat the payload as
    ``frame_bytes``-sized frames, emit up to ``n_frames`` evenly spaced
    ones (src_frame = floor(j*total/k)), each with its timestamp within
    meta.duration_ms and a content hash. One input row fans out to <= k
    output rows — mapInPandas handles the 1->N shape natively; still a
    narrow map, no shuffle. The frame DECODE is the stubbed step (sha256
    of raw frame bytes stands in for decoded pixels); the
    sampling/timestamping logic is the production logic."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        for pdf in batches:
            rows = []
            for media_id, payload, meta in zip(
                    pdf["media_id"], pdf["content"], pdf["meta"]):
                payload = payload or b""
                total = (len(payload) + frame_bytes - 1) // frame_bytes
                if total == 0:
                    continue
                k = min(n_frames, total)
                dur = (meta or {}).get("duration_ms") or 0
                for j in range(k):
                    src = j * total // k
                    frame = payload[src * frame_bytes:(src + 1) * frame_bytes]
                    rows.append((media_id, j, src, src * dur // total,
                                 _hl.sha256(frame).hexdigest()))
            yield pd.DataFrame(rows, columns=[
                "media_id", "frame_idx", "src_frame", "ts_ms", "frame_sha256"])

    return media.filter(F.col("media_type") == "video").mapInPandas(run, FRAME_SCHEMA)


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() surface: synthetic media -> stub feature extraction.
    Returns (media_id, media_type, n_bytes, content_sha256) — the feature
    vector is dropped for the oracle-compared output (sha256 of the payload
    is SQL-expressible in DuckDB; the fake feature is not)."""
    feats = extract_features(synthetic_media(spark, sf_dir))
    return feats.select("media_id", "media_type", "n_bytes", "content_sha256")


def media_resize(spark: SparkSession, sf_dir: str,
                 width: int = 32, height: int = 32) -> DataFrame:
    """queries() surface: images resized to width x height via the
    nearest-neighbor stub kernel. Output hashes the resized payload
    (F.sha2 on the binary, JVM-side) so the DuckDB oracle — which rebuilds
    the same resample with substring arithmetic (documents are pure ASCII,
    so char index == byte index) — checks the kernel BYTE-EXACTLY."""
    res = resize_images(synthetic_media(spark, sf_dir), width, height)
    return res.select(
        "media_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.length("content").cast("bigint").alias("n_bytes"),
        F.lower(F.sha2("content", 256)).alias("content_sha256"))


def media_frame_sample(spark: SparkSession, sf_dir: str,
                       frame_bytes: int = 64, n_frames: int = 4) -> DataFrame:
    """queries() surface: evenly-spaced frame samples from each video
    payload, hash per frame; oracle-checked via DuckDB substring
    arithmetic (byte-exact, same ASCII argument as media_resize)."""
    return frame_sample(synthetic_media(spark, sf_dir), frame_bytes, n_frames)
