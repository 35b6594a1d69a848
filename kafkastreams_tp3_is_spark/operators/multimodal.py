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


def resize_images(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image resize plumbing: filters to images, would decode+resize via a
    pandas UDF. Kernel stubbed — raises NotImplementedError if actually
    asked to produce pixels, but the plan (filter + mapInPandas signature)
    is real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image decode/resize requires PIL, absent in this container; "
            "plug the kernel in here")
        yield  # pragma: no cover

    return media.filter(F.col("media_type") == "image").mapInPandas(run, MEDIA_SCHEMA)


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() surface: synthetic media -> stub feature extraction.
    Returns (media_id, media_type, n_bytes, content_sha256) — the feature
    vector is dropped for the oracle-compared output (sha256 of the payload
    is SQL-expressible in DuckDB; the fake feature is not)."""
    feats = extract_features(synthetic_media(spark, sf_dir))
    return feats.select("media_id", "media_type", "n_bytes", "content_sha256")
