"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata structs, processed by Arrow-batched pandas UDFs
over mapInPandas.

Decode kernels are SELECTABLE: every operator takes ``kernel=`` with
  "stub"  deterministic payload-byte kernels (default — this container has
          no codec libraries, and the driver gates compare against DuckDB
          restatements of exactly these kernels);
  "pil" / "pyav"  real decoders (PIL for images, PyAV for video) — the
          same mapInPandas plan, only the inner per-payload function
          swaps; selecting them without the library raises immediately
          with an actionable error;
  "auto"  the real kernel when its library imports, else the stub.

The kernel builders are plain module-level functions over pandas
DataFrames, so the real-decoder wiring is unit-testable in-process (with
an injected fake library) even where PIL/PyAV are absent — see
tests/test_multimodal.py. Everything Spark-side — schema, batch
iteration, partitioning, UDF signatures — is identical across kernels.

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


def available_image_codec() -> str:
    """"pil" when PIL imports here, else "stub". Called at PLAN time on
    the driver; local-mode workers share the environment, and cluster
    deployments ship the same image, so driver-side detection is
    representative. Pin kernel= explicitly in heterogeneous setups."""
    try:
        import PIL.Image  # noqa: F401
        return "pil"
    except Exception:
        return "stub"


def available_video_codec() -> str:
    """"pyav" when the av package imports here, else "stub"."""
    try:
        import av  # noqa: F401
        return "pyav"
    except Exception:
        return "stub"


def _resolve(kernel: str, kind: str) -> str:
    real = {"image": available_image_codec,
            "video": available_video_codec}[kind]
    if kernel == "auto":
        return real()
    allowed = {"image": ("stub", "pil"), "video": ("stub", "pyav")}[kind]
    if kernel not in allowed:
        raise ValueError(f"unknown {kind} kernel {kernel!r}; "
                         f"expected one of {allowed + ('auto',)}")
    if kernel != "stub" and real() == "stub":
        raise ImportError(
            f"{kind} kernel {kernel!r} requested but its library is not "
            f"importable on the driver — install it or use kernel='auto' "
            f"to fall back to the stub")
    return kernel


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


# --- feature extraction ------------------------------------------------

def feature_kernel_stub(dim: int):
    """Batch kernel: deterministic hash-derived pseudo-features of the
    production shape/dtype. Self-contained closure (stdlib + pandas only)
    so executor workers need no access to this package."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        def decode_stub(payload, media_type):
            digest = _hl.sha256(
                (media_type or "").encode() + (payload or b"")).digest()
            return [b / 255.0 for b in digest[:dim]]

        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["content"].map(
                    lambda b: len(b) if b is not None else 0),
                "content_sha256": pdf["content"].map(
                    lambda b: _hl.sha256(b or b"").hexdigest()),
                "feature": [
                    decode_stub(c, t)
                    for c, t in zip(pdf["content"], pdf["media_type"])
                ],
            })

    return run


def feature_kernel_pil(dim: int):
    """Batch kernel: REAL image decode via PIL — grayscale, the feature
    is per-band mean intensity over ``dim`` horizontal bands (a minimal
    honest visual descriptor; swap the inner function for a model
    embedding without touching the plan). Non-image rows and undecodable
    payloads fall back to the hash stub feature, so a mixed-modality
    table still yields one row per input."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl
        from io import BytesIO

        from PIL import Image

        def stub(payload, media_type):
            digest = _hl.sha256(
                (media_type or "").encode() + (payload or b"")).digest()
            return [b / 255.0 for b in digest[:dim]]

        def decode(payload, media_type):
            if media_type != "image" or not payload:
                return stub(payload, media_type)
            try:
                img = Image.open(BytesIO(payload)).convert("L")
            except Exception:
                return stub(payload, media_type)
            px = list(img.getdata())
            if not px:
                return stub(payload, media_type)
            h = img.height or 1
            w = max(1, len(px) // h)
            bands = [[] for _ in range(dim)]
            for row in range(h):
                bands[row * dim // h].extend(px[row * w:(row + 1) * w])
            return [(sum(b) / len(b) / 255.0) if b else 0.0 for b in bands]

        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["content"].map(
                    lambda b: len(b) if b is not None else 0),
                "content_sha256": pdf["content"].map(
                    lambda b: _hl.sha256(b or b"").hexdigest()),
                "feature": [
                    decode(c, t)
                    for c, t in zip(pdf["content"], pdf["media_type"])
                ],
            })

    return run


def extract_features(media: DataFrame, dim: int = 8,
                     kernel: str = "stub") -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, feature rows out;
    ``kernel`` picks the decoder (module docstring)."""
    k = _resolve(kernel, "image")
    run = feature_kernel_pil(dim) if k == "pil" else feature_kernel_stub(dim)
    return media.mapInPandas(run, FEATURE_SCHEMA)


# --- image resize ------------------------------------------------------

def resize_kernel_stub(width: int, height: int):
    """Batch kernel: nearest-neighbor resampling of the RAW payload bytes
    (out[i] = in[floor(i*n/(w*h))]) — deterministic and restatable in SQL,
    which is what the driver gate checks byte-exactly."""
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

    return run


def resize_kernel_pil(width: int, height: int):
    """Batch kernel: REAL decode -> PIL bilinear resize -> PNG re-encode.
    Undecodable payloads yield empty content with codec "undecodable"
    (kept, not dropped, so lineage stays 1:1 and failures are countable
    downstream)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from io import BytesIO

        from PIL import Image

        def resample(payload):
            try:
                img = Image.open(BytesIO(payload or b""))
                buf = BytesIO()
                img.resize((width, height)).save(buf, format="PNG")
                return buf.getvalue(), "png"
            except Exception:
                return b"", "undecodable"

        for pdf in batches:
            out = pdf.copy()
            pairs = [resample(p) for p in out["content"]]
            out["content"] = [c for c, _ in pairs]
            out["meta"] = [
                {"width": width, "height": height,
                 "duration_ms": (m or {}).get("duration_ms"), "codec": c}
                for m, (_, c) in zip(out["meta"], pairs)
            ]
            yield out

    return run


def resize_images(media: DataFrame, width: int = 224, height: int = 224,
                  kernel: str = "stub") -> DataFrame:
    """Image resize over mapInPandas: filter to images (narrow,
    pushdown-friendly), then one Arrow batch -> one batch of resized
    payloads; ``kernel`` picks the decoder (module docstring)."""
    k = _resolve(kernel, "image")
    run = (resize_kernel_pil(width, height) if k == "pil"
           else resize_kernel_stub(width, height))
    return (media.filter(F.col("media_type") == "image")
                 .mapInPandas(run, MEDIA_SCHEMA))


# --- video frame sampling ---------------------------------------------

FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),    # 0..k-1 output
    T.StructField("src_frame", T.LongType(), False),       # source frame no.
    T.StructField("ts_ms", T.LongType(), True),            # frame timestamp
    T.StructField("frame_sha256", T.StringType(), True),
])


def frame_kernel_stub(frame_bytes: int, n_frames: int):
    """Batch kernel: treat the payload as ``frame_bytes``-sized frames,
    emit up to ``n_frames`` evenly spaced ones (src_frame =
    floor(j*total/k)) with timestamps within meta.duration_ms. The
    sampling/timestamping arithmetic IS the production logic; only
    "frame" = raw byte slice is the stub."""

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
                "media_id", "frame_idx", "src_frame", "ts_ms",
                "frame_sha256"])

    return run


def frame_kernel_pyav(n_frames: int):
    """Batch kernel: REAL container demux/decode via PyAV — keep
    ``n_frames`` evenly spaced frames (src_frame = floor(j*total/k) over
    the decoded frame count), hash the raw RGB plane. Same sampling
    arithmetic as the stub, real decode in the middle; undecodable
    payloads contribute no rows (countable via an anti-join on media_id).

    TWO-PASS decode: pass 1 counts frames (dropping each immediately),
    pass 2 re-opens the in-memory container and keeps only the sampled
    indices — memory stays O(n_frames) per row where materializing the
    decoded stream (a 10-min clip is ~18k multi-MB RGB frames) would OOM
    the Python worker. Decoding twice is the price of even spacing over
    an unknown frame count without an index; containers with reliable
    stream metadata could skip pass 1."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl
        from io import BytesIO

        import av

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["content"]):
                try:
                    with av.open(BytesIO(payload or b"")) as container:
                        total = sum(1 for _ in container.decode(video=0))
                except Exception:
                    continue
                if total == 0:
                    continue
                k = min(n_frames, total)
                wanted = {j * total // k: j for j in range(k)}
                try:
                    with av.open(BytesIO(payload or b"")) as container:
                        for src, fr in enumerate(
                                container.decode(video=0)):
                            j = wanted.get(src)
                            if j is None:
                                continue
                            ts_ms = int((fr.time or 0) * 1000)
                            raw = bytes(fr.to_rgb().planes[0])
                            rows.append((media_id, j, src, ts_ms,
                                         _hl.sha256(raw).hexdigest()))
                except Exception:
                    continue
            out = pd.DataFrame(rows, columns=[
                "media_id", "frame_idx", "src_frame", "ts_ms",
                "frame_sha256"])
            yield out.sort_values(["media_id", "frame_idx"],
                                  ignore_index=True)

    return run


def frame_sample(media: DataFrame, frame_bytes: int = 64,
                 n_frames: int = 4, kernel: str = "stub") -> DataFrame:
    """Video frame sampling over mapInPandas: one input row fans out to
    <= n_frames output rows (mapInPandas handles 1->N natively; still a
    narrow map, no shuffle); ``kernel`` picks the decoder."""
    k = _resolve(kernel, "video")
    run = (frame_kernel_pyav(n_frames) if k == "pyav"
           else frame_kernel_stub(frame_bytes, n_frames))
    return (media.filter(F.col("media_type") == "video")
                 .mapInPandas(run, FRAME_SCHEMA))


# --- perceptual-hash image near-dup (dHash) ----------------------------

DHASH_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("dhash", T.LongType(), False),
])


def dhash_kernel_stub():
    """Batch kernel: difference hash over the RAW payload bytes — the
    payload resamples to an 8-row x 9-column byte grid (grid[i] =
    payload[i*n//72], the same nearest-neighbor arithmetic as the resize
    stub), and bit r*8+c of the fingerprint is grid[r][c+1] > grid[r][c]
    (MSB = bit 0). Deterministic and SQL-restatable byte-for-byte, which
    is what lets the driver hash-gate the candidate machinery end to
    end; the PIL kernel swaps only the grid source."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def grid_of(payload: bytes):
            n = len(payload or b"")
            if n == 0:
                return None
            arr = np.frombuffer(payload, dtype=np.uint8)
            return arr[(np.arange(72) * n) // 72].reshape(8, 9)

        def pack(grid) -> int:
            if grid is None:
                return 0
            bits = (grid[:, 1:] > grid[:, :-1]).ravel()  # 8x8, row-major
            v = int.from_bytes(np.packbits(bits).tobytes(), "big")
            return v - (1 << 64) if v >= (1 << 63) else v  # signed long

        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "dhash": [pack(grid_of(c)) for c in pdf["content"]],
            })

    return run


def dhash_kernel_pil():
    """Batch kernel: the CLASSIC image dHash — decode, grayscale, resize
    to 9x8 (bilinear), bit r*8+c = px[r][c+1] > px[r][c]. Undecodable
    payloads fall back to the stub's byte-grid hash so a mixed table
    still yields one fingerprint per row (lineage 1:1, same contract as
    the other PIL kernels)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from io import BytesIO

        import numpy as np
        from PIL import Image

        def stub_grid(payload: bytes):
            n = len(payload or b"")
            if n == 0:
                return None
            arr = np.frombuffer(payload, dtype=np.uint8)
            return arr[(np.arange(72) * n) // 72].reshape(8, 9)

        def grid_of(payload: bytes):
            try:
                img = Image.open(BytesIO(payload or b"")).convert("L")
                px = np.asarray(img.resize((9, 8), Image.BILINEAR))
                return px.reshape(8, 9)
            except Exception:
                return stub_grid(payload)

        def pack(grid) -> int:
            if grid is None:
                return 0
            bits = (grid[:, 1:] > grid[:, :-1]).ravel()
            v = int.from_bytes(np.packbits(bits).tobytes(), "big")
            return v - (1 << 64) if v >= (1 << 63) else v

        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "dhash": [pack(grid_of(c)) for c in pdf["content"]],
            })

    return run


def image_dhash(media: DataFrame, kernel: str = "stub") -> DataFrame:
    """(media_id, dhash): 64-bit difference-hash fingerprints of the
    image rows — a narrow Arrow-batched map, no shuffle. ``kernel``
    picks the decoder (module docstring)."""
    k = _resolve(kernel, "image")
    run = dhash_kernel_pil() if k == "pil" else dhash_kernel_stub()
    return (media.filter(F.col("media_type") == "image")
                 .mapInPandas(run, DHASH_SCHEMA))


def image_dhash_pairs_df(media: DataFrame, max_hamming: int = 3,
                         kernel: str = "stub") -> DataFrame:
    """Near-duplicate IMAGE pairs: dHash fingerprints through the same
    Manku block-combination candidate machinery the text simhash path
    uses (dedup.hamming_pairs_df) — multimodal dedup as a first-class
    member of the dedup family, not a feature-extraction island. Output
    (a_id, b_id, hamming), hamming <= ``max_hamming`` (<= 3, the
    3-of-6 recall guarantee).

    Scale: fingerprints are one packed long per image; candidates join
    on (table, ~32-bit key) whose cardinality grows with the corpus.
    The fingerprint frame is persisted — the self-join consumes it
    twice, and without the barrier the decode kernel runs once per join
    side."""
    from pyspark import StorageLevel

    from ..cache import owned as _owned
    from .dedup import hamming_pairs_df

    fps = (image_dhash(media, kernel)
           .withColumnRenamed("dhash", "sim_long")
           .persist(StorageLevel.MEMORY_AND_DISK))
    out = hamming_pairs_df(fps, id_col="media_id", max_hamming=max_hamming)
    return _owned(out, fps)


# --- queries() surface (driver gates pin kernel="stub") ----------------

def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() surface: synthetic media -> stub feature extraction.
    Returns (media_id, media_type, n_bytes, content_sha256) — the feature
    vector is dropped for the oracle-compared output (sha256 of the payload
    is SQL-expressible in DuckDB; the fake feature is not). kernel="stub"
    is pinned: the synthetic payloads are text bytes, and the gate's
    DuckDB oracle restates the stub kernel."""
    feats = extract_features(synthetic_media(spark, sf_dir), kernel="stub")
    return feats.select("media_id", "media_type", "n_bytes", "content_sha256")


def media_resize(spark: SparkSession, sf_dir: str,
                 width: int = 32, height: int = 32) -> DataFrame:
    """queries() surface: images resized to width x height via the
    nearest-neighbor stub kernel. Output hashes the resized payload
    (F.sha2 on the binary, JVM-side) so the DuckDB oracle — which rebuilds
    the same resample with substring arithmetic (documents are pure ASCII,
    so char index == byte index) — checks the kernel BYTE-EXACTLY."""
    res = resize_images(synthetic_media(spark, sf_dir), width, height,
                        kernel="stub")
    return res.select(
        "media_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.length("content").cast("bigint").alias("n_bytes"),
        F.lower(F.sha2("content", 256)).alias("content_sha256"))


def media_dhash_pairs(spark: SparkSession, sf_dir: str,
                      max_hamming: int = 3) -> DataFrame:
    """queries() surface: near-dup image pairs via the stub dHash
    kernel, over the synthetic images PLUS a planted near-identical twin
    of every 10th one (media_id + 3e12 — a multiple of 3 so the
    media-type class is preserved, and far beyond any real doc_id at
    any scale factor, so planted ids can never collide with (and merge
    fingerprints of) a genuine document — an id collision would make the
    engine/oracle hash gate diverge) with one character overwritten at a
    fixed position. A single in-place byte edit moves at most two
    adjacent-comparison bits of the 8x9 grid — but only when the
    payload is >= 72 bytes, so each of the 72 grid positions samples a
    DISTINCT byte; shorter docs can flip more bits (or even change
    length when text has < 11 chars), so planting is restricted to
    length(text) >= 72 (mirrored in the oracle). Every planted twin
    pair then sits inside the hamming<=3 recall guarantee and the gate
    output is non-empty with both near-zero and zero distances. The
    DuckDB oracle
    rebuilds the byte-grid fingerprints with substring/ord arithmetic
    (ASCII payloads, char index == byte index) and compares ALL pairs
    bit-for-bit — so the gate checks kernel + candidate machinery end to
    end (the block tables must find exactly the all-pairs answer)."""
    from ..views import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    planted = (docs.where((F.col("doc_id") % 30 == 0)
                          & (F.length("text") >= 72))
               .select((F.col("doc_id") + F.lit(3_000_000_000_000)).alias("doc_id"),
                       F.concat(
                           F.substring("text", 1, 10), F.lit("#"),
                           F.col("text").substr(F.lit(12),
                                                F.length("text")))
                       .alias("text")))
    base = docs.unionByName(planted)
    media = base.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"),
                             F.lit("video")),
                     (F.col("doc_id") % 3 + 1).cast("int"))
         .alias("media_type"),
        F.encode("text", "utf-8").alias("content"))
    return image_dhash_pairs_df(media, max_hamming, kernel="stub")


def media_frame_sample(spark: SparkSession, sf_dir: str,
                       frame_bytes: int = 64, n_frames: int = 4) -> DataFrame:
    """queries() surface: evenly-spaced frame samples from each video
    payload, hash per frame; oracle-checked via DuckDB substring
    arithmetic (byte-exact, same ASCII argument as media_resize)."""
    return frame_sample(synthetic_media(spark, sf_dir), frame_bytes,
                        n_frames, kernel="stub")
