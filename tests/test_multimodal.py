"""Exact-recomputation tests for the multimodal kernels: the Spark-side
mapInPandas output must byte-match a pure-Python restatement of the
nearest-neighbor resize and frame sampling on known payloads (including
edge lengths), independent of the DuckDB oracle."""

from __future__ import annotations

import hashlib

import pytest

from kafkastreams_tp3_is_spark.operators.multimodal import (
    frame_sample, resize_images, synthetic_media)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def tiny_media(spark):
    rows = [
        (1, "image", b"abcdefgh", {"width": 2, "height": 4,
                                   "duration_ms": 0, "codec": "raw"}),
        (2, "image", b"xy", None),                      # shorter than target
        (3, "video", b"v" * 130, {"width": None, "height": None,
                                  "duration_ms": 1300, "codec": "raw"}),
        (4, "video", b"w" * 40, {"width": None, "height": None,
                                 "duration_ms": 400, "codec": "raw"}),
        (5, "audio", b"ignored", None),
    ]
    from kafkastreams_tp3_is_spark.operators.multimodal import MEDIA_SCHEMA
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_resize_nearest_neighbor_exact(tiny_media):
    out = {r["media_id"]: r for r in
           resize_images(tiny_media, width=4, height=4).collect()}
    assert set(out) == {1, 2}  # images only
    for mid, payload in ((1, b"abcdefgh"), (2, b"xy")):
        expect = bytes(payload[i * len(payload) // 16] for i in range(16))
        assert bytes(out[mid]["content"]) == expect
        assert out[mid]["meta"]["width"] == 4
        assert out[mid]["meta"]["height"] == 4
        assert out[mid]["meta"]["codec"] == "raw-stub"


def test_frame_sample_exact(tiny_media):
    rows = frame_sample(tiny_media, frame_bytes=64, n_frames=4).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == {3, 4}  # videos only
    # media 3: 130 bytes -> 3 frames total, k=3; media 4: 40 bytes -> 1
    for mid, payload, dur in ((3, b"v" * 130, 1300), (4, b"w" * 40, 400)):
        total = (len(payload) + 63) // 64
        k = min(4, total)
        got = sorted(by_media[mid], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in got] == list(range(k))
        for j, r in enumerate(got):
            src = j * total // k
            frame = payload[src * 64:(src + 1) * 64]
            assert r["src_frame"] == src
            assert r["ts_ms"] == src * dur // total
            assert r["frame_sha256"] == hashlib.sha256(frame).hexdigest()


def test_registered_wrappers_nonempty(spark):
    from kafkastreams_tp3_is_spark.operators.multimodal import (
        media_frame_sample, media_resize)
    r = media_resize(spark, SF_DIR)
    assert r.count() > 0
    f = media_frame_sample(spark, SF_DIR)
    assert f.count() > 0
    assert synthetic_media(spark, SF_DIR).count() > 0


# --- perceptual-hash image near-dup (dHash) ---------------------------

def _py_dhash(payload: bytes) -> int:
    """Pure-Python restatement of the stub dHash kernel."""
    n = len(payload)
    if n == 0:
        return 0
    g = [payload[(i * n) // 72] for i in range(72)]
    v = 0
    for r in range(8):
        for c in range(8):
            v = (v << 1) | int(g[r * 9 + c + 1] > g[r * 9 + c])
    return v - (1 << 64) if v >= (1 << 63) else v


def test_dhash_stub_exact(spark):
    """The Arrow kernel's fingerprints must equal a pure-Python
    restatement on known payloads, including the empty payload and one
    with the sign bit (bit 0 = MSB) set."""
    from kafkastreams_tp3_is_spark.operators.multimodal import (
        MEDIA_SCHEMA, image_dhash)

    payloads = [b"", bytes(range(72)), bytes(reversed(range(72))),
                b"\x00\xff" * 50, b"abcdefgh"]
    rows = [(i, "image", p, None) for i, p in enumerate(payloads)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r["dhash"]
           for r in image_dhash(media, kernel="stub").collect()}
    want = {i: _py_dhash(p) for i, p in enumerate(payloads)}
    assert got == want
    assert want[1] < 0, "ascending grid must set the MSB (sign bit)"


def test_dhash_pairs_recall_planted(spark):
    """A planted near-identical image (one byte edited at a sampled grid
    position) must be recovered by the block-combination candidate
    machinery with the exact hamming distance, and the full hamming<=3
    pair set must equal the brute-force all-pairs answer."""
    from itertools import combinations

    from kafkastreams_tp3_is_spark.operators.multimodal import (
        MEDIA_SCHEMA, image_dhash_pairs_df)

    rng_payload = bytes((i * 37 + 11) % 256 for i in range(720))
    twin = bytearray(rng_payload)
    twin[0] = (twin[0] + 1) % 256        # position 0 IS sampled (i=0)
    far = bytes((i * 101 + 5) % 256 for i in range(500))
    rows = [(1, "image", rng_payload, None),
            (2, "image", bytes(twin), None),
            (3, "image", far, None),
            (4, "audio", rng_payload, None)]   # non-image: excluded
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {(r["a_id"], r["b_id"]): r["hamming"]
           for r in image_dhash_pairs_df(media, max_hamming=3).collect()}
    fps = {i: _py_dhash(p) for i, _, p, _ in rows[:3]}
    want = {(a, b): bin(fps[a] ^ fps[b]).count("1")
            for a, b in combinations(sorted(fps), 2)
            if bin(fps[a] ^ fps[b]).count("1") <= 3}
    assert (1, 2) in want, "fixture must actually plant a near-dup"
    assert got == want
    # guarantee ceiling is enforced, not silently ignored
    with pytest.raises(ValueError, match="hamming"):
        image_dhash_pairs_df(media, max_hamming=5).collect()


def test_dhash_kernel_pil_wiring(monkeypatch):
    """The PIL dHash kernel must decode -> grayscale -> 9x8 resize and
    hash the PIXEL grid (asserted via an injected fake whose resized
    pixels are controlled); undecodable payloads fall back to the stub's
    byte-grid hash."""
    import numpy as np
    import pandas as pd

    import kafkastreams_tp3_is_spark.operators.multimodal as mm

    _install_fake_pil(monkeypatch)
    import sys as _sys
    img_mod = _sys.modules["PIL.Image"]
    img_mod.BILINEAR = 2
    grid = np.arange(72, dtype=np.uint8).reshape(8, 9)

    class _DhashFake:
        def __init__(self):
            pass

        def convert(self, mode):
            assert mode == "L"
            return self

        def resize(self, size, resample=None):
            assert size == (9, 8)
            return self

        def __array__(self, dtype=None, copy=None):
            return grid

    monkeypatch.setattr(img_mod, "open", lambda bio: _DhashFake())
    pdf = pd.DataFrame({"media_id": [7], "content": [b"whatever"]})
    out = pd.concat(mm.dhash_kernel_pil()(iter([pdf])))
    # ascending pixel grid: every adjacent comparison is True -> all-ones
    assert int(out["dhash"].iloc[0]) == -1
    # undecodable: stub byte-grid fallback
    monkeypatch.setattr(
        img_mod, "open",
        lambda bio: (_ for _ in ()).throw(OSError("bad")))
    out2 = pd.concat(mm.dhash_kernel_pil()(iter([pdf])))
    assert int(out2["dhash"].iloc[0]) == _py_dhash(b"whatever")


# --- kernel selection: real decoders behind optional imports ----------

class _FakeImage:
    """Minimal PIL.Image stand-in: 'decodes' any payload to a 2x2 image.
    Records calls so the test can assert the real-kernel wiring ran."""

    calls: list = []

    def __init__(self, payload):
        self._p = payload
        self.height = 2

    def convert(self, mode):
        return self

    def getdata(self):
        return [10, 20, 30, 40]

    def resize(self, size):
        _FakeImage.calls.append(("resize", size))
        return self

    def save(self, buf, format=None):
        buf.write(b"PNGDATA:" + bytes(self._p[:4]))


def _install_fake_pil(monkeypatch):
    import sys
    import types

    pil = types.ModuleType("PIL")
    img_mod = types.ModuleType("PIL.Image")
    img_mod.open = lambda bio: _FakeImage(bio.getvalue())
    pil.Image = img_mod
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", img_mod)


def test_kernel_auto_selection_both_ways(monkeypatch):
    """auto -> stub where PIL is absent (this container), and -> pil the
    moment the library imports; explicit real kernel without the library
    raises an actionable ImportError rather than failing inside a task."""
    import kafkastreams_tp3_is_spark.operators.multimodal as mm

    assert mm.available_image_codec() == "stub"  # no PIL in container
    assert mm._resolve("auto", "image") == "stub"
    with pytest.raises(ImportError, match="pil"):
        mm._resolve("pil", "image")
    _install_fake_pil(monkeypatch)
    assert mm.available_image_codec() == "pil"
    assert mm._resolve("auto", "image") == "pil"
    assert mm._resolve("stub", "image") == "stub"  # explicit stub wins
    with pytest.raises(ValueError, match="unknown"):
        mm._resolve("ffmpeg", "image")


def test_pil_kernels_drive_real_decoder(monkeypatch):
    """The PIL-backed batch kernels (called in-process, as mapInPandas
    would on an executor) must decode -> resize -> re-encode through the
    library: resized content carries the fake encoder's bytes, features
    become band means of the decoded pixels, and undecodable rows
    degrade per-row (empty content / stub feature) instead of failing
    the batch."""
    import pandas as pd

    import kafkastreams_tp3_is_spark.operators.multimodal as mm

    _install_fake_pil(monkeypatch)
    pdf = pd.DataFrame({
        "media_id": [1],
        "media_type": ["image"],
        "content": [b"abcdefgh"],
        "meta": [{"width": 2, "height": 4, "duration_ms": 7, "codec": "raw"}],
    })
    _FakeImage.calls.clear()
    out = pd.concat(mm.resize_kernel_pil(4, 4)(iter([pdf])))
    assert ("resize", (4, 4)) in _FakeImage.calls
    assert bytes(out["content"].iloc[0]) == b"PNGDATA:abcd"
    assert out["meta"].iloc[0] == {"width": 4, "height": 4,
                                   "duration_ms": 7, "codec": "png"}

    feats = pd.concat(mm.feature_kernel_pil(2)(iter([pdf])))
    # fake image: 2 rows of pixels [10,20] / [30,40] -> band means
    assert feats["feature"].iloc[0] == [15 / 255.0, 35 / 255.0]

    # undecodable payload: per-row degradation, batch survives
    img_mod = __import__("sys").modules["PIL.Image"]
    monkeypatch.setattr(
        img_mod, "open",
        lambda bio: (_ for _ in ()).throw(OSError("bad image")))
    out2 = pd.concat(mm.resize_kernel_pil(4, 4)(iter([pdf])))
    assert bytes(out2["content"].iloc[0]) == b""
    assert out2["meta"].iloc[0]["codec"] == "undecodable"
    feats2 = pd.concat(mm.feature_kernel_pil(2)(iter([pdf])))
    stub = pd.concat(mm.feature_kernel_stub(2)(iter([pdf])))
    assert feats2["feature"].iloc[0] == stub["feature"].iloc[0]


def test_pyav_kernel_drives_real_decoder(monkeypatch):
    """The PyAV-backed frame kernel demuxes via av.open, samples evenly
    over the DECODED frame count, and hashes the RGB plane — verified
    with an injected fake av module (the real library is absent here)."""
    import sys
    import types

    import pandas as pd

    import kafkastreams_tp3_is_spark.operators.multimodal as mm

    class _Frame:
        def __init__(self, i):
            self.time = i * 0.5
            self._raw = bytes([i] * 4)

        def to_rgb(self):
            class _P:
                planes = [self._raw]
            return _P()

    class _Container:
        def __init__(self, payload):
            self._n = len(payload)

        def decode(self, video=0):
            return iter(_Frame(i) for i in range(self._n))

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    av = types.ModuleType("av")
    av.open = lambda bio: _Container(bio.getvalue())
    monkeypatch.setitem(sys.modules, "av", av)
    assert mm.available_video_codec() == "pyav"
    assert mm._resolve("auto", "video") == "pyav"

    pdf = pd.DataFrame({"media_id": [9], "content": [b"abcdefgh"]})  # 8 frames
    out = pd.concat(mm.frame_kernel_pyav(4)(iter([pdf])))
    assert list(out["frame_idx"]) == [0, 1, 2, 3]
    assert list(out["src_frame"]) == [0, 2, 4, 6]  # floor(j*8/4)
    assert list(out["ts_ms"]) == [0, 1000, 2000, 3000]
    assert (out["frame_sha256"].iloc[1]
            == hashlib.sha256(bytes([2] * 4)).hexdigest())
