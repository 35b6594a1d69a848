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
