"""Multimodal operators: real pure-numpy codecs (BMP/WAV/KGV1) and the
Arrow-batched decode/feature/resize/frame-sampling plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kglids_spark.functions import media_codecs as MC
from kglids_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    resize_images,
    sample_frames,
    synthetic_media,
)


def test_bmp_roundtrip_exact():
    for w, h in [(16, 12), (17, 9), (1, 1)]:  # incl. non-4-aligned rows
        px = MC._rand_bytes("px", w * h, 1, w * h * 3).reshape(h, w, 3)
        assert np.array_equal(MC.decode_bmp(MC.encode_bmp(px)), px)


def test_wav_roundtrip_exact():
    s = (MC._rand_bytes("au", 3, 1, 1000).view("<i2") - 8192)
    dec, rate = MC.decode_wav(MC.encode_wav(s, 16000))
    assert rate == 16000
    assert np.array_equal(dec, s)


def test_video_container_roundtrip():
    px = MC._rand_bytes("f", 0, 1, 8 * 6 * 3).reshape(6, 8, 3)
    frames = [MC.encode_bmp(px), MC.encode_bmp(px[::-1].copy())]
    assert MC.decode_video(MC.encode_video(frames)) == frames


def test_non_bmp_image_needs_optional_pil():
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL available: fallback would decode instead of raising")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        MC.decode_image(b"\x89PNG\r\n\x1a\nnot-really-a-png")


def test_extract_features_distributed_matches_driver(spark):
    """The mapInPandas decode must equal the same pure-Python decode run
    driver-side — pins the Arrow plumbing (batching, binary transfer)."""
    n = 30
    got = {
        r.media_id: (r.kind, list(r.features))
        for r in extract_features(synthetic_media(spark, n)).collect()
    }
    assert len(got) == n
    for i in range(n):
        row = MC.synth_media_row(i)
        kind, feats = got[row["media_id"]]
        assert kind == row["kind"]
        assert len(feats) == FEATURE_DIM
        assert feats == MC.features_for_payload(row["kind"], row["payload"])


def test_resize_images_real(spark):
    out = resize_images(synthetic_media(spark, 12), target_w=8, target_h=6)
    rows = out.filter(F.col("kind") == "image").collect()
    assert rows
    for r in rows:
        px = MC.decode_bmp(bytes(r.payload))
        assert px.shape == (6, 8, 3)
        assert (r.width, r.height) == (8, 6)
    # non-image payloads untouched
    audio = out.filter(F.col("kind") == "audio").first()
    orig = MC.synth_media_row(int(audio.media_id.split("-")[1]))
    assert bytes(audio.payload) == orig["payload"]


def test_sample_frames_decodes_real_frames(spark):
    out = sample_frames(synthetic_media(spark, 12), every_ms=40).collect()
    assert out
    for r in out:
        i = int(r.media_id.split("-")[1])
        row = MC.synth_media_row(i)
        frames = MC.decode_video(row["payload"])
        assert 0 <= r.frame_idx < len(frames)
        px = MC.decode_bmp(frames[r.frame_idx]).astype(np.float64)
        assert r.frame_luma == pytest.approx(
            float((px @ np.array([0.299, 0.587, 0.114])).mean())
        )
