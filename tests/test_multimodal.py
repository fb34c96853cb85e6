"""Multimodal operators: real pure-numpy codecs (BMP/WAV/KGV1) and the
Arrow-batched decode/feature/resize/frame-sampling plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kglids_spark.functions import media_codecs as MC
from kglids_spark.operators.multimodal import (
    MEDIA_SCHEMA,
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

def test_dhash64_invariances():
    """dHash is a perceptual fingerprint: bit-identical on exact copies,
    within a small Hamming radius under nearest-neighbour resize of a
    smooth image, and far from a structurally different image."""

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    y, x = np.mgrid[0:48, 0:64]
    smooth = np.stack([(x * 3) % 256, (x * 2 + y) % 200, x % 128], axis=2)
    smooth = smooth.astype(np.uint8)
    h0 = MC.dhash64(smooth)
    assert -(1 << 63) <= h0 < (1 << 63)
    assert MC.dhash64(smooth.copy()) == h0
    # nearest-neighbour resize (what resize_images does) keeps gradients
    ys = (np.arange(24) * 48) // 24
    xs = (np.arange(96) * 64) // 96
    resized = smooth[np.ix_(ys, xs)]
    assert ham(MC.dhash64(resized), h0) <= 4
    # horizontally mirrored image reverses every gradient sign
    assert ham(MC.dhash64(smooth[:, ::-1]), h0) >= 32


def test_perceptual_hashes_distributed_matches_driver(spark):
    """The mapInPandas dHash must equal the driver-side replay, and only
    image rows may reach the decode (audio/video never deserialized)."""
    from kglids_spark.operators.multimodal import perceptual_hashes

    n = 24
    got = {
        r.media_id: r.phash
        for r in perceptual_hashes(synthetic_media(spark, n)).collect()
    }
    n_images = 0
    for i in range(n):
        row = MC.synth_media_row(i)
        if row["kind"] != "image":
            assert row["media_id"] not in got
            continue
        n_images += 1
        assert got[row["media_id"]] == MC.dhash64(MC.decode_image(row["payload"]))
    assert len(got) == n_images > 0


def test_image_near_dup_end_to_end(spark):
    """Planted near-duplicate image found by dHash + Hamming blocking:
    the LAION-style image-dedup path (decode → signature → pigeonhole
    bucket join), with an unrelated image correctly left unpaired."""
    from kglids_spark.operators.dedup import hamming_near_dup_pairs
    from kglids_spark.operators.multimodal import perceptual_hashes

    y, x = np.mgrid[0:32, 0:36]
    base = np.stack([(x * 5) % 256, (y * 3) % 256, ((x + y) * 2) % 256], axis=2)
    base = base.astype(np.uint8)
    near = base.copy()
    near[5, 7] = 255 - near[5, 7]  # one-pixel tamper off the sample grid
    other = base[:, ::-1]  # mirrored: structurally different
    rows = [
        ("img-a", "image", "image/bmp", MC.encode_bmp(base), 36, 32, None),
        ("img-b", "image", "image/bmp", MC.encode_bmp(near), 36, 32, None),
        ("img-c", "image", "image/bmp", MC.encode_bmp(other), 36, 32, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    sigs = perceptual_hashes(media)
    pairs = {
        (r.id1, r.id2)
        for r in hamming_near_dup_pairs(
            sigs, id_col="media_id", sig_col="phash", max_hamming=3
        ).collect()
    }
    assert pairs == {("img-a", "img-b")}
    # the one-call op (persist -> eager checkpoint -> unpersist) must
    # agree with the composed form, in both materialize modes
    from kglids_spark.operators.multimodal import image_near_dup_pairs

    for mat in (True, False):
        got = {
            (r.id1, r.id2)
            for r in image_near_dup_pairs(
                media, max_hamming=3, materialize=mat
            ).collect()
        }
        assert got == pairs


def test_audio_fingerprint64_invariances():
    """Gain-invariant (strict > survives any positive scale), bit-exact
    on copies, far from a reversed clip."""

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    s = (MC._rand_bytes("au", 9, 1, 4000).view("<i2") - 8192).astype(np.int64)
    h0 = MC.audio_fingerprint64(s)
    assert -(1 << 63) <= h0 < (1 << 63)
    assert MC.audio_fingerprint64(s.copy()) == h0
    assert MC.audio_fingerprint64(s * 3) == h0  # uniform gain
    # small additive noise moves few window-energy orderings
    noisy = s + (MC._rand_bytes("nz", 9, 1, 2000 * 2).view("<i2") % 7) - 3
    assert ham(MC.audio_fingerprint64(noisy), h0) <= 6
    assert ham(MC.audio_fingerprint64(s[::-1].copy()), h0) >= 16


def test_audio_fingerprints_distributed_matches_driver(spark):
    from kglids_spark.operators.multimodal import audio_fingerprints

    n = 24
    got = {
        r.media_id: r.afp
        for r in audio_fingerprints(synthetic_media(spark, n)).collect()
    }
    n_audio = 0
    for i in range(n):
        row = MC.synth_media_row(i)
        if row["kind"] != "audio":
            assert row["media_id"] not in got
            continue
        n_audio += 1
        assert got[row["media_id"]] == MC.audio_fingerprint64(
            MC.decode_wav(row["payload"])[0]
        )
    assert len(got) == n_audio > 0


def test_audio_near_dup_end_to_end(spark):
    """Planted near-duplicate audio found by the fingerprint + Hamming
    blocking: a re-gained copy pairs with the original, a reversed clip
    does not."""
    from kglids_spark.operators.multimodal import audio_near_dup_pairs

    # bounded to ±8191 so the 2x-gain copy still fits int16 on encode
    s = (MC._rand_bytes("au", 5, 1, 4000).view("<i2") // 4).astype(np.int64)
    rows = [
        ("au-a", "audio", "audio/wav", MC.encode_wav(s.astype(np.int16)), None, None, 500),
        ("au-b", "audio", "audio/wav", MC.encode_wav((s * 2).astype(np.int16)), None, None, 500),
        ("au-c", "audio", "audio/wav", MC.encode_wav(s[::-1].astype(np.int16)), None, None, 500),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    for mat in (True, False):
        pairs = {
            (r.id1, r.id2)
            for r in audio_near_dup_pairs(media, max_hamming=3, materialize=mat).collect()
        }
        assert pairs == {("au-a", "au-b")}


def test_video_fingerprint64_invariances():
    """Majority-vote frame hashes: stable when one of five near-identical
    frames is tampered (4-1 votes keep every bit), far from a clip whose
    frames are all mirrored."""

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    y, x = np.mgrid[0:24, 0:32]
    frames = []
    for k in range(5):  # correlated frames: smooth pan, same gradients
        px = np.stack(
            [(x * 4 + k) % 256, (y * 3 + 2 * k) % 256, ((x + y) * 2) % 256],
            axis=2,
        ).astype(np.uint8)
        frames.append(px)
    enc = lambda fs: MC.encode_video([MC.encode_bmp(p) for p in fs])
    h0 = MC.video_fingerprint64(enc(frames))
    assert -(1 << 63) <= h0 < (1 << 63)
    assert MC.video_fingerprint64(enc([p.copy() for p in frames])) == h0
    tampered = [p.copy() for p in frames]
    tampered[2] = tampered[2][:, ::-1]  # one frame of five replaced
    assert ham(MC.video_fingerprint64(enc(tampered)), h0) <= 3
    mirrored = [p[:, ::-1].copy() for p in frames]
    assert ham(MC.video_fingerprint64(enc(mirrored)), h0) >= 32


def test_video_fingerprints_distributed_matches_driver(spark):
    from kglids_spark.operators.multimodal import video_fingerprints

    n = 24
    got = {
        r.media_id: r.vfp
        for r in video_fingerprints(synthetic_media(spark, n)).collect()
    }
    n_video = 0
    for i in range(n):
        row = MC.synth_media_row(i)
        if row["kind"] != "video":
            assert row["media_id"] not in got
            continue
        n_video += 1
        assert got[row["media_id"]] == MC.video_fingerprint64(row["payload"])
    assert len(got) == n_video > 0


def test_video_near_dup_end_to_end(spark):
    from kglids_spark.operators.multimodal import video_near_dup_pairs

    y, x = np.mgrid[0:24, 0:32]
    frames = [
        np.stack(
            [(x * 4 + k) % 256, (y * 3 + 2 * k) % 256, ((x + y) * 2) % 256],
            axis=2,
        ).astype(np.uint8)
        for k in range(5)
    ]
    enc = lambda fs: MC.encode_video([MC.encode_bmp(p) for p in fs])
    tampered = [p.copy() for p in frames]
    tampered[1] = tampered[1][:, ::-1]
    rows = [
        ("vid-a", "video", "video/x-kgv1", enc(frames), 32, 24, 200),
        ("vid-b", "video", "video/x-kgv1", enc(tampered), 32, 24, 200),
        ("vid-c", "video", "video/x-kgv1", enc([p[:, ::-1].copy() for p in frames]), 32, 24, 200),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    for mat in (True, False):
        pairs = {
            (r.id1, r.id2)
            for r in video_near_dup_pairs(media, max_hamming=3, materialize=mat).collect()
        }
        assert pairs == {("vid-a", "vid-b")}


def test_fingerprints_drop_null_payload_rows(spark):
    """A NULL payload must be filtered before the decode (documented
    drop), never reach bytes(None) in the executor."""
    from kglids_spark.operators.multimodal import (
        audio_fingerprints,
        perceptual_hashes,
        video_fingerprints,
    )

    rows = [("x-img", "image", None, None, None, None, None),
            ("x-au", "audio", None, None, None, None, None),
            ("x-vid", "video", None, None, None, None, None)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    assert perceptual_hashes(media).count() == 0
    assert audio_fingerprints(media).count() == 0
    assert video_fingerprints(media).count() == 0


def test_cli_media_dedup(spark, tmp_path, capsys):
    """`cli media-dedup` finds exactly the planted same-kind clones and
    writes the pair rows with their kind tags."""
    import json

    import pandas as pd

    from kglids_spark.cli import main

    rows = []
    for i in range(120):
        clone = (i // 3) % 10 == 9 and i >= 3
        r = dict(MC.synth_media_row(i - 3 if clone else i))
        r["media_id"] = f"m-{i:08d}"
        rows.append(r)
    src = str(tmp_path / "media")
    spark.createDataFrame(pd.DataFrame(rows), MEDIA_SCHEMA).write.parquet(src)
    out = str(tmp_path / "pairs")
    rc = main(["media-dedup", "--input", src, "--out", out])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["pairs_by_kind"] == {"image": 4, "audio": 4, "video": 4}
    assert summary["n_pairs"] == 12
    got = spark.read.parquet(out)
    assert got.count() == 12
    assert {r.kind for r in got.select("kind").distinct().collect()} == {
        "image", "audio", "video",
    }
