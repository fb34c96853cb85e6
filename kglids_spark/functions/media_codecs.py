"""Real, dependency-free media codecs for the multimodal operators.

The container ships no image/audio libraries, so the formats chosen are
ones a short pure-numpy parser decodes FOR REAL — no stubbed decode:

- images: uncompressed 24-bit BMP (BITMAPINFOHEADER) — encoder and
  decoder below are complete implementations of that subset.
- audio: 16-bit PCM mono WAV (RIFF) — ditto.
- video: a trivial length-prefixed container of BMP frames
  (``KGV1`` magic), standing in for a real codec; each frame is a real
  BMP decoded by the same image path.

If PIL / soundfile ARE importable (not in this container, but in a real
deployment), :func:`decode_image` / :func:`decode_audio` fall back to
them for payloads that aren't BMP/WAV — the optional-import path the
reference's torch-based feature extractors would take
(kg_governor/data_profiling/profile_creators — embedding models absent
from the checkout; documented divergence).

Everything is deterministic from (seed, media index): the SAME pure
Python runs in executors (via mapInPandas batches) and at import time
on the driver to generate the DuckDB oracle's expected VALUES rows, so
`multimodal_*` queries are value-checked end-to-end through the real
distributed plumbing.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

FEATURE_DIM = 16

# --------------------------------------------------------------------------
# BMP (uncompressed 24-bit, BITMAPINFOHEADER)

def encode_bmp(pixels: np.ndarray) -> bytes:
    """pixels: (h, w, 3) uint8 RGB → BMP bytes (rows bottom-up, BGR,
    4-byte padded — the real on-disk format)."""
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    image_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + image_size, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, image_size, 2835, 2835, 0, 0)
    body = bytearray()
    bgr = pixels[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    pad = b"\x00" * (row_size - w * 3)
    for r in range(h):
        body += bgr[r].tobytes() + pad
    return header + info + bytes(body)


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP bytes → (h, w, 3) uint8 RGB. Real parser for the 24-bit
    uncompressed subset (the one encode_bmp writes)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant: {bpp}bpp compression={compression}")
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_size * abs(h), offset=data_offset)
    rows = rows.reshape(abs(h), row_size)[:, : w * 3].reshape(abs(h), w, 3)
    if h > 0:  # bottom-up
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


# --------------------------------------------------------------------------
# WAV (16-bit PCM mono)

def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """samples: int16 array → RIFF/WAVE bytes."""
    pcm = samples.astype("<i2").tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16)
    data = struct.pack("<4sI", b"data", len(pcm)) + pcm
    return struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE") + fmt + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes → (int16 samples, sample rate). Walks RIFF
    chunks properly (fmt may not be first)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("unsupported WAV variant (need 16-bit PCM mono)")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return samples, rate


# --------------------------------------------------------------------------
# trivial video container: KGV1 | n_frames:u32 | (len:u32, bmp)*

def encode_video(frames: list[bytes]) -> bytes:
    out = bytearray(struct.pack("<4sI", b"KGV1", len(frames)))
    for f in frames:
        out += struct.pack("<I", len(f)) + f
    return bytes(out)


def decode_video(payload: bytes) -> list[bytes]:
    if payload[:4] != b"KGV1":
        raise ValueError("not a KGV1 payload")
    (n,) = struct.unpack_from("<I", payload, 4)
    frames, pos = [], 8
    for _ in range(n):
        (size,) = struct.unpack_from("<I", payload, pos)
        frames.append(payload[pos + 4 : pos + 4 + size])
        pos += 4 + size
    return frames


# --------------------------------------------------------------------------
# optional-import fallbacks for non-BMP/WAV payloads

def decode_image(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB from any supported image payload: BMP via
    the built-in parser, anything else via PIL if importable."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    try:
        import io

        from PIL import Image  # optional; absent in this container
    except ImportError as e:
        raise NotImplementedError("non-BMP image needs PIL, which is unavailable") from e
    return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """(int16 samples, rate) from WAV via the built-in parser, other
    formats via soundfile if importable."""
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    try:
        import io

        import soundfile  # optional; absent in this container
    except ImportError as e:
        raise NotImplementedError("non-WAV audio needs soundfile, which is unavailable") from e
    data, rate = soundfile.read(io.BytesIO(payload), dtype="int16")
    return np.asarray(data), rate


# --------------------------------------------------------------------------
# deterministic synthesis (shared by executors and the oracle generator)

def _rand_bytes(tag: str, i: int, seed: int, n: int) -> np.ndarray:
    """n pseudo-random bytes from iterated sha256 — pure Python/numpy,
    identical everywhere."""
    out = bytearray()
    counter = 0
    while len(out) < n:
        out += hashlib.sha256(f"{tag}:{seed}:{i}:{counter}".encode()).digest()
        counter += 1
    return np.frombuffer(bytes(out[:n]), dtype=np.uint8)


def synth_media_row(i: int, seed: int = 42) -> dict:
    """One deterministic media row: kind cycles image/audio/video;
    payload is a REAL encoded BMP / WAV / KGV1-of-BMPs."""
    kind = ("image", "audio", "video")[i % 3]
    if kind == "image":
        w, h = 16 + (i % 5) * 4, 12 + (i % 3) * 4
        pixels = _rand_bytes("px", i, seed, w * h * 3).reshape(h, w, 3)
        payload, mime, duration = encode_bmp(pixels), "image/bmp", None
    elif kind == "audio":
        n_samples = 400 + (i % 7) * 100
        raw = _rand_bytes("au", i, seed, n_samples * 2)
        samples = raw.view("<i2") - 8192  # roughly centred int16 noise
        rate = 8000
        payload, mime = encode_wav(samples, rate), "audio/wav"
        duration = int(n_samples * 1000 / rate)
        w = h = None
    else:
        w, h = 16, 12
        n_frames = 3 + (i % 4)
        frames = [
            encode_bmp(_rand_bytes(f"fr{f}", i, seed, w * h * 3).reshape(h, w, 3))
            for f in range(n_frames)
        ]
        payload, mime = encode_video(frames), "video/x-kgv1"
        duration = n_frames * 40  # 25 fps
    return {
        "media_id": f"m-{i:08d}",
        "kind": kind,
        "mime": mime,
        "payload": payload,
        "width": w,
        "height": h,
        "duration_ms": duration,
    }


# --------------------------------------------------------------------------
# feature extraction (decode → FEATURE_DIM floats)

def image_features(pixels: np.ndarray) -> list[float]:
    """mean/std per RGB channel, dims, luma quartiles + 6-bin histogram
    → 16 floats. Everything float64 in a fixed order so executor and
    oracle computations are bit-identical."""
    p = pixels.astype(np.float64)
    luma = p @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(luma, bins=6, range=(0.0, 255.0))
    feats = [
        *(p[:, :, c].mean() for c in range(3)),
        *(p[:, :, c].std() for c in range(3)),
        float(pixels.shape[1]),
        float(pixels.shape[0]),
        float(np.quantile(luma, 0.25)),
        float(np.quantile(luma, 0.75)),
        *(hist / luma.size),
    ]
    return [float(x) for x in feats]


def audio_features(samples: np.ndarray, rate: int) -> list[float]:
    """mean/std/rms/zero-crossing-rate/duration + 8-bin histogram
    + 3 leading autocorrelations → 16 floats."""
    s = samples.astype(np.float64)
    zc = float(np.mean(np.abs(np.diff(np.signbit(s).astype(np.float64)))))
    hist, _ = np.histogram(s, bins=8, range=(-32768.0, 32768.0))
    sc = s - s.mean()
    denom = float(np.dot(sc, sc)) or 1.0
    ac = [float(np.dot(sc[:-k], sc[k:]) / denom) for k in (1, 2, 3)]
    feats = [
        s.mean(),
        s.std(),
        float(np.sqrt(np.mean(s**2))),
        zc,
        float(len(s)) / rate,
        *(hist / s.size),
        *ac,
    ]
    return [float(x) for x in feats]


def video_features(frames: list[bytes]) -> list[float]:
    """first-frame image features with the dims slots carrying
    (n_frames, mean inter-frame luma delta) — a real temporal signal."""
    feats = image_features(decode_bmp(frames[0]))
    lumas = [decode_bmp(f).astype(np.float64) @ np.array([0.299, 0.587, 0.114]) for f in frames]
    deltas = [float(np.mean(np.abs(lumas[k + 1] - lumas[k]))) for k in range(len(lumas) - 1)]
    feats[6] = float(len(frames))
    feats[7] = float(np.mean(deltas)) if deltas else 0.0
    return feats


def features_for_payload(kind: str, payload: bytes) -> list[float]:
    """Dispatch: REAL decode of the payload, then FEATURE_DIM floats."""
    if kind == "image":
        return image_features(decode_image(payload))
    if kind == "audio":
        return audio_features(*decode_audio(payload))
    if kind == "video":
        return video_features(decode_video(payload))
    raise ValueError(f"unknown media kind: {kind}")


def dhash64(pixels: np.ndarray) -> int:
    """64-bit difference hash (dHash — Krawetz's perceptual image
    fingerprint): integer luma (r+g+b — no float rounding, so the
    pure-Python test twin is trivially bit-exact), nearest-neighbour
    subsample to a 9×8 grid, then one bit per horizontally-adjacent
    brightness increase. Returned as a SIGNED 64-bit value (two's
    complement) so it rides a Spark LongType column directly.

    Near-identical images (resize, mild noise, re-encode) land within
    a small Hamming radius — the image analogue of SimHash, and the
    pair search reuses exactly that machinery
    (dedup.hamming_near_dup_pairs)."""
    h, w, _ = pixels.shape
    gray = pixels.astype(np.int64).sum(axis=2)
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(9) * w) // 9
    g = gray[np.ix_(ys, xs)]
    bits = (g[:, 1:] > g[:, :-1]).flatten()
    v = 0
    for i, b in enumerate(bits.tolist()):
        if b:
            v |= 1 << i
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def audio_fingerprint64(samples: np.ndarray) -> int:
    """64-bit audio fingerprint: the energy-envelope delta hash — the
    audio analogue of :func:`dhash64` (and of Haitsma-Kalker's
    sign-of-band-energy-difference scheme, public AudioFingerprinting
    literature): sum |amplitude| (exact int64 arithmetic — the
    pure-Python test twin is bit-exact) over 65 equal time windows,
    then one bit per window-to-window energy INCREASE. Strict-``>``
    comparisons make the hash invariant under any positive gain (a
    monotone transform preserves every inequality), and near-identical
    clips (mild noise, re-encode) land within a small Hamming radius.
    Returned signed (two's complement) to ride a Spark LongType.

    Pair search is dedup.hamming_near_dup_pairs — text SimHash, image
    dHash and audio fingerprints all share one blocking join."""
    n = int(samples.shape[0])
    e = np.abs(samples.astype(np.int64))
    cum = np.concatenate([[0], np.cumsum(e)])
    bounds = (np.arange(66, dtype=np.int64) * n) // 65
    wins = cum[bounds[1:]] - cum[bounds[:-1]]
    bits = wins[1:] > wins[:-1]
    v = 0
    for i, b in enumerate(bits.tolist()):
        if b:
            v |= 1 << i
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def video_fingerprint64(payload: bytes) -> int:
    """64-bit video fingerprint: per-frame :func:`dhash64`, then a
    majority vote per bit position across frames (the SimHash
    construction applied to frame hashes — videohash-style, public
    scheme). A clip sharing most frames with another (re-encode, one
    tampered frame) lands within a small Hamming radius; bit b is set
    iff STRICTLY more than half the frames set it, so the vote is
    deterministic under even frame counts. Signed two's complement for
    a Spark LongType column."""
    frames = decode_video(payload)
    n = len(frames)
    votes = [0] * 64
    for fpayload in frames:
        h = dhash64(decode_bmp(fpayload)) & ((1 << 64) - 1)
        for b in range(64):
            votes[b] += (h >> b) & 1
    v = 0
    for b in range(64):
        if votes[b] * 2 > n:
            v |= 1 << b
    if v >= 1 << 63:
        v -= 1 << 64
    return v
