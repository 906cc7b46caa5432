"""Deterministic synthetic video generation (no external data).

Every video is a pure function of ``video_id``: a drifting sinusoidal
gradient per frame (+ per-pixel noise), with a HARD scene cut planted
mid-clip in every 4th video (the content inverts), encoded as either
``gray8_seq`` — a self-describing raw container this repo defines
(ASCII header ``VID0\\n{w} {h} {n_frames} {fps}\\n`` followed by
``n_frames`` × ``w*h`` grayscale bytes, so the decode path is REAL:
header parsing, size validation, frame slicing) — or ``h264``, a
deliberately-undecodable stub payload exercising the quarantine path
(the container ships no ffmpeg/pyav). Mirrors ``synth/imagegen.py``.
"""

from __future__ import annotations

import numpy as np

FORMATS = ("gray8_seq", "h264")
FPS = 10


def _rng(video_id: int) -> np.random.Generator:
    return np.random.default_rng(0x51DE0 ^ (int(video_id) * 2_654_435_761 % (1 << 63)))


def make_frames(video_id: int) -> np.ndarray:
    """(n_frames, h, w) uint8, deterministic per id. Smooth drift between
    consecutive frames; every 4th video switches content (inverts) at the
    midpoint so motion/cut detection has planted signal."""
    rng = _rng(video_id)
    w = int(rng.integers(16, 40))
    h = int(rng.integers(16, 40))
    n = int(rng.integers(6, 14))
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    fx, fy = rng.uniform(0.5, 2.0, 2)
    drift = float(rng.uniform(0.05, 0.25))
    frames = np.empty((n, h, w), dtype=np.float64)
    for i in range(n):
        frames[i] = 127.5 + 100.0 * np.sin(
            2 * np.pi * (fx * xx / w + fy * yy / h) + i * drift
        ) + rng.normal(0, 3.0, (h, w))
    if video_id % 4 == 1:  # planted scene cut
        frames[n // 2 :] = 255.0 - frames[n // 2 :]
    return np.clip(frames, 0, 255).astype(np.uint8)


def encode_gray8_seq(frames: np.ndarray, fps: int = FPS) -> bytes:
    n, h, w = frames.shape
    return f"VID0\n{w} {h} {n} {fps}\n".encode("ascii") + frames.tobytes()


NEAR_DUP_ID_OFFSET = 1_000_000  # planted twin of video i gets id i + OFFSET
NEAR_DUP_DELTA = 6  # brightness shift of the re-encoded twin


def _is_codec_stub(video_id: int) -> bool:
    """External-codec stub cadence (≙ mmrows.AUDIO_STUB_MOD). ONE
    definition: make_video quarantines these ids AND near_dup_video skips
    them — if the predicates drifted apart, quarantined base rows would
    get planted twins (pairless singletons corrupting the dedup
    fixture)."""
    return video_id % 9 == 5


def near_dup_video(video_id: int, delta: int = NEAR_DUP_DELTA) -> dict | None:
    """A brightness-shifted re-encode of video ``video_id`` — same
    recording, new exposure/encoder pass: byte-different, slice-block
    luminance shape identical. Returns ``None`` for external-codec stub
    ids (their base row is quarantined, so a planted twin would be a
    pairless singleton — the fixture skips them by design)."""
    if _is_codec_stub(video_id):
        return None
    frames = make_frames(video_id).astype(np.int64)
    frames = np.clip(frames + delta, 0, 255).astype(np.uint8)
    n, h, w = frames.shape
    return {
        "video_id": int(video_id) + NEAR_DUP_ID_OFFSET,
        "fmt": "gray8_seq",
        "width": int(w),
        "height": int(h),
        "n_frames": int(n),
        "fps": FPS,
        "data": encode_gray8_seq(frames),
    }


def make_video(video_id: int) -> dict:
    """One synthetic row: id, format, dims, frame count, encoded bytes."""
    frames = make_frames(video_id)
    n, h, w = frames.shape
    if _is_codec_stub(video_id):  # external-codec stub → quarantine path
        rng = _rng(video_id)
        blob, fmt = b"\x00\x00\x00\x01" + rng.bytes(64), "h264"
    else:
        blob, fmt = encode_gray8_seq(frames), "gray8_seq"
    return {
        "video_id": int(video_id),
        "fmt": fmt,
        "width": int(w),
        "height": int(h),
        "n_frames": int(n),
        "fps": FPS,
        "data": blob,
    }
