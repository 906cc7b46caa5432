"""Deterministic synthetic image generation (no external data).

Every image is a pure function of ``image_id``: seeded sinusoidal
gradients + per-pixel noise, encoded as either binary PPM (P6 — a real,
publicly-specified format parsed byte-for-byte by the decoder) or raw
interleaved RGB. Mirrors ``synth/audiogen.py``: the synthetic payloads
make the decode path REAL (header parsing, size validation, byte layout)
while staying dependency-free and reproducible across processes.
"""

from __future__ import annotations

import numpy as np

FORMATS = ("ppm", "rgb8_raw")


def _rng(image_id: int) -> np.random.Generator:
    return np.random.default_rng(0xC0FFEE ^ (int(image_id) * 2_654_435_761 % (1 << 63)))


def make_pixels(image_id: int) -> np.ndarray:
    """(h, w, 3) uint8, deterministic per id. Mix of flat / gradient /
    noisy images so the feature distributions (contrast, entropy, edges)
    actually spread."""
    rng = _rng(image_id)
    w = int(rng.integers(16, 64))
    h = int(rng.integers(16, 64))
    kind = image_id % 3
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    if kind == 0:  # near-flat card
        base = np.full((h, w), float(rng.integers(40, 216)))
        img = base[:, :, None] + rng.normal(0, 2.0, (h, w, 3))
    elif kind == 1:  # sinusoidal gradient
        fx, fy = rng.uniform(0.5, 3.0, 2)
        base = 127.5 + 100.0 * np.sin(2 * np.pi * (fx * xx / w + fy * yy / h))
        phase = rng.uniform(0, 50, 3)
        img = base[:, :, None] + phase[None, None, :]
    else:  # high-entropy noise
        img = rng.uniform(0, 255, (h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def encode_ppm(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    return f"P6\n{w} {h}\n255\n".encode("ascii") + px.tobytes()


def make_image(image_id: int) -> dict:
    """One synthetic row: id, format, dims, encoded bytes."""
    px = make_pixels(image_id)
    h, w, _ = px.shape
    fmt = FORMATS[image_id % len(FORMATS)]
    blob = encode_ppm(px) if fmt == "ppm" else px.tobytes()
    return {
        "image_id": int(image_id),
        "fmt": fmt,
        "width": int(w),
        "height": int(h),
        "data": blob,
    }


NEAR_DUP_ID_OFFSET = 1_000_000  # planted twin of image i gets id i + OFFSET
NEAR_DUP_DELTA = 6  # brightness shift of the re-encoded twin


def near_dup_image(image_id: int, delta: int = NEAR_DUP_DELTA) -> dict:
    """A brightness-shifted re-encode of image ``image_id`` in the OTHER
    container format — the classic image near-duplicate (same picture,
    new exposure + new encoder): byte-different (exact dedup misses it),
    block-luminance-shape identical (aHash catches it). Data-generation
    layer by design, like clips.near_dup_row."""
    px = make_pixels(image_id).astype(np.int64)
    px = np.clip(px + delta, 0, 255).astype(np.uint8)
    h, w, _ = px.shape
    fmt = FORMATS[(image_id + 1) % len(FORMATS)]
    blob = encode_ppm(px) if fmt == "ppm" else px.tobytes()
    return {
        "image_id": int(image_id) + NEAR_DUP_ID_OFFSET,
        "fmt": fmt,
        "width": int(w),
        "height": int(h),
        "data": blob,
    }
