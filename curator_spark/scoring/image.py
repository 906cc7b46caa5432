"""Image decode + feature extraction — the shared pure-numpy core.

The image twin of :mod:`curator_spark.scoring.audio`: used identically by
the Spark ``mapInPandas`` stage and the pure-Python test oracle, so
decoded-pixel parity holds by construction. Reference analog: the image
branch of the media prompt types (``types/prompt.py:12-117`` — bytes +
metadata, decoded lazily, size-checked).

Supported here without external libs:
- ``ppm``      — binary PPM P6 (public format), header parsed + validated
- ``rgb8_raw`` — raw interleaved RGB8, validated against width/height

JPEG/PNG/WebP would plug into the same ``decode(blob, fmt, w, h)``
dispatch via Pillow/libvips; those libs are not in this image, so such
formats raise (clearly-marked stub), and the batched stage quarantines
the row (``decode_ok = false``) instead of failing the task.
"""

from __future__ import annotations

import numpy as np


def decode(blob: bytes, fmt: str, width: int, height: int) -> np.ndarray:
    """bytes → (h, w, 3) uint8. Pure function of the row; raises on
    malformed payloads or metadata mismatch."""
    if width is None or height is None or width <= 0 or height <= 0:
        raise ValueError(f"invalid dims {width}x{height}")
    if blob is None:
        raise ValueError("null payload")
    if fmt == "ppm":
        if not blob.startswith(b"P6"):
            raise ValueError("not a P6 PPM")
        parts = blob.split(b"\n", 3)
        if len(parts) < 4:
            raise ValueError("truncated PPM header")
        w, h = (int(x) for x in parts[1].split())
        maxval = int(parts[2])
        if maxval != 255:
            raise ValueError(f"unsupported PPM maxval {maxval}")
        if (w, h) != (width, height):
            raise ValueError(f"dims mismatch: ppm={w}x{h} meta={width}x{height}")
        px = np.frombuffer(parts[3], dtype=np.uint8)
        if px.size != w * h * 3:
            raise ValueError("PPM payload size mismatch")
        return px.reshape(h, w, 3)
    if fmt == "rgb8_raw":
        px = np.frombuffer(blob, dtype=np.uint8)
        if px.size != width * height * 3:
            raise ValueError("raw payload size mismatch")
        return px.reshape(height, width, 3)
    # STUB: real deployments dispatch to Pillow/libvips here.
    raise NotImplementedError(f"format {fmt!r} needs an external decoder")


def features(px: np.ndarray) -> dict[str, float]:
    """Per-image features over integer milli-luminance.

    ``il = 299 R + 587 G + 114 B`` is EXACT int64 per pixel (the usual
    0.299/0.587/0.114 weights scaled by 1000), so every sum below —
    mean, second moment, 16-bin histogram, |first difference| — is exact
    integer arithmetic with ONE float division at the end. That makes the
    result independent of summation order, i.e. bit-identical between
    numpy here and the SQL oracle (scoring/image_sql.py): float
    luminance put boundary pixels (il exactly on a 16000 multiple) in
    different histogram bins depending on FP evaluation order.
    Magnitudes: il <= 255000, il^2 <= 6.5e10, sums over <= 4096 px stay
    < 2^53, so the int->double casts are exact too.
    """
    il = px.astype(np.int64) @ np.array([299, 587, 114], dtype=np.int64)
    npx = il.size
    s1 = int(il.sum())
    s2 = int((il * il).sum())
    mean_m = s1 / npx
    var_m = max(0.0, s2 / npx - mean_m * mean_m)
    hist = np.bincount((il // 16000).ravel(), minlength=16)[:16]
    p = hist / max(1, npx)
    nz = p[p > 0]
    # + 0.0 folds IEEE -0.0 (single-bin image: -(1 * log2 1)) to +0.0 so
    # repr-based comparators agree with the SQL oracle
    entropy = float(-(nz * np.log2(nz)).sum() + 0.0)
    # edge strength: mean absolute first difference in both axes
    if il.shape[1] > 1:
        dx = np.abs(np.diff(il, axis=1))
        ex = int(dx.sum()) / dx.size
    else:
        ex = 0.0
    if il.shape[0] > 1:
        dy = np.abs(np.diff(il, axis=0))
        ey = int(dy.sum()) / dy.size
    else:
        ey = 0.0
    return {
        "mean_lum": mean_m / 1000.0,
        "contrast": float(np.sqrt(var_m)) / 1000.0,
        "entropy": entropy,
        "edge_strength": (ex + ey) / 2.0 / 1000.0,
        "aspect": float(px.shape[1] / px.shape[0]),
    }


def ahash64(px: np.ndarray) -> list[int]:
    """Average-hash fingerprint: 64 bits packed as four 16-bit block keys
    (the image twin of audio.fingerprint — same packing, same pigeonhole
    LSH property: Hamming <= 3 pairs share at least one identical block).

    Bit ``s`` is set iff 8x8-grid block ``s``'s mean milli-luminance
    exceeds the IMAGE's mean — a relative threshold, so brightness-shifted
    re-encodes land at Hamming ~0. ENTIRELY integer arithmetic: the
    comparison is the cross-multiplication ``block_sum·npx >
    total_sum·block_npx`` (sums <= ~1e9, products <= ~4e12 — exact int64),
    so unlike the audio fingerprint's float energy means this hash cannot
    flip a bit between engines even in principle. Block of pixel (r, c)
    is ``(r·8//h)·8 + (c·8//w)`` — the same integer expression the SQL
    oracle uses."""
    h, w, _ = px.shape
    il = (
        px[:, :, 0].astype(np.int64) * 299
        + px[:, :, 1].astype(np.int64) * 587
        + px[:, :, 2].astype(np.int64) * 114
    )
    by = (np.arange(h, dtype=np.int64) * 8) // h
    bx = (np.arange(w, dtype=np.int64) * 8) // w
    block = (by[:, None] * 8 + bx[None, :]).ravel()
    # bincount weights go through float64 — exact here (sums < 2^53)
    bsum = np.bincount(block, weights=il.ravel(), minlength=64).astype(np.int64)
    bcnt = np.bincount(block, minlength=64).astype(np.int64)
    tsum = int(il.sum())
    npx = h * w
    bits = [1 if int(bsum[s]) * npx > tsum * int(bcnt[s]) else 0 for s in range(64)]
    return [sum(bits[16 * j + t] << t for t in range(16)) for j in range(4)]


def thumbnail(px: np.ndarray, max_side: int = 8) -> np.ndarray:
    """Deterministic nearest-neighbor downsample (the resize path real
    pipelines run before feature models). Pure index arithmetic — no
    interpolation library needed."""
    h, w, _ = px.shape
    scale = max(1.0, max(h, w) / max_side)
    # round, not floor: truncation distorts aspect badly at thumb sizes
    # (16x45 → 2x8 instead of 3x8)
    th, tw = max(1, round(h / scale)), max(1, round(w / scale))
    ys = (np.arange(th) * (h / th)).astype(np.int64)
    xs = (np.arange(tw) * (w / tw)).astype(np.int64)
    return px[ys][:, xs]


def decode_features(blob: bytes, fmt: str, width: int, height: int) -> dict[str, float]:
    """decode → features + thumbnail size → drop pixels. One call per row
    inside an Arrow batch; the decoded array never persists past it."""
    px = decode(blob, fmt, width, height)
    out = features(px)
    th = thumbnail(px)
    out["thumb_bytes"] = float(th.nbytes)
    return out
