"""Video decode + per-frame feature extraction — the shared pure-numpy core.

The video twin of :mod:`curator_spark.scoring.image`: used identically by
the Spark ``mapInPandas`` stage and the pure-Python test oracle, so
decoded-frame parity holds by construction. Reference analog: the media
branch of the prompt types (``types/prompt.py:12-117`` — bytes + typed
metadata, decoded lazily, size-checked), extended to the frame axis.

Supported without external libs:
- ``gray8_seq`` — this repo's raw container (synth/videogen.py): ASCII
  header parsed + validated against the row metadata, frames sliced from
  the payload.

Real codecs (h264/vp9/av1) would plug into the same
``decode(blob, fmt, w, h, n)`` dispatch via ffmpeg/pyav; those libs are
not in this image, so such formats raise (clearly-marked stub) and the
batched stage quarantines the row (``decode_ok = false``).

All features are EXACT integer sums with one float division at the end
(the image.py trick), so the SQL oracle (scoring/video_sql.py) is
bit-identical regardless of summation order:
- ``mean_lum``  — mean gray value of the sampled frame.
- ``motion``    — mean |difference| vs the PREVIOUS SAMPLED frame
  (0.0 for the first sample).
- ``is_cut``    — scene-cut flag: integer comparison
  ``sum|diff| > CUT_THRESH * npx`` (never a float threshold).
"""

from __future__ import annotations

import numpy as np

CUT_THRESH = 40  # mean-|diff| gray levels; integer-exact comparison


def decode(
    blob: bytes, fmt: str, width: int, height: int, n_frames: int, fps: int | None = None
) -> np.ndarray:
    """bytes → (n_frames, h, w) uint8. Pure function of the row; raises on
    malformed payloads or metadata mismatch. ``fps``, when provided, is
    validated against the header too — the SQL oracle reconstructs the
    FULL header (fps included) from the metadata columns, so a silent
    fps mismatch here would diverge from its quarantine decision."""
    if width is None or height is None or width <= 0 or height <= 0:
        raise ValueError(f"invalid dims {width}x{height}")
    if n_frames is None or n_frames <= 0:
        raise ValueError(f"invalid frame count {n_frames}")
    if blob is None:
        raise ValueError("null payload")
    if fmt == "gray8_seq":
        if not blob.startswith(b"VID0\n"):
            raise ValueError("not a VID0 gray8_seq payload")
        parts = blob.split(b"\n", 2)
        if len(parts) < 3:
            raise ValueError("truncated gray8_seq header")
        w, h, n, hdr_fps = (int(x) for x in parts[1].split())
        if (w, h, n) != (width, height, n_frames):
            raise ValueError(
                f"dims mismatch: payload={w}x{h}x{n} meta={width}x{height}x{n_frames}"
            )
        if fps is not None and hdr_fps != fps:
            raise ValueError(f"fps mismatch: payload={hdr_fps} meta={fps}")
        px = np.frombuffer(parts[2], dtype=np.uint8)
        if px.size != w * h * n:
            raise ValueError("gray8_seq payload size mismatch")
        return px.reshape(n, h, w)
    # STUB: real deployments dispatch to ffmpeg/pyav here.
    raise NotImplementedError(f"codec {fmt!r} needs an external decoder")


def vhash64(frames: np.ndarray) -> list[int]:
    """Slice-block video fingerprint: 64 bits packed as four 16-bit block
    keys (the video twin of image.ahash64 / audio.fingerprint). The clip
    is cut into 8 TIME slices × (2×4) SPATIAL blocks; bit ``cell`` is set
    iff the cell's mean luminance exceeds the VIDEO's mean — relative, so
    brightness-shifted re-encodes land at Hamming ~0. ENTIRELY integer:
    the comparison is ``cell_sum·N > total_sum·cell_count`` (sums ≤ ~6e6,
    products ≤ ~2e11 — exact int64), so no bit can flip between engines.
    Slice of frame f is ``f·8//n``; block of pixel (r,c) is
    ``(r·2//h)·4 + c·4//w`` — the same integer expressions the SQL oracle
    uses. Short clips (n<8) leave some cells empty → bit 0 on both
    engines (0 > 0 is false; SQL sums simply lack the addend)."""
    n, h, w = frames.shape
    v = frames.astype(np.int64)
    sl = (np.arange(n, dtype=np.int64) * 8) // n
    by = (np.arange(h, dtype=np.int64) * 2) // h
    bx = (np.arange(w, dtype=np.int64) * 4) // w
    cell = (
        sl[:, None, None] * 8 + by[None, :, None] * 4 + bx[None, None, :]
    ).ravel()
    # bincount weights go through float64 — exact here (sums < 2^53)
    csum = np.bincount(cell, weights=v.ravel(), minlength=64).astype(np.int64)
    ccnt = np.bincount(cell, minlength=64).astype(np.int64)
    tsum = int(v.sum())
    npx = int(v.size)
    bits = [1 if int(csum[s]) * npx > tsum * int(ccnt[s]) else 0 for s in range(64)]
    return [sum(bits[16 * j + t] << t for t in range(16)) for j in range(4)]


def frame_features(frames: np.ndarray, sample_every: int = 2) -> list[dict]:
    """Per-SAMPLED-frame features (every ``sample_every``-th frame — the
    frame-sampling step real pipelines run before vision models)."""
    out = []
    prev = None
    npx = frames.shape[1] * frames.shape[2]
    for k in range(0, frames.shape[0], sample_every):
        f = frames[k].astype(np.int64)
        s1 = int(f.sum())
        dsum = 0 if prev is None else int(np.abs(f - prev).sum())
        out.append(
            {
                "frame_idx": int(k),
                "mean_lum": s1 / npx,
                "motion": dsum / npx,
                "is_cut": dsum > CUT_THRESH * npx,
            }
        )
        prev = f
    return out


def decode_features(
    blob: bytes,
    fmt: str,
    width: int,
    height: int,
    n_frames: int,
    sample_every: int = 2,
    fps: int | None = None,
) -> list[dict]:
    """decode → frame-sample → features; the frames never persist past
    the call."""
    return frame_features(decode(blob, fmt, width, height, n_frames, fps), sample_every)
