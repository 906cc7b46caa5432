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
