"""DuckDB-SQL re-implementation of the video decode + frame-feature path.

The video twin of :mod:`curator_spark.scoring.image_sql`: the
``video_frame_features`` gate query gets a full value-hash oracle by
decoding the ``gray8_seq`` payload and computing the per-sampled-frame
features *in SQL* over the deterministic fixture parquet.

- **Header** — the canonical ``VID0\\n{w} {h} {n} {fps}\\n`` our encoder
  emits (synth/videogen.py) is reconstructed from the row metadata and
  compared against the payload prefix hex-to-hex; payload length must be
  exactly ``header + w*h*n_frames``. Stub codecs (``h264``) fail the
  check → ``decode_ok = false`` quarantine rows, mirroring the Python
  decoder.
- **Frames** — one ``regexp_extract_all`` pass tokenizes the hex into
  2-char gray bytes (O(1) list indexing; see the quadratic-substring note
  in audio_sql.py); byte k belongs to frame ``k // (w*h)``.
- **Features** — every aggregate is an EXACT integer sum with one float
  division (the image_sql trick): per-sampled-frame mean, motion as the
  mean |lag difference| against the previous sampled frame via a window
  over the pixel index, and the scene-cut flag as the INTEGER comparison
  ``sum|diff| > CUT_THRESH * npx`` (scoring/video.py:CUT_THRESH).
"""

from __future__ import annotations

import os

from .video import CUT_THRESH

FIXTURE_DIR = "/tmp/curator_oracle_fixtures"
N_FIXTURE_VIDEOS = 60

_HX = "(strpos('0123456789ABCDEF', substring(pr, {j}, 1)) - 1)"


def ensure_video_fixture(n: int = N_FIXTURE_VIDEOS) -> str:
    """Materialize the deterministic video batch as parquet; return path."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..synth import videogen

    path = os.path.join(FIXTURE_DIR, f"videos{n}.parquet")
    if not os.path.exists(path):
        os.makedirs(FIXTURE_DIR, exist_ok=True)
        pdf = pd.DataFrame([videogen.make_video(i) for i in range(n)])
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), tmp)
        os.replace(tmp, path)
    return path


def video_frame_features_sql(path: str, sample_every: int = 2) -> str:
    """Oracle for ``video_frame_features``
    (curator_spark/scoring/video.py:frame_features)."""
    byte_val = f"({_HX.format(j=1)} * 16 + {_HX.format(j=2)})"
    return f"""WITH raw AS (
  SELECT video_id, fmt, width, height, n_frames, fps, hex(data) AS hx,
         octet_length(data) AS nb,
    'VID0' || chr(10) || width || ' ' || height || ' ' || n_frames || ' ' || fps
           || chr(10) AS hdr
  FROM read_parquet('{path}')
), meta AS (
  SELECT video_id, fmt, width, height, n_frames, hx,
    CASE WHEN width IS NULL OR height IS NULL OR width <= 0 OR height <= 0
              OR n_frames IS NULL OR n_frames <= 0 THEN FALSE
         WHEN fmt = 'gray8_seq' THEN
           nb = length(hdr) + width * height * n_frames
           AND substring(hx, 1, 2 * length(hdr)) = hex(encode(hdr))
         ELSE FALSE END AS ok,
    length(hdr) AS off,
    width * height AS npx
  FROM raw
), px AS (
  -- byte k → frame f = k // npx, within-frame pixel index i = k % npx;
  -- only sampled frames (f % {sample_every} = 0) survive
  SELECT video_id, npx, k // npx AS f, k % npx AS i,
         CAST({byte_val} AS BIGINT) AS v
  FROM (SELECT video_id, npx,
               unnest(range(0, len(ps))) AS k,
               unnest(ps) AS pr
        FROM (SELECT video_id, npx,
                     regexp_extract_all(substring(hx, 2 * off + 1), '..') AS ps
              FROM meta WHERE ok))
  WHERE (k // npx) % {sample_every} = 0
), lagd AS (
  SELECT video_id, npx, f, v,
         lag(v) OVER (PARTITION BY video_id, i ORDER BY f) AS pv
  FROM px
), frame AS (
  -- exact integer sums: s1 <= 255*1600*14 < 2^53, dsum likewise
  SELECT video_id, f, npx,
    SUM(v) AS s1,
    COALESCE(SUM(abs(v - pv)) FILTER (WHERE pv IS NOT NULL), 0) AS dsum
  FROM lagd GROUP BY video_id, f, npx
)
SELECT m.video_id, m.fmt,
  CASE WHEN m.ok THEN CAST(fr.f AS INT) END AS frame_idx,
  CASE WHEN m.ok THEN round(CAST(fr.s1 AS DOUBLE) / fr.npx, 6) END AS mean_lum,
  CASE WHEN m.ok THEN round(CAST(fr.dsum AS DOUBLE) / fr.npx, 6) END AS motion,
  CASE WHEN m.ok THEN fr.dsum > {CUT_THRESH} * fr.npx ELSE FALSE END AS is_cut,
  m.ok AS decode_ok
FROM meta m LEFT JOIN frame fr USING (video_id)
ORDER BY m.video_id, frame_idx
"""
