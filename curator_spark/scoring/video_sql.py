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
    -- COALESCE: NULL data makes the nb comparison NULL; ok must be
    -- FALSE (Python quarantines on a null payload), never NULL
    COALESCE(
    CASE WHEN width IS NULL OR height IS NULL OR width <= 0 OR height <= 0
              OR n_frames IS NULL OR n_frames <= 0 THEN FALSE
         WHEN fmt = 'gray8_seq' THEN
           nb = length(hdr) + width * height * n_frames
           AND substring(hx, 1, 2 * length(hdr)) = hex(encode(hdr))
         ELSE FALSE END, FALSE) AS ok,
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


def ensure_video_dup_fixture(n: int = N_FIXTURE_VIDEOS, every: int = 10) -> str:
    """Base videos 0..n-1 plus a brightness-shifted re-encode of every
    ``every``-th decodable one (videogen.near_dup_video) as parquet."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..synth import videogen

    path = os.path.join(FIXTURE_DIR, f"videodups{n}_{every}.parquet")
    if not os.path.exists(path):
        os.makedirs(FIXTURE_DIR, exist_ok=True)
        rows = [videogen.make_video(i) for i in range(n)]
        rows += [
            d for i in range(0, n, every)
            if (d := videogen.near_dup_video(i)) is not None
        ]
        pdf = pd.DataFrame(rows)
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), tmp)
        os.replace(tmp, path)
    return path


def _vhash_ctes(path: str) -> str:
    """CTE chain: videos parquet → per-byte luminance → 8-timeslice ×
    (2×4)-spatial-block PURE-INTEGER fingerprint bits → four 16-bit block
    keys (scoring/video.py:vhash64). Cells absent on short clips simply
    contribute no addend → bit 0, matching numpy's 0 > 0. Also emits
    ``mus(video_id, mean_lum)`` (exact int sums → exact double)."""
    byte_val = f"({_HX.format(j=1)} * 16 + {_HX.format(j=2)})"
    return f"""raw AS (
  SELECT video_id, fmt, width, height, n_frames, fps, hex(data) AS hx,
         octet_length(data) AS nb,
    'VID0' || chr(10) || width || ' ' || height || ' ' || n_frames || ' ' || fps
           || chr(10) AS hdr
  FROM read_parquet('{path}')
), meta AS (
  SELECT video_id, fmt, width, height, n_frames, hx,
    -- COALESCE: NULL data makes the nb comparison NULL; ok must be
    -- FALSE (Python quarantines on a null payload), never NULL
    COALESCE(
    CASE WHEN width IS NULL OR height IS NULL OR width <= 0 OR height <= 0
              OR n_frames IS NULL OR n_frames <= 0 THEN FALSE
         WHEN fmt = 'gray8_seq' THEN
           nb = length(hdr) + width * height * n_frames
           AND substring(hx, 1, 2 * length(hdr)) = hex(encode(hdr))
         ELSE FALSE END, FALSE) AS ok,
    length(hdr) AS off,
    width * height AS npx
  FROM raw
), px AS (
  SELECT video_id, width, height, n_frames,
         k // npx AS f, (k % npx) // width AS r, (k % npx) % width AS c,
         CAST({byte_val} AS BIGINT) AS v
  FROM (SELECT video_id, width, height, n_frames, npx,
               unnest(range(0, len(ps))) AS k,
               unnest(ps) AS pr
        FROM (SELECT video_id, width, height, n_frames, npx,
                     regexp_extract_all(substring(hx, 2 * off + 1), '..') AS ps
              FROM meta WHERE ok))
), cells AS (
  SELECT video_id,
    ((f * 8) // n_frames) * 8 + ((r * 2) // height) * 4 + (c * 4) // width AS cell,
    v
  FROM px
), csum AS (
  SELECT video_id, cell, SUM(v) AS cs, COUNT(*) AS cc
  FROM cells GROUP BY video_id, cell
), tot AS (
  SELECT video_id, SUM(v) AS ts, COUNT(*) AS npx FROM cells GROUP BY video_id
), bits AS (
  SELECT c.video_id, c.cell,
    CASE WHEN c.cs * t.npx > t.ts * c.cc THEN 1 ELSE 0 END AS bit
  FROM csum c JOIN tot t USING (video_id)
), blocks AS (
  SELECT video_id, CAST(cell // 16 AS INT) AS band,
    CAST(SUM(bit * (1 << CAST(cell % 16 AS INT))) AS INT) AS key
  FROM bits GROUP BY video_id, CAST(cell // 16 AS INT)
), fp AS (
  -- dense over ok ids with COALESCE(.., 0): a band whose 16 cells are
  -- ALL empty (e.g. n_frames <= 3 leaves whole time slices unused) has
  -- no blocks row, but the Python packer emits 0 for it — NULL here
  -- would poison xor/hamming downstream and drop band-key matches
  SELECT m.video_id,
    COALESCE(MAX(CASE WHEN band = 0 THEN key END), 0) AS b0,
    COALESCE(MAX(CASE WHEN band = 1 THEN key END), 0) AS b1,
    COALESCE(MAX(CASE WHEN band = 2 THEN key END), 0) AS b2,
    COALESCE(MAX(CASE WHEN band = 3 THEN key END), 0) AS b3
  FROM meta m LEFT JOIN blocks USING (video_id)
  WHERE m.ok GROUP BY m.video_id
), mus AS (
  SELECT video_id, CAST(ts AS DOUBLE) / npx AS mean_lum FROM tot
)"""


def video_fingerprints_sql(path: str) -> str:
    """Oracle for ``video_fingerprints``."""
    return f"""WITH {_vhash_ctes(path)}
SELECT m.video_id, m.fmt, m.width, m.height, m.n_frames,
  CASE WHEN m.ok THEN f.b0 END AS b0,
  CASE WHEN m.ok THEN f.b1 END AS b1,
  CASE WHEN m.ok THEN f.b2 END AS b2,
  CASE WHEN m.ok THEN f.b3 END AS b3,
  CASE WHEN m.ok THEN round(mu.mean_lum, 6) END AS mean_lum,
  m.ok AS decode_ok
FROM meta m LEFT JOIN fp f USING (video_id) LEFT JOIN mus mu USING (video_id)
ORDER BY m.video_id
"""


def video_dup_pairs_sql(path: str, max_hamming: int = 3) -> str:
    """Oracle for ``video_dup_pairs``: pigeonhole block-key join over the
    vhash bands, exact shape (+frame count) + mean-luminance verify, then
    the popcount threshold — mirroring the Spark op clause for clause."""
    return f"""WITH {_vhash_ctes(path)},
fpv AS (
  SELECT m.video_id, m.width, m.height, m.n_frames, mu.mean_lum,
         f.b0, f.b1, f.b2, f.b3
  FROM meta m JOIN fp f USING (video_id) JOIN mus mu USING (video_id)
  WHERE m.ok
), bands AS (
  -- candidates from the DENSE fingerprint (not sparse blocks): two clips
  -- that share an all-empty band must still band-match on key 0, exactly
  -- as the Spark op's pigeonhole join over the packed [b0..b3] does
  SELECT video_id, 0 AS band, b0 AS key FROM fp
  UNION ALL SELECT video_id, 1, b1 FROM fp
  UNION ALL SELECT video_id, 2, b2 FROM fp
  UNION ALL SELECT video_id, 3, b3 FROM fp
), cand AS (
  SELECT a.video_id AS vid_a, b.video_id AS vid_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.video_id < b.video_id
  GROUP BY 1, 2
), pairs AS (
  SELECT * FROM (
    SELECT c.vid_a, c.vid_b,
      CAST(bit_count(xor(fa.b0, fb.b0)) + bit_count(xor(fa.b1, fb.b1))
         + bit_count(xor(fa.b2, fb.b2)) + bit_count(xor(fa.b3, fb.b3)) AS INT) AS hamming
    FROM cand c
    JOIN fpv fa ON fa.video_id = c.vid_a
    JOIN fpv fb ON fb.video_id = c.vid_b
    WHERE fa.width = fb.width AND fa.height = fb.height
      AND fa.n_frames = fb.n_frames
      AND abs(fa.mean_lum - fb.mean_lum) <= 10.0
  ) WHERE hamming <= {max_hamming}
)
SELECT vid_a, vid_b, hamming FROM pairs ORDER BY vid_a, vid_b
"""
