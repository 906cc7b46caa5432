"""DuckDB-SQL oracle for the mixed-modality row op.

Composes the two proven media decoders over ONE fixture table:
- audio: :func:`curator_spark.scoring.audio_sql._samples_cte` — the
  hex-tokenized PCM16 + inlined μ-law codebook decode that backs every
  audio gate oracle (the fixture carries the audio id as ``clip_id``
  precisely so that CTE is reused verbatim);
- image: the integer milli-luminance mean/contrast arithmetic of
  :mod:`curator_spark.scoring.image_sql` (exact int64 sums, one float
  division — bit-identical to numpy regardless of order), restated over
  the mm fixture's ``image/img_fmt/width/height`` columns;
- text: the same split-words expression the text-family oracles use.

Rows whose codec/format is an external-decoder stub (``opus``/``jpeg``,
planted by synth/mmrows.py) fall out of the respective ``ok`` predicate —
the SQL side quarantines exactly where the Python side does.
"""

from __future__ import annotations

import os

from . import audio_sql
from .image_sql import _chan

FIXTURE_DIR = audio_sql.FIXTURE_DIR
N_FIXTURE_ROWS = 200


def ensure_mm_fixture(n: int = N_FIXTURE_ROWS) -> str:
    """Materialize the deterministic mixed-modality batch as parquet;
    returns its path. Adds a ``clip_id`` alias column equal to ``row_id``
    so audio_sql._samples_cte (keyed on clip_id) reads it unchanged."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..synth import mmrows

    path = os.path.join(FIXTURE_DIR, f"mmrows{n}.parquet")
    if not os.path.exists(path):
        os.makedirs(FIXTURE_DIR, exist_ok=True)
        pdf = mmrows.mm_pandas(n)
        pdf["clip_id"] = pdf["row_id"]
        tbl = pa.Table.from_pandas(pdf, preserve_index=False)
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)  # atomic vs a concurrent generator
    return path


def multimodal_row_features_sql(path: str) -> str:
    """Oracle for ``multimodal_row_features``
    (curator_spark/ops/multimodal.py:multimodal_row_stage)."""
    return f"""WITH {_mm_ctes(path)}
SELECT m.clip_id AS row_id, t.n_chars, t.n_words,
  CASE WHEN m.ok THEN a.rms_db ELSE CAST('nan' AS DOUBLE) END AS rms_db,
  CASE WHEN m.ok THEN a.silence_ratio ELSE 1.0 END AS silence_ratio,
  CASE WHEN im.ok THEN s.mean_lum END AS mean_lum,
  CASE WHEN im.ok THEN s.contrast END AS contrast,
  m.ok AS audio_ok,
  im.ok AS image_ok
FROM am m
JOIN txt t USING (clip_id)
JOIN imeta im USING (clip_id)
LEFT JOIN afeat a USING (clip_id)
LEFT JOIN istats s USING (clip_id)
ORDER BY m.clip_id
"""


def mm_quality_filter_sql(path: str) -> str:
    """Oracle for ``mm_quality_filter`` — the same fused-feature CTEs,
    then the rule predicates over the identical round(x, 6) values
    (curator_spark/ops/multimodal.py:mm_quality_filter / MM_RULES_DOC)."""
    return f"""WITH {_mm_ctes(path)},
ruled AS (
  SELECT m.clip_id, list_filter([
    CASE WHEN NOT m.ok THEN 'audio_decode' END,
    CASE WHEN NOT im.ok THEN 'image_decode' END,
    CASE WHEN t.n_words < 5 THEN 'words_min' END,
    CASE WHEN m.ok AND a.silence_ratio > 0.6 THEN 'silence' END,
    CASE WHEN m.ok AND a.rms_db < -35.0 THEN 'quiet' END,
    CASE WHEN im.ok AND s.contrast < 10.0 THEN 'flat_image' END
  ], x -> x IS NOT NULL) AS rs
  FROM am m
  JOIN txt t USING (clip_id)
  JOIN imeta im USING (clip_id)
  LEFT JOIN afeat a USING (clip_id)
  LEFT JOIN istats s USING (clip_id)
)
SELECT clip_id AS row_id, len(rs) = 0 AS keep,
  COALESCE(array_to_string(rs, '|'), '') AS reasons
FROM ruled ORDER BY clip_id
"""


def _mm_ctes(path: str) -> str:
    """Shared CTE body: audio sample decode (audio_sql verbatim) + text
    split-words + image integer milli-luminance moments, all rounded to
    6dp where the Spark side rounds."""
    lum = f"({_chan(1)} * 299 + {_chan(3)} * 587 + {_chan(5)} * 114)"
    return f"""{audio_sql._samples_cte(path)},
am AS (
  -- audio ok for the MM stage: it computes features(pcm, sr, dur), so
  -- int(dur_ms) quarantines a NULL duration inside the try — the shared
  -- _samples_cte ok alone (payload + sr) would diverge on that row
  SELECT clip_id, (ok AND dur_ms IS NOT NULL) AS ok FROM meta
),
afeat AS (
  SELECT clip_id,
    round(20.0 * log10(GREATEST(sqrt(SUM(x * x) / COUNT(*)), 1e-6)), 6) AS rms_db,
    round(CAST(COUNT(*) FILTER (WHERE abs(x) < 0.01) AS DOUBLE) / COUNT(*), 6) AS silence_ratio
  FROM sampx GROUP BY clip_id
), txt AS (
  SELECT clip_id,
    CAST(length(COALESCE(transcript, '')) AS INT) AS n_chars,
    CAST(len(list_filter(string_split(COALESCE(transcript, ''), ' '),
                         w -> w <> '')) AS INT) AS n_words
  FROM read_parquet('{path}')
), iraw AS (
  SELECT clip_id, img_fmt, width, height, hex(image) AS hx,
         octet_length(image) AS nb,
    'P6' || chr(10) || width || ' ' || height || chr(10) || '255' || chr(10) AS hdr
  FROM read_parquet('{path}')
), imeta AS (
  SELECT clip_id, width, height, hx,
    -- COALESCE: NULL image bytes make the nb comparisons NULL; ok must
    -- be FALSE (Python quarantines) or 'NOT im.ok' in the quality rules
    -- silently skips the image_decode reason tag
    COALESCE(
    CASE WHEN width IS NULL OR height IS NULL OR width <= 0 OR height <= 0 THEN FALSE
         WHEN img_fmt = 'ppm' THEN
           nb = length(hdr) + width * height * 3
           AND substring(hx, 1, 2 * length(hdr)) = hex(encode(hdr))
         WHEN img_fmt = 'rgb8_raw' THEN nb = width * height * 3
         ELSE FALSE END, FALSE) AS ok,
    CASE WHEN img_fmt = 'ppm' THEN length(hdr) ELSE 0 END AS off
  FROM iraw
), itoks AS (
  SELECT clip_id, regexp_extract_all(substring(hx, 2 * off + 1), '......') AS ps
  FROM imeta WHERE ok
), ipx AS (
  SELECT clip_id, CAST({lum} AS BIGINT) AS il
  FROM (SELECT clip_id, unnest(ps) AS pr FROM itoks)
), imu AS (
  SELECT clip_id, SUM(il) AS s1, SUM(il * il) AS s2, COUNT(*) AS npx
  FROM ipx GROUP BY clip_id
), istats AS (
  SELECT clip_id,
    round((CAST(s1 AS DOUBLE) / npx) / 1000.0, 6) AS mean_lum,
    round(sqrt(GREATEST(0.0,
      CAST(s2 AS DOUBLE) / npx
      - (CAST(s1 AS DOUBLE) / npx) * (CAST(s1 AS DOUBLE) / npx))) / 1000.0, 6) AS contrast
  FROM imu
)"""
