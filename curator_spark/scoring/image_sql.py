"""DuckDB-SQL re-implementation of the image decode + feature path.

The image twin of :mod:`curator_spark.scoring.audio_sql`: the
``image_decode_features`` gate query graduates from rows-only to a full
value-hash oracle row by decoding the PPM/raw-RGB payload and computing
the pixel features *in SQL* over the deterministic fixture parquet.

- **PPM P6** — the canonical header our encoder emits
  (``P6\\n{w} {h}\\n255\\n``) is reconstructed from the row metadata and
  compared against the payload prefix (hex-to-hex); payload length must be
  exactly ``header + w*h*3``.  The Python decoder additionally accepts
  whitespace variants the fixture never produces — parity is scoped to
  canonical encodings, with quarantine cases pytest-asserted.
- **Pixels** — one ``regexp_extract_all`` pass tokenizes the hex into
  6-char RGB triples (O(1) list indexing afterwards; see the quadratic-
  substring note in audio_sql.py); luminance is the same
  ``0.299 R + 0.587 G + 0.114 B`` expression numpy evaluates.
- **Features** — mean/two-pass std, 16-bin histogram entropy (log2),
  axis-wise mean |first difference| via ``lead()`` windows, and the
  nearest-neighbor thumbnail byte count with ``round_even`` (Python's
  banker's ``round``).  Both query sides round to 6 decimals.
"""

from __future__ import annotations

import os

FIXTURE_DIR = "/tmp/curator_oracle_fixtures"
N_FIXTURE_IMAGES = 200

_HX = "(strpos('0123456789ABCDEF', substring(pr, {j}, 1)) - 1)"


def _chan(lo: int) -> str:
    """SQL: byte value from hex chars (j, j+1) of the 6-char pixel token."""
    return f"({_HX.format(j=lo)} * 16 + {_HX.format(j=lo + 1)})"


def ensure_image_fixture(n: int = N_FIXTURE_IMAGES) -> str:
    """Materialize the deterministic image batch as parquet; return path."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..synth import imagegen

    path = os.path.join(FIXTURE_DIR, f"images{n}.parquet")
    if not os.path.exists(path):
        os.makedirs(FIXTURE_DIR, exist_ok=True)
        pdf = pd.DataFrame([imagegen.make_image(i) for i in range(n)])
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), tmp)
        os.replace(tmp, path)
    return path


def _pixels_cte(path: str) -> str:
    """CTE chain: images parquet → per-pixel integer milli-luminance.

    Emits ``meta(image_id, fmt, width, height, ok)`` and
    ``px(image_id, width, height, r, c, il)`` — EXACT int64 luminance per
    pixel, mirroring image.features(); downstream aggregates are exact
    integer sums with one float division, so results are bit-identical to
    numpy regardless of summation order. Shared by the feature and
    fingerprint oracles."""
    lum = f"({_chan(1)} * 299 + {_chan(3)} * 587 + {_chan(5)} * 114)"
    return f"""raw AS (
  SELECT image_id, fmt, width, height, hex(data) AS hx,
         octet_length(data) AS nb,
    'P6' || chr(10) || width || ' ' || height || chr(10) || '255' || chr(10) AS hdr
  FROM read_parquet('{path}')
), meta AS (
  SELECT image_id, fmt, width, height, hx,
    -- COALESCE: a NULL payload makes the nb comparisons NULL, and a
    -- NULL ok would skip quality/reason tags downstream where the
    -- Python decoder quarantines with ok=false
    COALESCE(
    CASE WHEN width IS NULL OR height IS NULL OR width <= 0 OR height <= 0 THEN FALSE
         WHEN fmt = 'ppm' THEN
           nb = length(hdr) + width * height * 3
           AND substring(hx, 1, 2 * length(hdr)) = hex(encode(hdr))
         WHEN fmt = 'rgb8_raw' THEN nb = width * height * 3
         ELSE FALSE END, FALSE) AS ok,
    CASE WHEN fmt = 'ppm' THEN length(hdr) ELSE 0 END AS off
  FROM raw
), toks AS (
  SELECT image_id, width, height,
         regexp_extract_all(substring(hx, 2 * off + 1), '......') AS ps
  FROM meta WHERE ok
), px AS (
  -- the two unnests are same-length lists and zip in lockstep (DuckDB
  -- parallel-unnest semantics): k is the pixel index, pr its hex triple
  SELECT image_id, width, height, k // width AS r, k % width AS c,
         CAST({lum} AS BIGINT) AS il
  FROM (SELECT image_id, width, height,
               unnest(range(0, len(ps))) AS k,
               unnest(ps) AS pr
        FROM toks)
)"""


def image_decode_features_sql(path: str) -> str:
    """Oracle for ``image_decode_features``
    (curator_spark/scoring/image.py:features + thumbnail)."""
    return f"""WITH {_pixels_cte(path)}, mu AS (
  -- exact integer moments: s1 <= 1e9, s2 <= 2.7e14, both < 2^53 so the
  -- DOUBLE casts are exact and the single divisions match Python's int/int
  SELECT image_id, SUM(il) AS s1, SUM(il * il) AS s2, COUNT(*) AS npx
  FROM px GROUP BY image_id
), stats AS (
  SELECT image_id,
    (CAST(s1 AS DOUBLE) / npx) / 1000.0 AS mean_lum,
    sqrt(GREATEST(0.0,
      CAST(s2 AS DOUBLE) / npx
      - (CAST(s1 AS DOUBLE) / npx) * (CAST(s1 AS DOUBLE) / npx))) / 1000.0 AS contrast,
    npx
  FROM mu
), hist AS (
  SELECT image_id, il // 16000 AS bin, COUNT(*) AS cnt
  FROM px GROUP BY image_id, bin
), ent AS (
  SELECT h.image_id,
    -SUM((h.cnt / CAST(m.npx AS DOUBLE)) * log2(h.cnt / CAST(m.npx AS DOUBLE))) AS entropy
  FROM hist h JOIN mu m USING (image_id) GROUP BY h.image_id
), ex AS (
  SELECT image_id, CAST(SUM(d) AS DOUBLE) / COUNT(*) AS ex FROM (
    SELECT image_id, abs(lead(il) OVER (PARTITION BY image_id, r ORDER BY c) - il) AS d,
           c, width
    FROM px) WHERE c < width - 1 GROUP BY image_id
), ey AS (
  SELECT image_id, CAST(SUM(d) AS DOUBLE) / COUNT(*) AS ey FROM (
    SELECT image_id, abs(lead(il) OVER (PARTITION BY image_id, c ORDER BY r) - il) AS d,
           r, height
    FROM px) WHERE r < height - 1 GROUP BY image_id
), thumb AS (
  SELECT image_id,
    GREATEST(1, CAST(round_even(height / GREATEST(1.0, GREATEST(width, height) / 8.0), 0) AS BIGINT))
    * GREATEST(1, CAST(round_even(width / GREATEST(1.0, GREATEST(width, height) / 8.0), 0) AS BIGINT))
    * 3 AS thumb_bytes
  FROM meta WHERE ok
)
SELECT m.image_id, m.fmt,
  CASE WHEN m.ok THEN round(s.mean_lum, 6) END AS mean_lum,
  CASE WHEN m.ok THEN round(s.contrast, 6) END AS contrast,
  CASE WHEN m.ok THEN round(e.entropy, 6) + 0.0 END AS entropy,
  -- COALESCE 0.0 per axis: a 1-pixel-wide/-tall image has no horizontal/
  -- vertical neighbor pairs, so its ex/ey CTE emits no row — Python
  -- (image.features) defines that axis as 0.0 and still averages
  CASE WHEN m.ok
       THEN round((COALESCE(x.ex, 0.0) + COALESCE(y.ey, 0.0)) / 2.0 / 1000.0, 6)
  END AS edge_strength,
  CASE WHEN m.ok THEN round(m.width / CAST(m.height AS DOUBLE), 6) END AS aspect,
  CASE WHEN m.ok THEN t.thumb_bytes END AS thumb_bytes,
  m.ok AS decode_ok
FROM meta m
LEFT JOIN stats s USING (image_id)
LEFT JOIN ent e USING (image_id)
LEFT JOIN ex x USING (image_id)
LEFT JOIN ey y USING (image_id)
LEFT JOIN thumb t USING (image_id)
ORDER BY m.image_id
"""


def ensure_image_dup_fixture(n: int = 200, every: int = 10) -> str:
    """Base images 0..n-1 plus a brightness-shifted other-format re-encode
    of every ``every``-th (imagegen.near_dup_image) as parquet."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..synth import imagegen

    path = os.path.join(FIXTURE_DIR, f"imagedups{n}_{every}.parquet")
    if not os.path.exists(path):
        os.makedirs(FIXTURE_DIR, exist_ok=True)
        rows = [imagegen.make_image(i) for i in range(n)]
        rows += [imagegen.near_dup_image(i) for i in range(0, n, every)]
        pdf = pd.DataFrame(rows)
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), tmp)
        os.replace(tmp, path)
    return path


def _ahash_ctes() -> str:
    """Appended to ``_pixels_cte``: 8x8-grid block luminance sums → the
    PURE-INTEGER cross-multiplied average-hash bits → four 16-bit block
    keys (scoring/image.py:ahash64). No float anywhere — unlike the audio
    fingerprint's energy means, these bits cannot flip between engines."""
    return """blk AS (
  SELECT image_id, ((r * 8) // height) * 8 + (c * 8) // width AS block, il
  FROM px
), bsum AS (
  SELECT image_id, block, SUM(il) AS bs, COUNT(*) AS bc
  FROM blk GROUP BY image_id, block
), tot AS (
  SELECT image_id, SUM(il) AS ts, COUNT(*) AS npx FROM px GROUP BY image_id
), bits AS (
  SELECT b.image_id, b.block,
    CASE WHEN b.bs * t.npx > t.ts * b.bc THEN 1 ELSE 0 END AS bit
  FROM bsum b JOIN tot t USING (image_id)
), blocks AS (
  SELECT image_id, CAST(block // 16 AS INT) AS band,
    CAST(SUM(bit * (1 << CAST(block % 16 AS INT))) AS INT) AS key
  FROM bits GROUP BY image_id, CAST(block // 16 AS INT)
), fp AS (
  -- dense over ok ids with COALESCE(.., 0): a band whose 16 grid rows
  -- are ALL empty (height < 8 leaves 8x8 rows unused) has no blocks
  -- row, but the Python packer emits 0 for it — NULL would poison
  -- xor/hamming and drop band-key matches (same fix as the audio
  -- fingerprint's dense grid CTE)
  SELECT m.image_id,
    COALESCE(MAX(CASE WHEN band = 0 THEN key END), 0) AS b0,
    COALESCE(MAX(CASE WHEN band = 1 THEN key END), 0) AS b1,
    COALESCE(MAX(CASE WHEN band = 2 THEN key END), 0) AS b2,
    COALESCE(MAX(CASE WHEN band = 3 THEN key END), 0) AS b3
  FROM meta m LEFT JOIN blocks USING (image_id)
  WHERE m.ok GROUP BY m.image_id
), mus AS (
  SELECT image_id, (CAST(ts AS DOUBLE) / npx) / 1000.0 AS mean_lum FROM tot
)"""


def image_fingerprints_sql(path: str) -> str:
    """Oracle for ``image_fingerprints``."""
    return f"""WITH {_pixels_cte(path)},
{_ahash_ctes()}
SELECT m.image_id, m.fmt, m.width, m.height,
  CASE WHEN m.ok THEN f.b0 END AS b0,
  CASE WHEN m.ok THEN f.b1 END AS b1,
  CASE WHEN m.ok THEN f.b2 END AS b2,
  CASE WHEN m.ok THEN f.b3 END AS b3,
  CASE WHEN m.ok THEN round(mu.mean_lum, 6) END AS mean_lum,
  m.ok AS decode_ok
FROM meta m LEFT JOIN fp f USING (image_id) LEFT JOIN mus mu USING (image_id)
ORDER BY m.image_id
"""


def image_dup_pairs_sql(path: str, max_hamming: int = 3) -> str:
    """Oracle for ``image_dup_pairs``: pigeonhole block-key join over the
    aHash bands, exact-dimension + mean-luminance verify (the EXACT
    integer-derived doubles compare identically on both engines), then
    the popcount threshold — mirroring the Spark op clause for clause."""
    return f"""WITH {_pixels_cte(path)},
{_ahash_ctes()},
fpv AS (
  SELECT m.image_id, m.width, m.height, mu.mean_lum, f.b0, f.b1, f.b2, f.b3
  FROM meta m JOIN fp f USING (image_id) JOIN mus mu USING (image_id)
  WHERE m.ok
), bands AS (
  -- candidates from the DENSE fingerprint (not sparse blocks): two
  -- images sharing an all-empty band must still band-match on key 0,
  -- exactly as the Spark op's pigeonhole join over [b0..b3] does
  SELECT image_id, 0 AS band, b0 AS key FROM fp
  UNION ALL SELECT image_id, 1, b1 FROM fp
  UNION ALL SELECT image_id, 2, b2 FROM fp
  UNION ALL SELECT image_id, 3, b3 FROM fp
), cand AS (
  SELECT a.image_id AS img_a, b.image_id AS img_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.image_id < b.image_id
  GROUP BY 1, 2
), pairs AS (
  SELECT * FROM (
    SELECT c.img_a, c.img_b,
      CAST(bit_count(xor(fa.b0, fb.b0)) + bit_count(xor(fa.b1, fb.b1))
         + bit_count(xor(fa.b2, fb.b2)) + bit_count(xor(fa.b3, fb.b3)) AS INT) AS hamming
    FROM cand c
    JOIN fpv fa ON fa.image_id = c.img_a
    JOIN fpv fb ON fb.image_id = c.img_b
    WHERE fa.width = fb.width AND fa.height = fb.height
      AND abs(fa.mean_lum - fb.mean_lum) <= 10.0
  ) WHERE hamming <= {max_hamming}
)
SELECT img_a, img_b, hamming FROM pairs ORDER BY img_a, img_b
"""
