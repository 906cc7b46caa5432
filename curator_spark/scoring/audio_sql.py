"""DuckDB-SQL re-implementation of the audio decode + feature path.

Converts ``audio_decode_features`` and ``audio_segments`` from rows-only
driver checks into full value-hash oracle rows: the oracle *decodes the
WAV/μ-law bytes and computes the PCM features in SQL*, independently of
the numpy implementation (:mod:`curator_spark.scoring.audio`).

How each piece crosses into SQL:

- **Input fixture** — the 200-clip batch is a pure function of
  ``(GLOBAL_SEED, clip_id)`` (synth/clips.py), so the generator
  materializes it once as parquet under ``/tmp`` and the SQL
  ``read_parquet``s it.  Same philosophy as inlining IVF centroids /
  langid weights, just stored out-of-line (6 MB of audio bytes would be
  abusive as literals).
- **PCM16 WAV** — ``hex(bytes)`` then pure integer arithmetic on hex
  digits: sample k = signed LE int16 at byte ``44 + 2k``, scaled by
  ``1/32767``.  The canonical 44-byte header layout our encoder emits is
  verified field-by-field (RIFF/WAVE/fmt /data ids, fmt=1, mono,
  header-vs-metadata sample-rate match) — the same conditions whose
  violation makes the Python decoder raise (→ ``decode_ok = false``).
- **μ-law** — one byte per sample; all 256 decode values are inlined as a
  codebook computed by the *numpy* expressions (exact double parity; this
  is also how real G.711 decoders work).
- **Features** — rms/silence/clip ratios and the 20 ms-frame VAD
  run-length stats (gaps-and-islands window functions).  Both query sides
  round to 6 decimals to absorb float summation-order differences; the
  threshold comparisons (``|x| < 0.01`` etc.) act on bit-identical decoded
  values, so they cannot flip.

Parity scope: the SQL assumes the canonical chunk layout the fixture
encoder produces (the Python decoder also accepts re-ordered chunks, which
the fixture never contains); tests/test_scoring_core.py asserts SQL↔numpy
equality on the full fixture.
"""

from __future__ import annotations

import os

import numpy as np

FIXTURE_DIR = "/tmp/curator_oracle_fixtures"
N_FIXTURE_CLIPS = 200

_HEXPOS = "(strpos('0123456789ABCDEF', substring(hx, {p}, 1)) - 1)"


def _byte(p: str) -> str:
    """SQL: unsigned byte value from hex chars at 1-indexed position p."""
    return f"({_HEXPOS.format(p=p)} * 16 + {_HEXPOS.format(p=f'({p}) + 1')})"


def ensure_clip_fixture(n: int = N_FIXTURE_CLIPS) -> str:
    """Materialize the deterministic clip batch as parquet; return its path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..synth import clips

    path = os.path.join(FIXTURE_DIR, f"clips{n}.parquet")
    if not os.path.exists(path):
        os.makedirs(FIXTURE_DIR, exist_ok=True)
        pdf = clips.clips_pandas(n)
        tbl = pa.Table.from_pandas(pdf, preserve_index=False)
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)  # atomic vs a concurrent generator
    return path


def mulaw_codebook_rows() -> str:
    """256-entry μ-law decode table keyed by the 2-hex-char byte image,
    values from the numpy expressions (exact double parity)."""
    from ..synth import audiogen

    xs = audiogen.mulaw_decode(bytes(range(256)))
    return ",\n".join(f"('{q:02X}', {float(xs[q])!r})" for q in range(256))


def _samples_cte(path: str) -> str:
    """CTE chain: clips parquet → per-sample decoded float64 ``x``.

    Emits ``meta(clip_id, codec, sr_hz, dur_ms, ok, n)`` and
    ``sampx(clip_id, k, x)``; rows with ``ok = false`` produce no samples.

    The payload is tokenized ONCE per clip with ``regexp_extract_all``
    (one linear pass → a list of 4-hex-char PCM16 images / 2-hex-char
    μ-law bytes); per-sample access is then O(1) list indexing.  A naive
    per-sample ``substring(hx, 89 + 4k, 4)`` is O(position) in DuckDB
    (UTF-8 offset scan), which turns the decode quadratic (~170 s for
    6 MB of audio); this formulation runs in ~2 s.  Header fields still
    use ``substring`` — all at positions < 100, so the scan is bounded.
    """
    sr_le = (
        f"({_byte('49')} + 256 * {_byte('51')} + 65536 * {_byte('53')}"
        f" + 16777216 * {_byte('55')})"
    )
    # value of a 4-hex-char little-endian int16 image `pr` (lo byte first)
    hx1 = "(strpos('0123456789ABCDEF', substring(pr, {j}, 1)) - 1)"
    raw = (
        f"(({hx1.format(j=3)} * 16 + {hx1.format(j=4)}) * 256"
        f" + {hx1.format(j=1)} * 16 + {hx1.format(j=2)})"
    )
    return f"""cb(qh, x) AS (VALUES
{mulaw_codebook_rows()}
), raw AS (
  SELECT clip_id, codec, sr_hz, dur_ms, hex(bytes) AS hx,
         octet_length(bytes) AS nb
  FROM read_parquet('{path}')
), meta AS (
  SELECT clip_id, codec, sr_hz, dur_ms, hx,
    -- COALESCE: a NULL payload must be ok=FALSE (the Python side raises
    -- on bytes(None) and quarantines), not NULL — the WAV header
    -- comparisons against a NULL hx would otherwise leak NULL into ok
    -- and desync decode_ok between the engines
    COALESCE(
    -- sr_hz IS NOT NULL: every Spark audio kernel coerces int(sr_hz)
    -- inside its quarantine try, so a NULL sample rate is decode_ok=false
    -- on that side regardless of payload health (the pcm branch already
    -- gets this from the header-vs-metadata sr equality going NULL→FALSE)
    CASE WHEN codec = 'ulaw' THEN sr_hz IS NOT NULL AND hx IS NOT NULL
         WHEN codec = 'pcm_s16le' THEN
           nb >= 44
           AND substring(hx, 1, 8) = '52494646'    -- 'RIFF'
           AND substring(hx, 17, 8) = '57415645'   -- 'WAVE'
           AND substring(hx, 25, 8) = '666D7420'   -- 'fmt '
           AND substring(hx, 41, 4) = '0100'       -- PCM format tag
           AND substring(hx, 45, 4) = '0100'       -- mono
           AND substring(hx, 73, 8) = '64617461'   -- 'data'
           AND {sr_le} = sr_hz                     -- header vs metadata sr
           -- int16 view of an odd byte count raises in the Python decoder
           AND LEAST({_byte('81')} + 256 * {_byte('83')} + 65536 * {_byte('85')}
                     + 16777216 * {_byte('87')}, nb - 44) % 2 = 0
         ELSE FALSE END, FALSE) AS ok,
    CASE WHEN codec = 'ulaw' THEN nb
         ELSE LEAST({_byte('81')} + 256 * {_byte('83')} + 65536 * {_byte('85')}
                    + 16777216 * {_byte('87')}, nb - 44) // 2
    END AS n
  FROM raw
), toks AS (
  SELECT clip_id, codec,
    CASE WHEN codec = 'ulaw' THEN regexp_extract_all(hx, '..')
         ELSE regexp_extract_all(substring(hx, 89, n * 4), '....') END AS ps
  FROM meta WHERE ok AND n > 0
), samp AS (
  SELECT t.clip_id, t.codec, k, t.ps[CAST(k + 1 AS INT)] AS pr
  FROM toks t, LATERAL (SELECT unnest(range(0, len(t.ps))) AS k) ks
), sampx AS (
  SELECT s.clip_id, s.k,
    CASE WHEN s.codec = 'ulaw' THEN cb.x
         WHEN {raw} >= 32768 THEN ({raw} - 65536) / 32767.0
         ELSE {raw} / 32767.0 END AS x
  FROM samp s LEFT JOIN cb ON s.codec = 'ulaw' AND cb.qh = s.pr
)"""


def audio_decode_features_sql(path: str) -> str:
    """Oracle for ``audio_decode_features``: rms_db / silence_ratio /
    clip_ratio per clip (curator_spark/scoring/audio.py:features)."""
    return f"""WITH {_samples_cte(path)},
feat AS (
  SELECT clip_id,
    round(20.0 * log10(GREATEST(sqrt(SUM(x * x) / COUNT(*)), 1e-6)), 6) AS rms_db,
    round(CAST(COUNT(*) FILTER (WHERE abs(x) < 0.01) AS DOUBLE) / COUNT(*), 6) AS silence_ratio,
    round(CAST(COUNT(*) FILTER (WHERE abs(x) > 0.985) AS DOUBLE) / COUNT(*), 6) AS clip_ratio
  FROM sampx GROUP BY clip_id
)
SELECT m.clip_id, m.codec,
  -- COALESCE fallbacks are the Python zero-sample constants
  -- (audio.features at n == 0): an ok clip with an EMPTY payload (0
  -- samples) has no feat row but still decodes successfully.
  -- dur_ms IS NOT NULL: the features kernel coerces int(dur_ms) inside
  -- its quarantine try (decode_features / decode_stage), so NULL dur is
  -- decode_ok=false for THIS op even when the payload decodes
  CASE WHEN m.ok AND m.dur_ms IS NOT NULL
       THEN COALESCE(f.rms_db, -120.0) ELSE CAST('nan' AS DOUBLE) END AS rms_db,
  CASE WHEN m.ok AND m.dur_ms IS NOT NULL
       THEN COALESCE(f.silence_ratio, 1.0) ELSE 1.0 END AS silence_ratio,
  CASE WHEN m.ok AND m.dur_ms IS NOT NULL
       THEN COALESCE(f.clip_ratio, 0.0) ELSE 1.0 END AS clip_ratio,
  (m.ok AND m.dur_ms IS NOT NULL) AS decode_ok
FROM meta m LEFT JOIN feat f USING (clip_id)
ORDER BY m.clip_id
"""


def loudness_normalize_sql(path: str, target_db: float = -20.0) -> str:
    """Oracle for ``loudness_normalize``: rms → gain quantized to 1e-6 dB →
    per-sample |x|·g post-gain clip check (scoring/audio.py:loudness). The
    gain quantization makes the per-sample products comparable across
    engines; the compare itself is the fingerprint oracle's float-aggregate
    precedent."""
    return f"""WITH {_samples_cte(path)},
feat AS (
  SELECT clip_id,
    20.0 * log10(GREATEST(sqrt(SUM(x * x) / COUNT(*)), 1e-6)) AS rms_db
  FROM sampx GROUP BY clip_id
), gains AS (
  SELECT clip_id, rms_db, round({target_db!r} - rms_db, 6) AS gain_db FROM feat
), post AS (
  SELECT s.clip_id,
    CAST(COUNT(*) FILTER (WHERE abs(s.x) * pow(10.0, g.gain_db / 20.0) > 0.985)
         AS DOUBLE) / COUNT(*) AS pr
  FROM sampx s JOIN gains g USING (clip_id) GROUP BY s.clip_id
)
SELECT m.clip_id,
  -- COALESCE fallbacks = audio.loudness() at n == 0 (an ok clip with an
  -- EMPTY payload has no feat/gains row but still decodes successfully)
  CASE WHEN m.ok THEN round(COALESCE(g.rms_db, -120.0), 6) END AS rms_db,
  CASE WHEN m.ok THEN round(COALESCE(g.gain_db, {target_db!r} + 120.0), 6) END AS gain_db,
  CASE WHEN m.ok THEN round(COALESCE(p.pr, 0.0), 6) END AS post_gain_clip_ratio,
  m.ok AS decode_ok
FROM meta m
LEFT JOIN gains g USING (clip_id)
LEFT JOIN post p USING (clip_id)
ORDER BY m.clip_id
"""


def clip_windows_sql(path: str, window_ms: int = 500, min_tail_ms: int = 100) -> str:
    """Oracle for ``clip_windows``: the identical full-windows + tail
    arithmetic (ops/multimodal.py:clip_windows)."""
    return f"""WITH c AS (
  -- COALESCE: NULL dur → one zero-length window (the Spark op's contract,
  -- shared with window_decode_stage)
  SELECT clip_id, COALESCE(dur_ms, 0) AS dur_ms FROM read_parquet('{path}')
), n AS (
  SELECT clip_id, dur_ms,
    GREATEST(1, CAST(dur_ms // {window_ms}
      + CASE WHEN dur_ms - (dur_ms // {window_ms}) * {window_ms} >= {min_tail_ms}
             THEN 1 ELSE 0 END AS INT)) AS n_windows
  FROM c
)
SELECT clip_id, CAST(k AS INT) AS win_idx,
  CAST(k * {window_ms} AS INT) AS start_ms,
  CAST(LEAST(k * {window_ms} + {window_ms}, dur_ms) AS INT) AS end_ms,
  n_windows
FROM n, LATERAL (SELECT unnest(range(0, n_windows)) AS k) ks
ORDER BY clip_id, win_idx
"""


def audio_zcr_sql(path: str) -> str:
    """Oracle for ``audio_zcr``: strict sign-flip count via a lag window,
    peak via MAX — both exact on bit-identical decoded samples
    (scoring/audio.py:zcr_stats)."""
    return f"""WITH {_samples_cte(path)},
lagd AS (
  SELECT clip_id, x, lag(x) OVER (PARTITION BY clip_id ORDER BY k) AS px
  FROM sampx
), zs AS (
  SELECT clip_id,
    CAST(COUNT(*) FILTER (WHERE px IS NOT NULL AND px * x < 0.0) AS DOUBLE)
      / NULLIF(COUNT(*) - 1, 0) AS zcr,
    MAX(abs(x)) AS peak
  FROM lagd GROUP BY clip_id
)
SELECT m.clip_id,
  CASE WHEN m.ok THEN round(COALESCE(z.zcr, 0.0), 6) END AS zcr,
  CASE WHEN m.ok THEN round(COALESCE(z.zcr, 0.0) * m.sr_hz / 2.0, 6) END AS est_freq_hz,
  CASE WHEN m.ok THEN round(COALESCE(z.peak, 0.0), 6) END AS peak,
  m.ok AS decode_ok
FROM meta m LEFT JOIN zs z USING (clip_id)
ORDER BY m.clip_id
"""


def pitch_estimate_sql(path: str) -> str:
    """Oracle for ``pitch_estimate``: decode → re-quantize to the int16
    grid (one deterministic IEEE op on bit-identical doubles) → exact
    int64 autocorrelation per lag (equi-join on ``b.k = a.k + lag``, a
    hash join — never a range join) → argmax with smallest-lag tie-break
    → integer-cross-multiplied voiced decision
    (scoring/audio.py:pitch_stats)."""
    return f"""WITH {_samples_cte(path)},
params AS (
  SELECT clip_id, sr_hz,
    GREATEST(2, sr_hz // 500) AS lagmin,
    sr_hz // 60 AS lagmax,
    LEAST(sr_hz // 25, n - sr_hz // 60) AS leff
  FROM meta WHERE ok
), xiq AS (
  SELECT s.clip_id, s.k, CAST(floor(s.x * 32767.0 + 0.5) AS BIGINT) AS xi
  FROM sampx s JOIN params p USING (clip_id)
  WHERE s.k < p.leff + p.lagmax
), r0 AS (
  SELECT x.clip_id, SUM(x.xi * x.xi) AS r0
  FROM xiq x JOIN params p USING (clip_id)
  WHERE x.k < p.leff
  GROUP BY x.clip_id
), lags AS (
  SELECT p.clip_id, CAST(l.lag AS BIGINT) AS lag
  FROM params p, LATERAL (SELECT unnest(range(p.lagmin, p.lagmax + 1)) AS lag) l
  WHERE p.leff >= 32
), prod AS (
  SELECT l.clip_id, l.lag, SUM(a.xi * b.xi) AS r
  FROM lags l
  JOIN params p ON p.clip_id = l.clip_id
  JOIN xiq a ON a.clip_id = l.clip_id AND a.k < p.leff
  JOIN xiq b ON b.clip_id = l.clip_id AND b.k = a.k + l.lag
  GROUP BY l.clip_id, l.lag
), best AS (
  SELECT clip_id, lag, r
  FROM prod
  QUALIFY row_number() OVER (PARTITION BY clip_id ORDER BY r DESC, lag ASC) = 1
)
SELECT m.clip_id,
  CASE WHEN m.ok AND p.leff >= 32 AND r0.r0 > 0 AND 10 * b.r >= 3 * r0.r0
       THEN round(p.sr_hz / b.lag, 6) END AS f0_hz,
  CASE WHEN m.ok AND p.leff >= 32 AND r0.r0 > 0
       THEN round(b.r / r0.r0, 6) END AS ac_peak_ratio,
  CASE WHEN m.ok
       THEN COALESCE(p.leff >= 32 AND r0.r0 > 0 AND 10 * b.r >= 3 * r0.r0, FALSE)
       END AS voiced,
  m.ok AS decode_ok
FROM meta m
LEFT JOIN params p USING (clip_id)
LEFT JOIN r0 USING (clip_id)
LEFT JOIN best b USING (clip_id)
ORDER BY m.clip_id
"""


def audio_snr_sql(path: str) -> str:
    """Oracle for ``audio_snr_estimate``: decile frame-energy SNR
    (scoring/audio.py:snr_stats) — rank the 20 ms-frame energies per clip,
    average the top / bottom ``(n_frames + 9) // 10`` (integer decile —
    no float rounding can split the engines), then ``10·log10`` of each
    side. Rank ties select the same energy multiset on both engines, so
    the means are tie-stable; a zero noise floor → NULL snr on both."""
    return f"""WITH {_samples_cte(path)},
fsize AS (
  SELECT clip_id, GREATEST(CAST(sr_hz * 20 / 1000 AS BIGINT), 1) AS frame
  FROM meta
), frames AS (
  SELECT s.clip_id, s.k // f.frame AS fi,
    SUM(s.x * s.x) / ANY_VALUE(f.frame) AS en
  FROM sampx s JOIN fsize f USING (clip_id)
  GROUP BY s.clip_id, s.k // f.frame
), ranked AS (
  SELECT clip_id, en,
    row_number() OVER (PARTITION BY clip_id ORDER BY en) AS rlo,
    row_number() OVER (PARTITION BY clip_id ORDER BY en DESC) AS rhi,
    COUNT(*) OVER (PARTITION BY clip_id) AS nf
  FROM frames
), per_clip AS (
  SELECT clip_id, ANY_VALUE(nf) AS nf,
    AVG(en) FILTER (WHERE rhi <= (nf + 9) // 10) AS sig_mean,
    AVG(en) FILTER (WHERE rlo <= (nf + 9) // 10) AS no_mean
  FROM ranked GROUP BY clip_id
), levels AS (
  SELECT clip_id, nf,
    CASE WHEN sig_mean > 0 THEN 10.0 * log10(sig_mean) END AS signal_db,
    CASE WHEN no_mean > 0 THEN 10.0 * log10(no_mean) END AS noise_db
  FROM per_clip
)
SELECT m.clip_id,
  CASE WHEN m.ok THEN round(l.signal_db, 6) END AS signal_db,
  CASE WHEN m.ok THEN round(l.noise_db, 6) END AS noise_db,
  CASE WHEN m.ok THEN round(l.signal_db - l.noise_db, 6) END AS snr_db,
  CASE WHEN m.ok THEN CAST(COALESCE(l.nf, 0) AS INT) END AS n_frames,
  CASE WHEN m.ok AND l.signal_db IS NOT NULL AND l.noise_db IS NOT NULL
       THEN round(l.signal_db - l.noise_db, 6) >= 30.0 END AS snr_ok,
  m.ok AS decode_ok
FROM meta m LEFT JOIN levels l USING (clip_id)
ORDER BY m.clip_id
"""


def trim_silence_sql(path: str) -> str:
    """Oracle for ``trim_silence``: first/last active 20 ms frame per clip
    (scoring/audio.py:trim_bounds) — MIN/MAX over the same ``rms > 0.01``
    frame flag as the segments oracle, then pure integer ms arithmetic
    (no rounding surface at all)."""
    return f"""WITH {_samples_cte(path)},
fsize AS (
  SELECT clip_id, GREATEST(CAST(sr_hz * 20 / 1000 AS BIGINT), 1) AS frame
  FROM meta
), frames AS (
  SELECT s.clip_id, s.k // f.frame AS fi,
    sqrt(SUM(s.x * s.x) / ANY_VALUE(f.frame)) AS rms
  FROM sampx s JOIN fsize f USING (clip_id)
  GROUP BY s.clip_id, s.k // f.frame
), bounds AS (
  SELECT clip_id, COUNT(*) AS nf,
    MIN(fi) FILTER (WHERE rms > 0.01) AS first_fi,
    MAX(fi) FILTER (WHERE rms > 0.01) AS last_fi
  FROM frames GROUP BY clip_id
)
SELECT m.clip_id,
  CASE WHEN m.ok THEN CAST(COALESCE(b.nf, 0) AS INT) END AS n_frames,
  CASE WHEN m.ok THEN CAST(b.first_fi * 20 AS INT) END AS trim_start_ms,
  CASE WHEN m.ok THEN CAST((b.last_fi + 1) * 20 AS INT) END AS trim_end_ms,
  CASE WHEN m.ok THEN
    CAST(COALESCE((b.last_fi + 1) * 20 - b.first_fi * 20, 0) AS INT)
  END AS kept_ms,
  m.ok AS decode_ok
FROM meta m LEFT JOIN bounds b USING (clip_id)
ORDER BY m.clip_id
"""


def _band_energy_ctes(frame_cte: str = "fsize", energy_cte: str = "en") -> str:
    """Shared CTE chain ``bins → <frame_cte> → dft → <energy_cte> → piv``:
    per-clip probe band energies ``e1..e4`` + total, the framed single-bin
    DFT replayed in SQL (the extracted core of the spectral oracle, reused
    by the cepstral and composed quality-filter oracles). Assumes
    ``meta``/``sampx`` from :func:`_samples_cte` are in scope; pass
    alternate CTE names when the caller's WITH-chain already uses
    ``fsize``/``en`` for other frame sizes (audio_quality_filter_sql's
    20 ms pass) — the body is shared either way so the DFT replay exists
    in exactly one place."""
    from .audio import SPECTRAL_BANDS_HZ, SPECTRAL_FRAME_MS

    f1, f2, f3, f4 = SPECTRAL_BANDS_HZ
    ang = "(((2 * pi() * b.fb) * s.k) / m.sr_hz)"
    return f"""bins(fb) AS (VALUES ({f1!r}), ({f2!r}), ({f3!r}), ({f4!r})),
{frame_cte} AS (
  SELECT clip_id, GREATEST(CAST(sr_hz * {SPECTRAL_FRAME_MS} / 1000 AS BIGINT), 1) AS frame
  FROM meta
), dft AS (
  SELECT s.clip_id, b.fb, s.k // f.frame AS fi,
    SUM(s.x * cos({ang})) AS sc,
    SUM(s.x * sin({ang})) AS ss
  FROM sampx s JOIN meta m USING (clip_id) JOIN {frame_cte} f USING (clip_id)
  CROSS JOIN bins b
  GROUP BY s.clip_id, b.fb, s.k // f.frame
), {energy_cte} AS (
  SELECT clip_id, fb, SUM(sc * sc + ss * ss) AS e FROM dft GROUP BY clip_id, fb
), piv AS (
  SELECT clip_id, SUM(e) AS tot,
    MAX(e) FILTER (WHERE fb = {f1!r}) AS e1,
    MAX(e) FILTER (WHERE fb = {f2!r}) AS e2,
    MAX(e) FILTER (WHERE fb = {f3!r}) AS e3,
    MAX(e) FILTER (WHERE fb = {f4!r}) AS e4
  FROM {energy_cte} GROUP BY clip_id
)"""


def audio_level_stats_sql(path: str) -> str:
    """Oracle for ``audio_level_stats``: int16 re-quantization, exact
    int64 Σxi/Σxi²/MAX(|xi|), and the identical float report expressions
    (scoring/audio.py:level_stats)."""
    return f"""WITH {_samples_cte(path)},
xiq AS (
  SELECT clip_id, CAST(floor(x * 32767.0 + 0.5) AS BIGINT) AS xi FROM sampx
), agg AS (
  SELECT clip_id, SUM(xi) AS s1, SUM(xi * xi) AS s2,
         MAX(ABS(xi)) AS peak_q, COUNT(*) AS n
  FROM xiq GROUP BY clip_id
)
SELECT m.clip_id,
  CASE WHEN m.ok THEN round((a.s1 / a.n) / 32767.0, 6) END AS dc_offset,
  CASE WHEN m.ok THEN round(sqrt(a.s2 / a.n) / 32767.0, 6) END AS rms,
  CASE WHEN m.ok THEN round(a.peak_q / 32767.0, 6) END AS peak,
  CASE WHEN m.ok AND a.s2 > 0 AND a.peak_q > 0
       THEN round(20.0 * log10(a.peak_q / sqrt(a.s2 / a.n)), 6) END AS crest_db,
  m.ok AS decode_ok
FROM meta m LEFT JOIN agg a USING (clip_id)
ORDER BY m.clip_id
"""


def cepstral_features_sql(path: str) -> str:
    """Oracle for ``cepstral_features``: band energies via the shared DFT
    CTEs, then ``ln``/DCT-II/flatness with the EXPLICIT left-associated
    operation trees the numpy side uses (scoring/audio.py:
    cepstral_features) — angle ``((π·m)·(2f+1))/(2n)``, terms in
    ascending band order — so the engines agree within libm's 1 ulp,
    behind the 6-decimal round."""
    n = 4
    coefs = []
    for m in range(3):
        terms = " + ".join(
            f"l{f + 1} * cos(((pi() * {m}) * {2 * f + 1}) / {2 * n})" for f in range(n)
        )
        coefs.append(terms)
    lsum = " + ".join(f"l{f + 1}" for f in range(n))
    esum = " + ".join(f"e{f + 1}" for f in range(n))
    return f"""WITH {_samples_cte(path)},
{_band_energy_ctes()},
cep AS (
  SELECT clip_id, e1, e2, e3, e4,
    ln(e1) AS l1, ln(e2) AS l2, ln(e3) AS l3, ln(e4) AS l4
  FROM piv WHERE e1 > 0 AND e2 > 0 AND e3 > 0 AND e4 > 0
)
SELECT m.clip_id,
  CASE WHEN m.ok THEN round({coefs[0]}, 6) END AS c0,
  CASE WHEN m.ok THEN round({coefs[1]}, 6) END AS c1,
  CASE WHEN m.ok THEN round({coefs[2]}, 6) END AS c2,
  CASE WHEN m.ok THEN round(exp(({lsum}) / {n}) / (({esum}) / {n}), 6) END AS flatness,
  m.ok AS decode_ok
FROM meta m LEFT JOIN cep c USING (clip_id)
ORDER BY m.clip_id
"""


def spectral_band_ratios_sql(path: str) -> str:
    """Oracle for ``spectral_band_ratios``: the FRAMED single-bin DFT
    replayed in SQL — per (clip, probe frequency, 50 ms frame),
    ``SUM(x·cos(((2π·f)·k)/sr))`` and the sine twin with the IDENTICAL
    operation order as the numpy side (scoring/audio.py:band_ratios,
    global sample index k — frame magnitudes are phase-invariant), frame
    energies summed per clip, pivoted to columns, ratios rounded to 6
    decimals, and the dominant band chosen by a CASE chain over the
    ROUNDED ratios (ties break toward the lower frequency on both
    engines)."""
    from .audio import SPECTRAL_BANDS_HZ

    f1, f2, f3, f4 = SPECTRAL_BANDS_HZ
    return f"""WITH {_samples_cte(path)},
{_band_energy_ctes()},
rat AS (
  SELECT clip_id,
    round(e1 / tot, 6) AS r{int(f1)}, round(e2 / tot, 6) AS r{int(f2)},
    round(e3 / tot, 6) AS r{int(f3)}, round(e4 / tot, 6) AS r{int(f4)}
  FROM piv WHERE tot > 0
)
SELECT m.clip_id,
  CASE WHEN m.ok THEN r.r{int(f1)} END AS r{int(f1)},
  CASE WHEN m.ok THEN r.r{int(f2)} END AS r{int(f2)},
  CASE WHEN m.ok THEN r.r{int(f3)} END AS r{int(f3)},
  CASE WHEN m.ok THEN r.r{int(f4)} END AS r{int(f4)},
  CASE WHEN m.ok AND r.r{int(f1)} IS NOT NULL THEN
    CASE WHEN r.r{int(f1)} >= r.r{int(f2)} AND r.r{int(f1)} >= r.r{int(f3)}
              AND r.r{int(f1)} >= r.r{int(f4)} THEN {int(f1)}
         WHEN r.r{int(f2)} >= r.r{int(f3)} AND r.r{int(f2)} >= r.r{int(f4)} THEN {int(f2)}
         WHEN r.r{int(f3)} >= r.r{int(f4)} THEN {int(f3)}
         ELSE {int(f4)} END
  END AS dominant_hz,
  m.ok AS decode_ok
FROM meta m LEFT JOIN rat r USING (clip_id)
ORDER BY m.clip_id
"""


def audio_quality_filter_sql(path: str) -> str:
    """Oracle for ``audio_quality_filter``: the decile-SNR, trim-bounds,
    and framed-DFT pieces composed into one WITH-chain (the 20 ms frame
    energies are computed once and shared by the SNR and trim rules,
    mirroring the fused Spark stage), then the keep/drop rules as
    NULL-aware CASE tags concat_ws'd in fixed order — both engines skip
    NULL tags, so the reasons string is identical by construction."""
    from .audio import SPECTRAL_BANDS_HZ

    f1, f2, f3, f4 = SPECTRAL_BANDS_HZ
    return f"""WITH {_samples_cte(path)},
fsize AS (
  SELECT clip_id, GREATEST(CAST(sr_hz * 20 / 1000 AS BIGINT), 1) AS frame
  FROM meta
), frames AS (
  SELECT s.clip_id, s.k // f.frame AS fi,
    SUM(s.x * s.x) / ANY_VALUE(f.frame) AS en
  FROM sampx s JOIN fsize f USING (clip_id)
  GROUP BY s.clip_id, s.k // f.frame
), ranked AS (
  SELECT clip_id, en,
    row_number() OVER (PARTITION BY clip_id ORDER BY en) AS rlo,
    row_number() OVER (PARTITION BY clip_id ORDER BY en DESC) AS rhi,
    COUNT(*) OVER (PARTITION BY clip_id) AS nf
  FROM frames
), snrc AS (
  SELECT clip_id,
    AVG(en) FILTER (WHERE rhi <= (nf + 9) // 10) AS sig_mean,
    AVG(en) FILTER (WHERE rlo <= (nf + 9) // 10) AS no_mean
  FROM ranked GROUP BY clip_id
), snrl AS (
  SELECT clip_id,
    CASE WHEN sig_mean > 0 AND no_mean > 0
         THEN round(10.0 * log10(sig_mean) - 10.0 * log10(no_mean), 6)
    END AS snr_r
  FROM snrc
), bounds AS (
  SELECT clip_id, COUNT(*) AS nf,
    MIN(fi) FILTER (WHERE sqrt(en) > 0.01) AS first_fi,
    MAX(fi) FILTER (WHERE sqrt(en) > 0.01) AS last_fi
  FROM frames GROUP BY clip_id
), kept AS (
  SELECT clip_id, nf,
    COALESCE((last_fi + 1) * 20 - first_fi * 20, 0) AS kept_ms
  FROM bounds
), {_band_energy_ctes(frame_cte="fs50", energy_cte="en2")}, dom AS (
  SELECT clip_id,
    CASE WHEN round(e1 / tot, 6) >= round(e2 / tot, 6)
              AND round(e1 / tot, 6) >= round(e3 / tot, 6)
              AND round(e1 / tot, 6) >= round(e4 / tot, 6) THEN {int(f1)}
         WHEN round(e2 / tot, 6) >= round(e3 / tot, 6)
              AND round(e2 / tot, 6) >= round(e4 / tot, 6) THEN {int(f2)}
         WHEN round(e3 / tot, 6) >= round(e4 / tot, 6) THEN {int(f3)}
         ELSE {int(f4)} END AS dominant
  FROM piv WHERE tot > 0
), rulec AS (
  SELECT m.clip_id,
    CASE WHEN NOT m.ok THEN 'decode' END AS t1,
    CASE WHEN m.ok AND (s.snr_r IS NULL OR s.snr_r < 5.0) THEN 'snr_low' END AS t2,
    CASE WHEN m.ok AND (k.kept_ms * 10 < k.nf * 120) THEN 'mostly_silence' END AS t3,
    CASE WHEN m.ok AND d.dominant = {int(f4)} THEN 'high_band' END AS t4
  FROM meta m
  LEFT JOIN snrl s USING (clip_id)
  LEFT JOIN kept k USING (clip_id)
  LEFT JOIN dom d USING (clip_id)
)
SELECT clip_id,
  (t1 IS NULL AND t2 IS NULL AND t3 IS NULL AND t4 IS NULL) AS keep,
  concat_ws('|', t1, t2, t3, t4) AS reasons
FROM rulec ORDER BY clip_id
"""


def audio_resample_stats_sql(path: str, target_hz: int = 8000) -> str:
    """Oracle for ``audio_resample_stats``: re-select the nearest-neighbor
    sample indices with the IDENTICAL integer arithmetic
    (``m = n*target // sr``; ``k = j*sr // target`` —
    scoring/audio.resample_nn) and aggregate the post-resample energy.
    The float SUM(x²) follows the fingerprint oracle's float-aggregate
    precedent (rounded to 6 on both sides)."""
    return f"""WITH {_samples_cte(path)},
js AS (
  SELECT clip_id, sr_hz, n, (n * {target_hz}) // sr_hz AS m_out,
         unnest(range(0, GREATEST((n * {target_hz}) // sr_hz, 0))) AS j
  FROM meta WHERE ok
), sel AS (
  SELECT js.clip_id, js.m_out, s.x
  FROM js JOIN sampx s
    ON s.clip_id = js.clip_id AND s.k = (js.j * js.sr_hz) // {target_hz}
), agg AS (
  SELECT clip_id, m_out,
    round(20.0 * log10(GREATEST(sqrt(SUM(x * x) / m_out), 1e-6)), 6) AS rms_db_out
  FROM sel GROUP BY clip_id, m_out
)
SELECT m.clip_id, m.sr_hz,
  CASE WHEN m.ok THEN CAST(m.n AS BIGINT) END AS n_in,
  CASE WHEN m.ok THEN CAST(COALESCE(a.m_out, 0) AS BIGINT) END AS n_out,
  CASE WHEN m.ok THEN COALESCE(a.rms_db_out, -120.0) END AS rms_db_out,
  m.ok AS decode_ok
FROM meta m LEFT JOIN agg a USING (clip_id)
ORDER BY m.clip_id
"""


def cmvn_features_sql(path: str) -> str:
    """Oracle for ``cmvn_features``: per-clip rounded features → exact
    DECIMAL(28,6) corpus moments → double mean/std → z-scores. The moment
    arithmetic mirrors the Spark op term for term: s1 = Σ round(x,6) and
    s2 = Σ round(x²,6) as decimals (partition-order-proof), then every
    downstream step (cast to double, /n, var, sqrt, guard, round) is
    deterministic IEEE double math identical in both engines."""
    zcols = []
    for c in ("rms_db", "silence_ratio", "clip_ratio"):
        std = (
            f"(CASE WHEN sqrt(GREATEST(CAST(mo.s2_{c} AS DOUBLE) / mo.n"
            f" - (CAST(mo.s1_{c} AS DOUBLE) / mo.n) * (CAST(mo.s1_{c} AS DOUBLE) / mo.n),"
            f" 0.0)) > 1e-12 THEN sqrt(GREATEST(CAST(mo.s2_{c} AS DOUBLE) / mo.n"
            f" - (CAST(mo.s1_{c} AS DOUBLE) / mo.n) * (CAST(mo.s1_{c} AS DOUBLE) / mo.n),"
            f" 0.0)) ELSE 1.0 END)"
        )
        zcols.append(
            f"round((f.{c} - CAST(mo.s1_{c} AS DOUBLE) / mo.n) / {std}, 6) AS {c}_z"
        )
    moments = ", ".join(
        f"SUM(CAST({c} AS DECIMAL(28,6))) AS s1_{c}, "
        f"SUM(CAST(round({c} * {c}, 6) AS DECIMAL(28,6))) AS s2_{c}"
        for c in ("rms_db", "silence_ratio", "clip_ratio")
    )
    return f"""WITH {_samples_cte(path)},
feat0 AS (
  SELECT clip_id,
    round(20.0 * log10(GREATEST(sqrt(SUM(x * x) / COUNT(*)), 1e-6)), 6) AS rms_db,
    round(CAST(COUNT(*) FILTER (WHERE abs(x) < 0.01) AS DOUBLE) / COUNT(*), 6) AS silence_ratio,
    round(CAST(COUNT(*) FILTER (WHERE abs(x) > 0.985) AS DOUBLE) / COUNT(*), 6) AS clip_ratio
  FROM sampx GROUP BY clip_id
),
okf AS (
  -- LEFT join + zero-sample constants (audio.features at n == 0): an ok
  -- clip with an EMPTY payload has no feat0 row but the Spark op still
  -- includes it in the corpus moments — an inner join would both drop
  -- its output row AND skew every clip's z-score. dur_ms IS NOT NULL
  -- mirrors decode_stage's int(dur_ms) quarantine.
  SELECT m.clip_id,
    COALESCE(f.rms_db, -120.0) AS rms_db,
    COALESCE(f.silence_ratio, 1.0) AS silence_ratio,
    COALESCE(f.clip_ratio, 0.0) AS clip_ratio
  FROM meta m LEFT JOIN feat0 f USING (clip_id)
  WHERE m.ok AND m.dur_ms IS NOT NULL
),
mo AS (
  SELECT COUNT(*) AS n, {moments} FROM okf
)
SELECT f.clip_id, {", ".join(zcols)}
FROM okf f, mo
ORDER BY f.clip_id
"""


def window_decode_features_sql(
    path: str, window_ms: int = 500, min_tail_ms: int = 100
) -> str:
    """Oracle for ``window_decode_features``: the clip_windows arithmetic
    joined against the SQL-decoded samples, sample index restricted to each
    window's [start*sr//1000, end*sr//1000) range
    (ops/multimodal.py:window_decode_stage)."""
    return f"""WITH {_samples_cte(path)},
wins AS (
  -- COALESCE(dur_ms, 0): the Spark stage maps NULL dur_ms to ONE
  -- zero-length (0,0,0) window (window_decode_stage) — dur=0 reproduces
  -- that exactly, while raw NULL would leak through LEAST/GREATEST
  -- (which IGNORE NULLs in DuckDB) as a fabricated 0-500ms live window
  SELECT m.clip_id, m.sr_hz, m.ok, m.n, CAST(k AS INT) AS win_idx,
    CAST(k * {window_ms} AS INT) AS start_ms,
    CAST(LEAST(k * {window_ms} + {window_ms}, COALESCE(m.dur_ms, 0)) AS INT) AS end_ms,
    GREATEST(1, CAST(COALESCE(m.dur_ms, 0) // {window_ms}
      + CASE WHEN COALESCE(m.dur_ms, 0) - (COALESCE(m.dur_ms, 0) // {window_ms}) * {window_ms} >= {min_tail_ms}
             THEN 1 ELSE 0 END AS INT)) AS n_windows
  FROM meta m, LATERAL (SELECT unnest(range(0,
    GREATEST(1, CAST(COALESCE(m.dur_ms, 0) // {window_ms}
      + CASE WHEN COALESCE(m.dur_ms, 0) - (COALESCE(m.dur_ms, 0) // {window_ms}) * {window_ms} >= {min_tail_ms}
             THEN 1 ELSE 0 END AS BIGINT)))) AS k) ks
), seg AS (
  SELECT w.clip_id, w.win_idx,
    20.0 * log10(GREATEST(sqrt(SUM(s.x * s.x) / COUNT(*)), 1e-6)) AS rms_db,
    CAST(COUNT(*) FILTER (WHERE abs(s.x) < 0.01) AS DOUBLE) / COUNT(*) AS silence_ratio
  FROM wins w JOIN sampx s ON s.clip_id = w.clip_id
    AND s.k >= LEAST((w.start_ms * w.sr_hz) // 1000, w.n)
    AND s.k < LEAST((w.end_ms * w.sr_hz) // 1000, w.n)
  GROUP BY w.clip_id, w.win_idx
)
SELECT w.clip_id, w.win_idx, w.start_ms, w.end_ms, w.n_windows,
  CASE WHEN w.ok THEN round(COALESCE(g.rms_db, -120.0), 6) END AS rms_db,
  CASE WHEN w.ok THEN round(COALESCE(g.silence_ratio, 1.0), 6) END AS silence_ratio,
  w.ok AS decode_ok
FROM wins w LEFT JOIN seg g ON g.clip_id = w.clip_id AND g.win_idx = w.win_idx
ORDER BY w.clip_id, w.win_idx
"""


def duration_batches_sql(path: str, max_batch_ms: int = 4000) -> str:
    """Oracle for ``duration_batches``: single-node window cumsum over the
    same (dur_ms, clip_id) total order — exactly what the distributed
    prefix sum must equal (ops/multimodal.py:duration_batches)."""
    return f"""WITH src AS (
  -- COALESCE: NULL dur → 0-length clip (Spark sorts NULLS FIRST, DuckDB
  -- LAST — and NULL arithmetic would emit a NULL batch on the Spark side)
  SELECT clip_id, COALESCE(dur_ms, 0) AS dur_ms FROM read_parquet('{path}')
), c AS (
  SELECT clip_id, dur_ms,
    SUM(dur_ms) OVER (ORDER BY dur_ms, clip_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cum_before
  FROM src
), assigned AS (
  SELECT clip_id, dur_ms,
    CAST(COALESCE(cum_before, 0) // {max_batch_ms} AS INT) AS batch_id
  FROM c
)
SELECT batch_id, CAST(COUNT(*) AS INT) AS n_clips,
  CAST(SUM(dur_ms) AS BIGINT) AS total_ms,
  CAST(MAX(dur_ms) AS INT) AS max_ms,
  CAST(MAX(dur_ms) * COUNT(*) - SUM(dur_ms) AS BIGINT) AS padding_ms
FROM assigned GROUP BY batch_id ORDER BY batch_id
"""


def ensure_near_dup_fixture(n: int = 200, every: int = 20) -> str:
    """Base clips + planted volume-scaled re-encodes, as parquet."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..synth import clips

    path = os.path.join(FIXTURE_DIR, f"clips_neardup{n}_{every}.parquet")
    if not os.path.exists(path):
        os.makedirs(FIXTURE_DIR, exist_ok=True)
        pdf = clips.clips_with_near_dups_pandas(n, every)
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), tmp)
        os.replace(tmp, path)
    return path


def _fingerprint_ctes() -> str:
    """Appended to ``_samples_cte``: per-slice energies → relative-threshold
    bits → four 16-bit block keys (scoring/audio.py:fingerprint). Slicing
    is the same exact integer ``k * 64 // n``; only the energy-mean compare
    is float (frames-RMS precedent). ``grid``+``COALESCE`` covers slices and
    blocks with no samples (bit 0), matching numpy's minlength."""
    return """en AS (
  SELECT s.clip_id, (s.k * 64) // m.n AS sl, SUM(s.x * s.x) AS e, COUNT(*) AS c
  FROM sampx s JOIN meta m USING (clip_id)
  GROUP BY s.clip_id, (s.k * 64) // m.n
), tot AS (
  SELECT clip_id, SUM(x * x) / COUNT(*) AS tot FROM sampx GROUP BY clip_id
), bits AS (
  SELECT e.clip_id, e.sl,
    CASE WHEN e.e / e.c > t.tot THEN 1 ELSE 0 END AS b
  FROM en e JOIN tot t USING (clip_id)
), grid AS (
  -- dur_ms IS NOT NULL: the fingerprint stage computes the rms/silence
  -- VERIFY features via audio.features(pcm, sr, dur) — int(dur) raises
  -- inside its quarantine try, so a NULL-duration clip is decode_ok=false
  -- there even though the fingerprint bits alone never read dur
  SELECT clip_id, unnest([0, 1, 2, 3]) AS band
  FROM meta WHERE ok AND dur_ms IS NOT NULL
), blk AS (
  SELECT clip_id, CAST(sl // 16 AS INT) AS band,
    CAST(SUM(b * (1 << CAST(sl % 16 AS INT))) AS INT) AS key
  FROM bits GROUP BY clip_id, CAST(sl // 16 AS INT)
), blocks AS (
  SELECT g.clip_id, g.band, COALESCE(k.key, 0) AS key
  FROM grid g LEFT JOIN blk k USING (clip_id, band)
), fp AS (
  SELECT clip_id,
    MAX(CASE WHEN band = 0 THEN key END) AS b0,
    MAX(CASE WHEN band = 1 THEN key END) AS b1,
    MAX(CASE WHEN band = 2 THEN key END) AS b2,
    MAX(CASE WHEN band = 3 THEN key END) AS b3
  FROM blocks GROUP BY clip_id
)"""


def audio_fingerprints_sql(path: str) -> str:
    """Oracle for ``audio_fingerprints``."""
    return f"""WITH {_samples_cte(path)},
{_fingerprint_ctes()}
SELECT m.clip_id,
  CASE WHEN m.ok AND m.dur_ms IS NOT NULL THEN f.b0 END AS b0,
  CASE WHEN m.ok AND m.dur_ms IS NOT NULL THEN f.b1 END AS b1,
  CASE WHEN m.ok AND m.dur_ms IS NOT NULL THEN f.b2 END AS b2,
  CASE WHEN m.ok AND m.dur_ms IS NOT NULL THEN f.b3 END AS b3,
  (m.ok AND m.dur_ms IS NOT NULL) AS decode_ok
FROM meta m LEFT JOIN fp f USING (clip_id)
ORDER BY m.clip_id
"""


def _dup_pairs_ctes(max_hamming: int) -> str:
    """Verified near-dup ``pairs`` CTE chain, appended to samples +
    fingerprint CTEs. Shared by the pairs and groups oracles."""
    return f"""feat AS (
  SELECT clip_id,
    20.0 * log10(GREATEST(sqrt(SUM(x * x) / COUNT(*)), 1e-6)) AS rms_db,
    COUNT(*) FILTER (WHERE abs(x) < 0.01) / CAST(COUNT(*) AS DOUBLE) AS silence_ratio
  FROM sampx GROUP BY clip_id
), fpv AS (
  SELECT m.clip_id, m.dur_ms, m.sr_hz,
    COALESCE(ft.rms_db, -120.0) AS rms_db,
    COALESCE(ft.silence_ratio, 1.0) AS silence_ratio,
    f.b0, f.b1, f.b2, f.b3
  FROM meta m
  JOIN fp f USING (clip_id)
  LEFT JOIN feat ft USING (clip_id)
  WHERE m.ok AND m.dur_ms IS NOT NULL
), cand AS (
  SELECT a.clip_id AS clip_a, b.clip_id AS clip_b
  FROM blocks a JOIN blocks b
    ON a.band = b.band AND a.key = b.key AND a.clip_id < b.clip_id
  GROUP BY 1, 2
), pairs AS (
  SELECT * FROM (
    SELECT c.clip_a, c.clip_b,
      CAST(bit_count(xor(fa.b0, fb.b0)) + bit_count(xor(fa.b1, fb.b1))
         + bit_count(xor(fa.b2, fb.b2)) + bit_count(xor(fa.b3, fb.b3)) AS INT) AS hamming
    FROM cand c
    JOIN fpv fa ON fa.clip_id = c.clip_a
    JOIN fpv fb ON fb.clip_id = c.clip_b
    WHERE fa.dur_ms = fb.dur_ms AND fa.sr_hz = fb.sr_hz
      AND abs(fa.rms_db - fb.rms_db) <= 1.0
      AND abs(fa.silence_ratio - fb.silence_ratio) <= 0.02
  ) WHERE hamming <= {max_hamming}
)"""


def audio_dup_pairs_sql(path: str, max_hamming: int = 3) -> str:
    """Oracle for ``audio_dup_pairs``: banded block join → popcount +
    feature verify (ops/multimodal.py:audio_dup_pairs)."""
    return f"""WITH {_samples_cte(path)},
{_fingerprint_ctes()},
{_dup_pairs_ctes(max_hamming)}
SELECT clip_a, clip_b, hamming FROM pairs ORDER BY clip_a, clip_b
"""


def audio_dup_groups_sql(path: str, max_hamming: int = 3) -> str:
    """Oracle for ``audio_dup_groups``: recursive transitive closure over
    the identical SQL-decoded verified-pair CTE, min-id canonicals,
    singletons via left join against the full clip table
    (ops/multimodal.py:audio_dup_groups)."""
    return f"""WITH RECURSIVE {_samples_cte(path)},
{_fingerprint_ctes()},
{_dup_pairs_ctes(max_hamming)},
aedges AS (
  SELECT clip_a AS a, clip_b AS b FROM pairs
  UNION ALL SELECT clip_b, clip_a FROM pairs
), anodes AS (
  SELECT DISTINCT a AS clip_id FROM aedges
), areach AS (
  SELECT clip_id AS src, clip_id AS dst FROM anodes
  UNION
  SELECT r.src, e.b FROM areach r JOIN aedges e ON r.dst = e.a
), agroups AS (
  SELECT src AS clip_id, MIN(dst) AS group_id FROM areach GROUP BY src
)
SELECT COALESCE(g.group_id, c.clip_id) AS group_id, c.clip_id,
  COALESCE(g.group_id, c.clip_id) = c.clip_id AS is_canonical
FROM (SELECT clip_id FROM read_parquet('{path}')) c
LEFT JOIN agroups g USING (clip_id)
ORDER BY group_id, clip_id
"""


def speech_rate_sql(path: str) -> str:
    """Oracle for ``speech_rate``: frames → speech_ratio → the identical
    words/(ratio·duration) division chain (ops/multimodal.py:speech_rate)."""
    return f"""WITH {_samples_cte(path)},
fsize AS (
  SELECT clip_id, GREATEST(CAST(sr_hz * 20 / 1000 AS BIGINT), 1) AS frame
  FROM meta
), frames AS (
  SELECT s.clip_id, s.k // f.frame AS fi,
    sqrt(SUM(s.x * s.x) / ANY_VALUE(f.frame)) AS rms
  FROM sampx s JOIN fsize f USING (clip_id)
  GROUP BY s.clip_id, s.k // f.frame
), per_clip AS (
  SELECT clip_id,
    CAST(COUNT(*) FILTER (WHERE rms > 0.01) AS DOUBLE) / COUNT(*) AS speech_ratio
  FROM frames GROUP BY clip_id
), words AS (
  SELECT clip_id, dur_ms,
    len(list_filter(string_split(COALESCE(transcript, ''), ' '), x -> x <> '')) AS n_words
  FROM read_parquet('{path}')
)
SELECT w.clip_id, w.n_words, w.dur_ms,
  round(w.n_words / (w.dur_ms / 1000.0), 6) AS wps,
  CASE WHEN m.ok AND COALESCE(p.speech_ratio, 0.0) > 0
       THEN round(w.n_words / (p.speech_ratio * (w.dur_ms / 1000.0)), 6) END AS speech_wps,
  m.ok AS decode_ok
FROM words w
JOIN meta m USING (clip_id)
LEFT JOIN per_clip p USING (clip_id)
ORDER BY w.clip_id
"""


def audio_segments_sql(path: str) -> str:
    """Oracle for ``audio_segments``: 20 ms-frame energy VAD run-length
    stats (curator_spark/scoring/audio.py:segments) via gaps-and-islands."""
    return f"""WITH {_samples_cte(path)},
fsize AS (
  SELECT clip_id, GREATEST(CAST(sr_hz * 20 / 1000 AS BIGINT), 1) AS frame
  FROM meta
), frames AS (
  SELECT s.clip_id, s.k // f.frame AS fi,
    sqrt(SUM(s.x * s.x) / ANY_VALUE(f.frame)) AS rms
  FROM sampx s JOIN fsize f USING (clip_id)
  GROUP BY s.clip_id, s.k // f.frame
), flagged AS (
  SELECT clip_id, fi, rms > 0.01 AS active,
    row_number() OVER (PARTITION BY clip_id ORDER BY fi)
      - row_number() OVER (PARTITION BY clip_id, rms > 0.01 ORDER BY fi) AS grp
  FROM frames
), runs AS (
  SELECT clip_id, active, grp, COUNT(*) AS run_len
  FROM flagged GROUP BY clip_id, active, grp
), per_clip AS (
  SELECT f.clip_id,
    CAST(COUNT(*) FILTER (WHERE f.active) AS DOUBLE) / COUNT(*) AS speech_ratio
  FROM flagged f GROUP BY f.clip_id
), runstats AS (
  SELECT clip_id,
    CAST(COUNT(*) FILTER (WHERE active) AS INT) AS n_speech_segments,
    COALESCE(MAX(run_len) FILTER (WHERE active), 0) AS longest_sp,
    COALESCE(MAX(run_len) FILTER (WHERE NOT active), 0) AS longest_si
  FROM runs GROUP BY clip_id
)
SELECT m.clip_id,
  CASE WHEN m.ok THEN COALESCE(r.n_speech_segments, 0) ELSE NULL END AS n_speech_segments,
  CASE WHEN m.ok THEN round(COALESCE(p.speech_ratio, 0.0), 6) ELSE NULL END AS speech_ratio,
  CASE WHEN m.ok THEN round(COALESCE(r.longest_sp, 0) * 20.0, 6) ELSE NULL END AS longest_speech_ms,
  CASE WHEN m.ok THEN round(COALESCE(r.longest_si, 0) * 20.0, 6) ELSE NULL END AS longest_silence_ms,
  m.ok AS decode_ok
FROM meta m
LEFT JOIN runstats r USING (clip_id)
LEFT JOIN per_clip p USING (clip_id)
ORDER BY m.clip_id
"""
