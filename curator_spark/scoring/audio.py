"""Audio decode + feature extraction — the shared pure-numpy core.

Used identically by the Spark ``mapInPandas`` decode stage and the
pure-Python oracle, so the decoded-PCM invariant (SNR >= 30 dB, here exact)
holds by construction. Analog of the reference's media loading
(``types/prompt.py:21-103``: bytes → provider payload, decoded lazily,
size-checked) — here bytes → PCM → features, PCM dropped inside the batch.

Real-world codecs (mp3/opus/flac) would plug in here behind the same
``decode(blob, codec)`` dispatch using soundfile/ffmpeg; those libs are not
in this image, so unsupported codecs raise (clearly-marked stub).
"""

from __future__ import annotations

import numpy as np

from ..synth import audiogen


def decode(blob: bytes, codec: str, sr_hz: int) -> np.ndarray:
    """bytes → float64 PCM in [-1, 1]. Pure function of the row."""
    if codec == "pcm_s16le":
        pcm, wav_sr = audiogen.wav_to_pcm(blob)
        if wav_sr != sr_hz:
            raise ValueError(f"sr mismatch: wav={wav_sr} meta={sr_hz}")
        return pcm
    if codec == "ulaw":
        return audiogen.mulaw_decode(blob)
    # STUB: real deployments dispatch to soundfile/ffmpeg here.
    raise NotImplementedError(f"codec {codec!r} needs an external decoder")


def features(pcm: np.ndarray, sr_hz: int, dur_ms: int) -> dict[str, float]:
    """Per-clip audio features feeding the quality rules.

    All float64; identical math in oracle and UDF.
    """
    n = pcm.shape[0]
    if n == 0:
        return {"rms_db": -120.0, "silence_ratio": 1.0, "clip_ratio": 0.0, "dur_err_ms": float(dur_ms)}
    # single |pcm| pass reused by both ratio features; dot() for the energy
    # (one fused pass instead of materializing pcm*pcm)
    a = np.abs(pcm)
    rms = float(np.sqrt(np.dot(pcm, pcm) / n))
    rms_db = 20.0 * np.log10(max(rms, 1e-6))
    silence_ratio = float(np.count_nonzero(a < 0.01) / n)
    clip_ratio = float(np.count_nonzero(a > 0.985) / n)
    dur_err_ms = abs(n / sr_hz * 1000.0 - dur_ms)
    return {
        "rms_db": float(rms_db),
        "silence_ratio": silence_ratio,
        "clip_ratio": clip_ratio,
        "dur_err_ms": float(dur_err_ms),
    }


def zcr_stats(pcm: np.ndarray, sr_hz: int) -> dict[str, float]:
    """Zero-crossing rate + peak level — the classic cheap voiced/unvoiced
    and hot-signal discriminators. A crossing is a strict sign flip
    (``x[k-1]·x[k] < 0``): products of bit-identical doubles, so the SQL
    oracle compares exactly (no float-summation exposure anywhere here —
    peak is a MAX, zcr a count). ``est_freq_hz`` is the standard zcr·sr/2
    fundamental-frequency proxy."""
    n = pcm.shape[0]
    if n < 2:
        return {"zcr": 0.0, "est_freq_hz": 0.0, "peak": float(np.abs(pcm).max()) if n else 0.0}
    crossings = int(np.count_nonzero(pcm[:-1] * pcm[1:] < 0.0))
    zcr = crossings / (n - 1)
    return {
        "zcr": float(zcr),
        "est_freq_hz": float(zcr * sr_hz / 2.0),
        "peak": float(np.abs(pcm).max()),
    }


DEFAULT_TARGET_RMS_DB = -20.0  # common speech-corpus normalization target
CLIP_AMPLITUDE = 0.985         # same "clipped sample" threshold as clip_ratio


def loudness(
    pcm: np.ndarray, target_db: float = DEFAULT_TARGET_RMS_DB
) -> dict[str, float]:
    """Loudness-normalization plan for one clip: the gain (dB) that moves
    its RMS to ``target_db``, plus the fraction of samples that would clip
    AFTER that gain (the pipeline's signal for "attenuate or drop instead
    of amplify"). The gain is quantized to 1e-6 dB before the clip check so
    the Spark UDF and the SQL oracle compare bit-identical |x|·g products
    (same precedent as the fingerprint oracle's energy-mean compare)."""
    n = pcm.shape[0]
    if n == 0:
        return {
            "rms_db": -120.0,
            "gain_db": round(target_db + 120.0, 6),
            "post_gain_clip_ratio": 0.0,
        }
    rms = float(np.sqrt(np.dot(pcm, pcm) / n))
    rms_db = 20.0 * np.log10(max(rms, 1e-6))
    gain_db = round(target_db - rms_db, 6)
    g = 10.0 ** (gain_db / 20.0)
    post = float(np.count_nonzero(np.abs(pcm) * g > CLIP_AMPLITUDE) / n)
    return {"rms_db": float(rms_db), "gain_db": gain_db, "post_gain_clip_ratio": post}


FRAME_MS = 20          # standard VAD frame size
SPEECH_RMS_THRESH = 0.01  # matches the silence_ratio amplitude threshold


def segments(
    pcm: np.ndarray,
    sr_hz: int,
    frame_ms: int = FRAME_MS,
    thresh: float = SPEECH_RMS_THRESH,
) -> dict[str, float]:
    """Energy-threshold speech/silence segmentation — the standard public
    VAD baseline (frame RMS vs threshold, run-length segments). Pure
    vectorized numpy, identical in the Spark UDF and the oracle.

    The trailing partial frame is zero-padded to full width before the
    RMS (slight underestimate for that frame) — deterministic and shared
    by both engines, so parity holds by construction."""
    n = pcm.shape[0]
    zero = {
        "n_speech_segments": 0,
        "speech_ratio": 0.0,
        "longest_speech_ms": 0.0,
        "longest_silence_ms": 0.0,
    }
    if n == 0:
        return zero
    frame = max(1, int(sr_hz * frame_ms / 1000))
    n_frames = -(-n // frame)
    padded = np.zeros(n_frames * frame, dtype=np.float64)
    padded[:n] = pcm
    fr = padded.reshape(n_frames, frame)
    rms = np.sqrt((fr * fr).sum(axis=1) / frame)
    active = rms > thresh

    def _runs(mask: np.ndarray) -> tuple[int, int]:
        """(n_runs, longest_run_frames) of True runs."""
        if not mask.any():
            return 0, 0
        d = np.diff(mask.astype(np.int8))
        starts = np.flatnonzero(d == 1) + 1
        if mask[0]:
            starts = np.concatenate(([0], starts))
        ends = np.flatnonzero(d == -1) + 1
        if mask[-1]:
            ends = np.concatenate((ends, [mask.shape[0]]))
        return int(starts.shape[0]), int((ends - starts).max())

    n_seg, longest_sp = _runs(active)
    _, longest_si = _runs(~active)
    return {
        "n_speech_segments": n_seg,
        "speech_ratio": float(active.mean()),
        "longest_speech_ms": float(longest_sp * frame_ms),
        "longest_silence_ms": float(longest_si * frame_ms),
    }


def snr_stats(
    pcm: np.ndarray,
    sr_hz: int,
    frame_ms: int = FRAME_MS,
) -> dict[str, float | int | None]:
    """Decile frame-energy SNR estimate — the public NIST-STNR idea
    (speech level and noise floor read off the frame-energy distribution,
    no VAD labels needed): signal = mean of the top ``ceil(n/10)`` frame
    energies, noise floor = mean of the bottom decile, and
    ``snr_db = 10·log10(signal) − 10·log10(noise)``. The north star's own
    per-clip gauge (decoded-PCM SNR>=30dB) as a curation feature.

    The decile size is the INTEGER ``(n_frames + 9) // 10`` on both
    engines — pure integer arithmetic, immune to the rounding of a float
    ``ceil(n·0.1)`` by construction. Selecting the k smallest/largest
    energies is a multiset operation, so rank-tie order cannot change the
    means. A zero noise floor (digital silence)
    or an empty clip has no defined SNR → ``None``. Frame slicing and
    padding are bit-shared with :func:`segments`."""
    n = pcm.shape[0]
    none = {
        "signal_db": None,
        "noise_db": None,
        "snr_db": None,
        "n_frames": 0,
    }
    if n == 0:
        return none
    frame = max(1, int(sr_hz * frame_ms / 1000))
    n_frames = -(-n // frame)
    padded = np.zeros(n_frames * frame, dtype=np.float64)
    padded[:n] = pcm
    fr = padded.reshape(n_frames, frame)
    energy = np.sort((fr * fr).sum(axis=1) / frame)
    k = (n_frames + 9) // 10
    out: dict[str, float | int | None] = dict(none)
    out["n_frames"] = int(n_frames)
    signal_db = noise_db = None
    m = float(energy[-k:].mean())
    if m > 0.0:
        signal_db = 10.0 * float(np.log10(m))
    m = float(energy[:k].mean())
    if m > 0.0:
        noise_db = 10.0 * float(np.log10(m))
    out["signal_db"] = signal_db
    out["noise_db"] = noise_db
    if signal_db is not None and noise_db is not None:
        out["snr_db"] = signal_db - noise_db
    return out


def trim_bounds(
    pcm: np.ndarray,
    sr_hz: int,
    frame_ms: int = FRAME_MS,
    thresh: float = SPEECH_RMS_THRESH,
) -> dict[str, int | None]:
    """Leading/trailing-silence trim boundaries — the edit decision a
    curation pipeline applies before storing a clip: the first and the
    end of the last ACTIVE 20 ms frame (same ``rms > thresh`` flag as
    :func:`segments`), in milliseconds. Integer-exact end to end — frame
    indices and the 20 ms grid leave no float-rounding surface, so the
    oracle comparison is exact, not rounded. A clip with no active
    frames trims to nothing (NULL bounds, 0 kept ms)."""
    n = pcm.shape[0]
    if n == 0:
        return {"n_frames": 0, "trim_start_ms": None, "trim_end_ms": None, "kept_ms": 0}
    frame = max(1, int(sr_hz * frame_ms / 1000))
    n_frames = -(-n // frame)
    padded = np.zeros(n_frames * frame, dtype=np.float64)
    padded[:n] = pcm
    fr = padded.reshape(n_frames, frame)
    rms = np.sqrt((fr * fr).sum(axis=1) / frame)
    active = np.flatnonzero(rms > thresh)
    if active.shape[0] == 0:
        return {"n_frames": int(n_frames), "trim_start_ms": None,
                "trim_end_ms": None, "kept_ms": 0}
    start = int(active[0]) * frame_ms
    end = (int(active[-1]) + 1) * frame_ms
    return {"n_frames": int(n_frames), "trim_start_ms": start,
            "trim_end_ms": end, "kept_ms": end - start}


SPECTRAL_BANDS_HZ = (100.0, 300.0, 700.0, 1500.0)


SPECTRAL_FRAME_MS = 50  # 20 Hz-wide analysis bands


def band_ratios(
    pcm: np.ndarray,
    sr_hz: int,
    bands: tuple[float, ...] = SPECTRAL_BANDS_HZ,
    frame_ms: int = SPECTRAL_FRAME_MS,
) -> dict[str, float | None]:
    """Framed single-bin DFT band-energy ratios — the cheapest spectral
    feature a curation rule can consume (is the energy where speech
    lives, or is this hum/hiss?). A FULL-clip DFT bin is ~1/duration Hz
    wide (a 110 Hz tone is orthogonal to a 100 Hz probe over one second —
    it would measure only leakage), so the probe runs per 50 ms frame
    (20 Hz-wide bands): ``e_f = Σ_frames (Σ x·cos(2πf·k/sr))² + (sin)²``
    and the emitted ratio is ``e_f / Σ e``. Frame magnitudes are phase-
    invariant, so the GLOBAL sample index k keeps both engines trivially
    aligned. The DFT normalization cancels in the ratio and is skipped.

    Parity by construction: the angle is computed as ``((2π·f)·k)/sr``
    with that exact op order on both engines (identical doubles in →
    libm cos/sin differs at most ~1 ulp out, absorbed by the 6-decimal
    round the caller applies); the per-frame sums follow the module's
    accepted summation-order-behind-round(6) pattern, and the per-clip
    energy total is a sum of POSITIVE frame energies (no cancellation).
    An empty or all-zero clip has no spectrum → all-``None``."""
    out: dict[str, float | None] = {f"r{int(f)}": None for f in bands}
    energies = _band_energies(pcm, sr_hz, bands, frame_ms)
    if energies is None:
        return out
    tot = float(np.sum(energies))
    if tot <= 0.0:
        return out
    for f, e in zip(bands, energies):
        out[f"r{int(f)}"] = e / tot
    return out


def _band_energies(
    pcm: np.ndarray,
    sr_hz: int,
    bands: tuple[float, ...],
    frame_ms: int,
) -> list[float] | None:
    """Per-probe-band framed DFT energies (the shared core of
    :func:`band_ratios` and :func:`cepstral_features`); None for an
    empty clip. Bit-identical to the pre-refactor inline computation."""
    n = pcm.shape[0]
    if n == 0:
        return None
    frame = max(1, int(sr_hz * frame_ms / 1000))
    n_frames = -(-n // frame)
    padded = np.zeros(n_frames * frame, dtype=np.float64)
    padded[:n] = pcm
    kk = np.arange(n_frames * frame, dtype=np.float64)
    energies = []
    for f in bands:
        ang = (2.0 * np.pi * f) * kk / sr_hz
        sc = (padded * np.cos(ang)).reshape(n_frames, frame).sum(axis=1)
        ss = (padded * np.sin(ang)).reshape(n_frames, frame).sum(axis=1)
        energies.append(float((sc * sc + ss * ss).sum()))
    return energies


def cepstral_features(
    pcm: np.ndarray,
    sr_hz: int,
    bands: tuple[float, ...] = SPECTRAL_BANDS_HZ,
    frame_ms: int = SPECTRAL_FRAME_MS,
) -> dict[str, float | None]:
    """Cepstral-lite features over the probe-band log energies — the last
    link of the classic speech-feature chain (energy → spectral →
    CEPSTRAL → CMVN): a DCT-II over ``ln(e_f)`` giving ``c0..c2``, plus
    spectral flatness (geometric / arithmetic band-energy mean — 1.0 for
    hiss, →0 for a tone).

    Parity by construction: every float expression is written with an
    EXPLICIT operation tree mirrored verbatim in the SQL oracle — the
    DCT angle is ``((π·m)·(2f+1))/(2n)``, each coefficient accumulates
    terms in ascending band order (left-associated adds), and the
    flatness numerator/denominator reuse those exact sums — so given the
    band energies (positive no-cancellation sums, the module's accepted
    summation-order-behind-round(6) pattern) both engines agree within
    libm's 1-ulp cos/ln/exp, absorbed by the caller's 6-decimal round.
    Any non-positive band energy (digital silence) → all-``None``."""
    import math

    out: dict[str, float | None] = {"c0": None, "c1": None, "c2": None, "flatness": None}
    es = _band_energies(pcm, sr_hz, bands, frame_ms)
    if es is None or any(e <= 0.0 for e in es):
        return out
    n = len(es)
    logs = [math.log(e) for e in es]
    for m in range(3):
        c = 0.0
        for f in range(n):
            c += logs[f] * math.cos((math.pi * m * (2 * f + 1)) / (2 * n))
        out[f"c{m}"] = c
    lsum = 0.0
    for v in logs:
        lsum += v
    tot = 0.0
    for e in es:
        tot += e
    out["flatness"] = math.exp(lsum / n) / (tot / n)
    return out


PITCH_F_MIN_HZ = 60    # search band: male pitch floor ...
PITCH_F_MAX_HZ = 500   # ... to high-pitch speech ceiling
PITCH_FRAME_DIV = 25   # analysis frame = sr // 25 samples (40 ms)
PITCH_MIN_FRAME = 32   # shorter frames carry no usable periodicity
PITCH_VOICED_NUM = 3   # voiced iff 10·r(best) >= 3·r(0)  (ratio >= 0.3)


def pitch_stats(pcm: np.ndarray, sr_hz: int) -> dict[str, float | bool | None]:
    """Fundamental-frequency estimate via INTEGER autocorrelation — the
    classic voiced-speech pitch tracker, formulated so the SQL oracle
    cannot diverge: samples are re-quantized to the int16 grid
    (``floor(x·32767 + 0.5)``, exact round-trip for PCM16 and a single
    deterministic IEEE op for the μ-law codebook doubles), so every
    autocorrelation value ``r(lag) = Σ xi[k]·xi[k+lag]`` is an exact
    int64 (|r| <= (sr/25)·32767² < 2^41 — no overflow, no
    summation-order exposure). The argmax over lags [sr//500, sr//60]
    (60-500 Hz) breaks ties toward the smallest lag on both engines, and
    the voiced decision ``10·r_best >= 3·r(0)`` is an integer
    cross-multiplication, so no boundary can flip. Floats appear only in
    the REPORTED ``f0 = sr/lag`` and peak ratio (identical int inputs →
    identical doubles, rounded to 6 decimals by the caller).

    A clip too short to hold one frame plus the largest lag (or a
    digitally-silent frame, ``r(0) = 0``) is unvoiced with NULL
    estimates — same totality contract as the other feature ops."""
    xi = np.floor(pcm * 32767.0 + 0.5).astype(np.int64)
    lag_min = max(2, sr_hz // PITCH_F_MAX_HZ)
    lag_max = sr_hz // PITCH_F_MIN_HZ
    n = xi.shape[0]
    leff = min(sr_hz // PITCH_FRAME_DIV, n - lag_max)
    if leff < PITCH_MIN_FRAME:
        return {"f0_hz": None, "ac_peak_ratio": None, "voiced": False}
    frame = xi[:leff]
    r0 = int(np.dot(frame, frame))
    if r0 <= 0:
        return {"f0_hz": None, "ac_peak_ratio": None, "voiced": False}
    # one int64 matvec: row `lag` of the sliding-window view is
    # xi[lag : lag+leff]; numpy integer matmul is exact (no BLAS floats)
    sw = np.lib.stride_tricks.sliding_window_view(xi, leff)
    r = sw[lag_min : lag_max + 1] @ frame
    best_idx = int(np.argmax(r))  # first max = smallest lag on ties
    best_lag = lag_min + best_idx
    best_r = int(r[best_idx])
    voiced = 10 * best_r >= PITCH_VOICED_NUM * r0
    return {
        "f0_hz": sr_hz / best_lag if voiced else None,
        "ac_peak_ratio": best_r / r0,
        "voiced": bool(voiced),
    }


def level_stats(pcm: np.ndarray, sr_hz: int) -> dict[str, float | None]:
    """DC offset, RMS, peak, and crest factor — the level-domain health
    gauges a mastering/quality rule consumes (a DC-offset clip is a
    recording-chain fault; crest below ~4 dB means brickwalled audio).
    Exactness by construction: samples re-quantize to the int16 grid
    (same single deterministic IEEE op as :func:`pitch_stats`), so
    ``Σxi`` and ``Σxi²`` are exact int64 (≤4M samples · 32767² < 2⁶³ —
    no overflow, no summation-order exposure) and ``peak`` is an integer
    MAX. The only floats are the final REPORTED expressions, written
    with one fixed operation tree mirrored in the SQL oracle. An empty
    clip has no levels → all-``None``; digital silence has zero levels
    and an undefined crest."""
    import math

    n = pcm.shape[0]
    if n == 0:
        return {"dc_offset": None, "rms": None, "peak": None, "crest_db": None}
    xi = np.floor(pcm * 32767.0 + 0.5).astype(np.int64)
    s1 = int(xi.sum())
    s2 = int(np.dot(xi, xi))
    peak_q = int(np.abs(xi).max())
    out: dict[str, float | None] = {
        "dc_offset": (s1 / n) / 32767.0,
        "rms": math.sqrt(s2 / n) / 32767.0,
        "peak": peak_q / 32767.0,
        "crest_db": None,
    }
    if s2 > 0 and peak_q > 0:
        out["crest_db"] = 20.0 * math.log10(peak_q / math.sqrt(s2 / n))
    return out


def decode_features(blob: bytes, codec: str, sr_hz: int, dur_ms: int) -> dict[str, float]:
    """decode → features → drop PCM. One call per row inside an Arrow batch;
    PCM (up to ~100x the encoded bytes) never persists past the call.
    Metadata is coerced INSIDE the quarantine try so callers can pass raw
    (possibly NULL/NaN) table values — a malformed-metadata row marks
    itself, it doesn't fail the Spark task."""
    try:
        sr_hz = int(sr_hz)
        dur_ms = int(dur_ms)
        pcm = decode(bytes(blob), codec, sr_hz)
    except Exception:  # noqa: BLE001 - quarantine semantics: ANY malformed
        # payload (truncated chunk → struct.error, bad header → ValueError,
        # unknown codec → NotImplementedError, NULL metadata → ValueError)
        # must mark the row, never kill the task (≙ per-row retry→failure
        # path, SURVEY §2.8 T2)
        return {"rms_db": float("nan"), "silence_ratio": 1.0, "clip_ratio": 1.0, "dur_err_ms": 1e9}
    return features(pcm, sr_hz, dur_ms)


N_FP_SLICES = 64  # fingerprint resolution: one bit per time slice


def fingerprint(pcm: np.ndarray, n_slices: int = N_FP_SLICES) -> list[int]:
    """Energy-shape fingerprint: 64 bits packed as four 16-bit block keys.

    Bit ``s`` is set iff time-slice ``s``'s mean energy exceeds the CLIP's
    mean energy — a relative threshold, so the fingerprint is (near-)
    gain-invariant: re-encoded or volume-normalized copies of the same
    recording land at Hamming distance ~0 while unrelated clips sit at
    ~32/64 (measured on the seeded corpus; see tests/test_scoring_core.py).
    Slice of sample ``k`` is ``k * 64 // n`` — the same integer expression
    the SQL oracle uses, so slicing is bit-exact across engines; only the
    energy-mean comparison is float (the house frames-RMS precedent).

    The four 16-bit blocks double as LSH band keys: any pair at Hamming
    <= 3 shares at least one identical block (pigeonhole), so the banded
    self-join is candidate-complete at that threshold.
    """
    n = pcm.shape[0]
    if n == 0:
        return [0, 0, 0, 0]
    sl = (np.arange(n, dtype=np.int64) * n_slices) // n
    e = np.bincount(sl, weights=pcm * pcm, minlength=n_slices)
    c = np.bincount(sl, minlength=n_slices).astype(np.float64)
    tot = float((pcm * pcm).sum()) / n
    bits = [1 if (c[s] > 0 and e[s] / c[s] > tot) else 0 for s in range(n_slices)]
    return [
        sum(bits[16 * j + t] << t for t in range(16)) for j in range(n_slices // 16)
    ]


def resample_nn(pcm, sr_hz: int, target_hz: int):
    """Nearest-neighbor (zero-order-hold) resample — the audio 'resize'
    step training pipelines run to normalize heterogeneous sample rates
    before feature models. Pure INTEGER index arithmetic
    (``k = (j * sr) // target`` over ``m = (n * target) // sr`` output
    samples), so the selected-sample set is bit-identical between numpy
    and the SQL oracle (scoring/audio_sql.audio_resample_stats_sql).
    Production pipelines would use a polyphase filter (scipy/soxr — not
    in this container); the selection plumbing and batch shape are what
    this engine owns either way."""
    import numpy as np

    n = pcm.shape[0]
    m = (n * int(target_hz)) // int(sr_hz)
    if m <= 0:
        return pcm[:0]
    idx = (np.arange(m, dtype=np.int64) * int(sr_hz)) // int(target_hz)
    return pcm[idx]


def mix_noise_at_snr(
    pcm: np.ndarray, clip_id: str, target_snr_db: float = 20.0
) -> tuple[np.ndarray, dict[str, float | None]]:
    """Deterministic white-noise augmentation at a target SNR — the
    standard robustness-augmentation op of a speech training pipeline.
    The noise is a pure function of ``clip_id`` (blake2b-seeded
    RandomState), so augmentation is reproducible per clip under any
    partitioning/resume — the same property every other stage here has.
    Noise gain g solves 10·log10(Ps / (g²·Pn_unit)) = target; the mix is
    clipped to [-1, 1] and the ACHIEVED SNR is re-measured against the
    post-clip residual (clipping eats noise power on hot clips).
    Silent signals (Ps = 0) pass through unmixed with None stats —
    there is no signal to hold an SNR against."""
    import hashlib

    n = int(pcm.shape[0])
    sig_p = float(np.dot(pcm, pcm) / n) if n else 0.0
    if n == 0 or sig_p <= 0.0:
        return pcm.copy(), {
            "signal_rms_db": -120.0,
            "noise_gain": None,
            "achieved_snr_db": None,
            "post_mix_clip_ratio": 0.0,
        }
    seed = int.from_bytes(
        hashlib.blake2b(clip_id.encode("utf-8"), digest_size=4).digest(), "big"
    )
    noise = np.random.RandomState(seed).standard_normal(n)
    noise_p_unit = float(np.dot(noise, noise) / n)
    g = float(np.sqrt(sig_p / (10.0 ** (target_snr_db / 10.0)) / noise_p_unit))
    mixed = np.clip(pcm + g * noise, -1.0, 1.0)
    resid = mixed - pcm
    resid_p = float(np.dot(resid, resid) / n)
    return mixed, {
        "signal_rms_db": float(20.0 * np.log10(max(np.sqrt(sig_p), 1e-6))),
        "noise_gain": g,
        "achieved_snr_db": float(10.0 * np.log10(sig_p / max(resid_p, 1e-300))),
        "post_mix_clip_ratio": float(np.count_nonzero(np.abs(mixed) > CLIP_AMPLITUDE) / n),
    }
