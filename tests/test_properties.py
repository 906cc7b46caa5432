"""Property-based robustness (hypothesis) — beyond the reference's test
strategy (SURVEY §5 notes it has no randomized testing).

Invariants that make the two-cluster-size F1 gate safe:
- scoring functions are total (never raise) and deterministic for ANY
  string/bytes input, not just the synthetic corpus;
- batch scoring equals row-at-a-time scoring (no batch-context leakage);
- the scrub chain is stable and order-fixed.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from curator_spark.scoring import audio, langid, lm, scrub

TEXT = st.text(max_size=400)


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_langid_total_and_deterministic(t):
    lang1, conf1 = langid.score_text(t)
    lang2, conf2 = langid.score_text(t)
    assert lang1 == lang2 and conf1 == conf2
    assert 0.0 <= conf1 <= 1.0


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_ppl_total_and_deterministic(t):
    lang, _ = langid.score_text(t)
    p1 = lm.ppl(t, lang)
    p2 = lm.ppl(t, lang)
    assert p1 == p2
    assert p1 > 0.0 and np.isfinite(p1)


@settings(max_examples=50, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=20))
def test_batch_equals_rowwise(texts):
    """No batch-context dependence: the partitioning-invariance property."""
    langs_b, confs_b = langid.score_batch(texts)
    ppls_b = lm.ppl_batch(texts, langs_b)
    for i, t in enumerate(texts):
        lang_s, conf_s = langid.score_text(t)
        assert langs_b[i] == lang_s
        assert confs_b[i] == conf_s
        assert ppls_b[i] == lm.ppl(t, lang_s)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=600), st.sampled_from(["pcm_s16le", "ulaw", "mp3", ""]))
def test_decode_never_raises(blob, codec):
    """Arbitrary bytes under any codec tag must quarantine, never throw
    (the per-row failure path of SURVEY §2.8 T2)."""
    f = audio.decode_features(blob, codec, 16000, 1000)
    assert set(f) == {"rms_db", "silence_ratio", "clip_ratio", "dur_err_ms"}


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_scrub_total_and_deterministic(t):
    s1, h1 = scrub.scrub(t)
    s2, h2 = scrub.scrub(t)
    assert s1 == s2 and h1 == h2
    assert all(v >= 0 for v in h1.values())


def _minhash_naive(text: str, k: int = 5) -> np.ndarray:
    """The definitional per-row md5 MinHash (mirrors the DuckDB oracle)."""
    import hashlib

    from curator_spark.ops.dedup import M32, MINHASH_COEFFS

    t = text if isinstance(text, str) else ""
    n = max(len(t) - (k - 1), 1)
    xs = np.array(
        [
            int.from_bytes(hashlib.md5(t[i : i + k].encode("utf-8")).digest()[:4], "big")
            for i in range(n)
        ],
        dtype=np.int64,
    )
    a = np.array([a for a, _ in MINHASH_COEFFS], dtype=np.int64)[:, None]
    b = np.array([b for _, b in MINHASH_COEFFS], dtype=np.int64)[:, None]
    return ((a * xs[None, :] + b) % M32).min(axis=1)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(max_size=60), min_size=1, max_size=12))
def test_minhash_fast_batch_equals_naive(texts):
    """The vectorized unique-shingle byte-window path must be bit-equal to
    the definitional per-row md5 loop for ANY input: unicode (non-ASCII
    fallback), empty strings, and strings shorter than the shingle width."""
    from curator_spark.ops.dedup import _minhash_batch

    got = _minhash_batch(texts)
    for i, t in enumerate(texts):
        assert np.array_equal(got[i], _minhash_naive(t)), repr(t)


@settings(max_examples=100, deadline=None)
@given(TEXT)
def test_bpe_total_deterministic_and_lossless(t):
    """The trained BPE is total over arbitrary strings, deterministic,
    bounded (len(words) <= tokens <= chars+words), and lossless (token
    concat reproduces word + end marker)."""
    from curator_spark.scoring import bpe

    n1 = bpe.count_batch([t])[0]
    n2 = bpe.count_batch([t])[0]
    assert n1 == n2 >= 0
    words = [w for w in t.split(" ") if w]
    assert len(words) <= n1 <= sum(len(w) + 1 for w in words)
    for w in words[:5]:
        assert "".join(bpe.encode_word(w)) == w + bpe.END


def _minhash_naive_mix64(text: str, k: int = 5) -> np.ndarray:
    """The definitional per-window mix64 MinHash: pure-Python big-int
    arithmetic (no numpy wrapping) mirroring the DuckDB oracle's explicit
    mod-2^64 expressions."""
    from curator_spark.ops.dedup import (
        MINHASH_COEFFS64, MIX_C1, MIX_C2, MIX_SHIFT, _pack_window_py,
    )

    t = text if isinstance(text, str) else ""
    n = max(len(t) - (k - 1), 1)
    m64 = 1 << 64
    out = []
    for a, b in MINHASH_COEFFS64:
        best = None
        for i in range(n):
            z = _pack_window_py(t[i : i + k])
            z = ((MIX_C1 * z) % m64) >> MIX_SHIFT
            z = ((MIX_C2 * z) % m64) >> MIX_SHIFT
            h = ((a * z + b) % m64) >> 32
            best = h if best is None else min(best, h)
        out.append(best)
    return np.array(out, dtype=np.int64)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(max_size=60), min_size=1, max_size=12))
def test_minhash_mix64_batch_equals_naive(texts):
    """The wrapped-uint64 vectorized mix64 path must be bit-equal to a
    pure-Python big-int evaluation of the same family for ANY input,
    including non-ASCII (md5-fallback keys), empty, and short strings."""
    from curator_spark.ops.dedup import _minhash_batch

    got = _minhash_batch(texts, family="mix64")
    for i, t in enumerate(texts):
        assert np.array_equal(got[i], _minhash_naive_mix64(t)), repr(t)


def _simhash_naive(text: str) -> int:
    """Definitional per-token SimHash with the md5-derived 64-bit hash."""
    import hashlib

    votes = np.zeros(64, dtype=np.int64)
    for tok in (text or "").split(" "):
        if not tok:
            continue
        h = int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "big")
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    fp = 0
    for b in range(64):
        if votes[b] > 0:
            fp |= 1 << b
    return int(np.uint64(fp).astype(np.int64))


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(max_size=60), min_size=1, max_size=10))
def test_simhash_vectorized_equals_naive(texts):
    """The chunked scatter-add majority vote must match the definitional
    per-token loop (ties at votes == 0 -> bit 0, empty docs -> fp 0)."""
    from curator_spark.ops.dedup import _simhash_batch

    got = _simhash_batch(texts)
    for i, t in enumerate(texts):
        assert int(got[i]) == _simhash_naive(t), repr(t)


@settings(max_examples=150, deadline=None)
@given(
    st.binary(max_size=400),
    st.sampled_from(["ppm", "rgb8_raw", "png", ""]),
    st.integers(min_value=-2, max_value=40),
    st.integers(min_value=-2, max_value=40),
)
def test_image_decode_total_under_quarantine(blob, fmt, w, h):
    """Arbitrary bytes/dims under any format tag must either decode or
    raise one of the quarantined types — never anything else, and never
    return a malformed array (the image stage's quarantine contract)."""
    from curator_spark.scoring import image as img

    try:
        px = img.decode(blob, fmt, w, h)
    except (ValueError, NotImplementedError, TypeError):
        return
    assert px.shape == (h, w, 3)
    f = img.features(px)
    assert set(f) == {"mean_lum", "contrast", "entropy", "edge_strength", "aspect"}
    assert all(np.isfinite(v) for v in f.values())


PCM = st.lists(
    st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=64),
    min_size=0,
    max_size=4000,
)


@settings(max_examples=60, deadline=None)
@given(PCM, st.sampled_from([8000, 16000, 44100]))
def test_snr_and_band_ratios_total_and_gain_stable(xs, sr):
    """The round-4 audio features are total over arbitrary PCM, and the
    physics invariants hold: band ratios are exactly gain-invariant
    (every probe energy scales by g²), SNR is gain-invariant up to float
    noise (a dB DIFFERENCE), and both are deterministic."""
    pcm = np.asarray(xs, dtype=np.float64)
    s1, s2 = audio.snr_stats(pcm, sr), audio.snr_stats(pcm, sr)
    assert s1 == s2
    b1 = audio.band_ratios(pcm, sr)
    t1 = audio.trim_bounds(pcm, sr)
    assert audio.trim_bounds(pcm, sr) == t1
    if b1["r100"] is not None:
        assert abs(sum(v for v in b1.values()) - 1.0) < 1e-9
        b_half = audio.band_ratios(0.5 * pcm, sr)  # 0.5 is exact in binary
        for k in b1:
            assert abs(b1[k] - b_half[k]) < 1e-9, k
    if s1["snr_db"] is not None:
        s_half = audio.snr_stats(0.5 * pcm, sr)
        assert s_half["snr_db"] is not None
        assert abs(s1["snr_db"] - s_half["snr_db"]) < 1e-6


@settings(max_examples=60, deadline=None)
@given(PCM, st.sampled_from([8000, 16000]))
def test_trim_bounds_invariants(xs, sr):
    """Trim bounds are on the 20 ms grid, ordered, within the clip, and
    kept_ms is exactly their difference (or 0 with NULL bounds)."""
    pcm = np.asarray(xs, dtype=np.float64)
    t = audio.trim_bounds(pcm, sr)
    if t["trim_start_ms"] is None:
        assert t["trim_end_ms"] is None and t["kept_ms"] == 0
    else:
        assert t["trim_start_ms"] % 20 == 0 and t["trim_end_ms"] % 20 == 0
        assert 0 <= t["trim_start_ms"] < t["trim_end_ms"] <= t["n_frames"] * 20
        assert t["kept_ms"] == t["trim_end_ms"] - t["trim_start_ms"]


@settings(max_examples=60, deadline=None)
@given(PCM, st.sampled_from([8000, 16000, 44100]))
def test_pitch_stats_invariants(xs, sr):
    """pitch_stats is total and deterministic over arbitrary PCM; a voiced
    estimate always lies inside the 60-500 Hz search band with a
    positive peak ratio >= the 0.3 decision threshold; unvoiced rows
    carry a NULL f0; too-short clips are never voiced."""
    pcm = np.asarray(xs, dtype=np.float64)
    p1 = audio.pitch_stats(pcm, sr)
    assert audio.pitch_stats(pcm, sr) == p1
    if p1["voiced"]:
        assert p1["f0_hz"] is not None
        # lag in [max(2, sr//500), sr//60] -> f0 in (60, sr/2]
        assert sr / (sr // 60) <= p1["f0_hz"] <= sr / max(2, sr // 500)
        assert p1["ac_peak_ratio"] >= 0.3
    else:
        assert p1["f0_hz"] is None
    if len(xs) - sr // 60 < min(sr // 25, 32):
        assert p1["voiced"] is False


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.floats(min_value=-1.0, max_value=1.0, allow_nan=False), max_size=400),
    st.text(min_size=1, max_size=20),
    st.floats(min_value=0.0, max_value=40.0, allow_nan=False),
)
def test_mix_noise_total_and_deterministic(samples, clip_id, target):
    """Augmentation invariants for ANY signal: total (never raises),
    deterministic per clip_id, output stays in [-1, 1], and achieved SNR
    is never below target (clipping only ever removes noise power)."""
    pcm = np.asarray(samples, dtype=np.float64)
    m1, s1 = audio.mix_noise_at_snr(pcm, clip_id, target)
    m2, s2 = audio.mix_noise_at_snr(pcm, clip_id, target)
    assert np.array_equal(m1, m2) and s1 == s2
    assert m1.shape == pcm.shape
    if m1.size:
        assert float(np.abs(m1).max()) <= 1.0
    if s1["achieved_snr_db"] is not None:
        assert s1["achieved_snr_db"] >= target - 1e-9
        assert np.isfinite(s1["achieved_snr_db"])
    else:  # silent or empty input passes through unmixed
        assert np.array_equal(m1, pcm)
