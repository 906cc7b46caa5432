"""Unit tests for the pure scoring core (no Spark).

Mirrors the reference's unit layer (SURVEY.md §5): pure-function tests for
formatting/coercion/fingerprint stability — here: codec roundtrips, model
determinism, rule edges, scrub goldens.
"""

from __future__ import annotations

import numpy as np
import pytest

from curator_spark.config import PipelineConfig, RuleThresholds
from curator_spark.scoring import audio, langid, lm, rules, scrub
from curator_spark.synth import audiogen, clips, textgen


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    err = float(np.sum((ref - test) ** 2))
    if err == 0.0:
        return float("inf")
    return 10.0 * np.log10(float(np.sum(ref**2)) / err)


def test_wav_roundtrip_exact():
    pcm = audiogen.gen_waveform(7, 16000, 500)
    blob = audiogen.pcm16_to_wav(pcm, 16000)
    dec, sr = audiogen.wav_to_pcm(blob)
    assert sr == 16000
    assert dec.shape == pcm.shape
    # PCM16 quantization: ~96 dB SNR, far above the 30 dB gate
    assert snr_db(pcm, dec) >= 30.0


def test_ulaw_roundtrip_snr():
    pcm = audiogen.gen_waveform(11, 8000, 400)
    dec = audiogen.mulaw_decode(audiogen.mulaw_encode(pcm))
    assert dec.shape == pcm.shape
    assert snr_db(pcm, dec) >= 30.0  # mu-law: ~38 dB on speech-like signals


def test_decode_dispatch_and_stub():
    blob, sr, dur, codec = audiogen.encode_clip(3)
    pcm = audio.decode(blob, codec, sr)
    assert pcm.dtype == np.float64 and pcm.shape[0] > 0
    with pytest.raises(NotImplementedError):
        audio.decode(b"xxxx", "opus", 16000)  # external-codec stub


def test_clip_row_deterministic():
    a, b = clips.clip_row(42), clips.clip_row(42)
    assert a == b
    assert a["clip_id"] == "clip_000000000042"
    assert clips.clip_row(43)["bytes"] != a["bytes"]


def test_langid_accuracy_and_determinism():
    n = 400
    preds, trues = [], []
    for i in range(n):
        t, lang, _ = textgen.gen_transcript(i)
        p, c = langid.score_text(t)
        p2, c2 = langid.score_text(t)
        assert (p, c) == (p2, c2)
        preds.append(p)
        trues.append(lang)
    acc = np.mean([p == t for p, t in zip(preds, trues)])
    assert acc >= 0.98


def test_ppl_separates_noise():
    clean = " ".join(textgen.gen_sentence("avelian", textgen.clip_rng(1, "t"), 20))
    noise = "zzqx9 !!@# 8741-kk zzqx9 wqpmf"
    assert lm.ppl(clean, "avelian") < lm.ppl(noise, "avelian")


def test_scrub_goldens():
    s, hits = scrub.scrub("ka mi ada.lovelace7@example.com to 555-123-4567 frak 123-45-6789")
    assert s == "ka mi <EMAIL> to <PHONE> <TOX> <SSN>"
    assert hits == {"email": 1, "ssn": 1, "phone": 1, "tox": 1}


def test_scrub_order_ssn_before_phone():
    # 3-2-4 must scrub as SSN, 3-3-4 as PHONE — no cross-matching
    s, hits = scrub.scrub("a 111-22-3333 b 111-222-3333 c")
    assert s == "a <SSN> b <PHONE> c"


def test_rule_edges():
    t = RuleThresholds()
    aud_ok = {"rms_db": -10.0, "silence_ratio": 0.1, "clip_ratio": 0.0}
    feats = rules.text_features("ka " * 20, "avelian")
    keep, reasons = rules.evaluate(feats, 0.99, 100.0, 0, 1000, aud_ok, t)
    assert reasons == ["rep_ratio", "stopword_density"]  # 1 distinct word / 20
    # len_max + dur_max fire on synthetic extremes
    long_text = " ".join(f"w{i}" for i in range(3000))
    feats2 = rules.text_features(long_text, "avelian")
    keep2, reasons2 = rules.evaluate(feats2, 0.99, 100.0, 0, 99999, aud_ok, t)
    assert "len_max" in reasons2 and "dur_max" in reasons2
    # tox budget
    feats3 = rules.text_features("ka mi to ra ne su el an ori ume ta ki mo re nu", "avelian")
    _, reasons3 = rules.evaluate(feats3, 0.99, 100.0, 3, 1000, aud_ok, t)
    assert "tox_max" in reasons3


def test_fingerprint_stability():
    cfg = PipelineConfig()
    f1 = cfg.fingerprint("snap-a")
    assert f1 == PipelineConfig().fingerprint("snap-a")  # config-identical ⇒ same
    assert f1 != cfg.fingerprint("snap-b")  # input changed ⇒ different
    cfg2 = PipelineConfig(rules=RuleThresholds(len_min=21))
    assert f1 != cfg2.fingerprint("snap-a")  # config changed ⇒ different


def test_sql_model_oracle_parity_in_vocab():
    """The inlined-weights DuckDB oracle (scoring/sql_model.py) must match
    the Python scorers bit-exactly at the gate's rounding precision — on
    IN-VOCAB text (training-corpus sentences), i.e. the nondegenerate
    bigram-hit path the driver's documents table cannot reach (its
    vocabulary is disjoint from the synthetic languages)."""
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    from curator_spark.scoring import sql_model

    sents = []
    for lang in textgen.LANGS:
        sents.extend(list(textgen.training_corpus(lang))[:8])
    sents.append("")  # empty-text edge: prior argmax, conf 0.0, ppl exp(-oov)
    df = pd.DataFrame({"doc_id": range(len(sents)), "text": sents})

    con = duckdb.connect()
    con.register("documents", df)
    got_lang = con.execute(sql_model.langid_docs_sql()).df().sort_values("doc_id")
    got_ppl = (
        con.execute(sql_model.doc_perplexity_sql(sents)).df().sort_values("doc_id")
    )

    langs, confs = langid.score_batch(sents)
    ppls = lm.ppl_batch(sents, langs)
    assert got_lang["pred_lang"].tolist() == langs
    assert got_lang["lang_conf"].tolist() == [round(c, 6) for c in confs.tolist()]
    assert got_ppl["pred_lang"].tolist() == langs
    assert got_ppl["ppl"].tolist() == [round(p, 4) for p in ppls.tolist()]
    # clean training sentences must classify as their own language
    for li, lang in enumerate(textgen.LANGS):
        assert set(langs[li * 8 : li * 8 + 8]) == {lang}


def test_sql_model_collision_guard():
    """_string_keyed_lms asserts table-size parity with the hash-keyed model
    (an FNV collision would silently merge counts and diverge the oracle)."""
    from curator_spark.scoring import sql_model

    lms = sql_model._string_keyed_lms()
    ref = lm.model()
    for lang in textgen.LANGS:
        uni_logp, bi_logp, oov, backoff = lms[lang]
        assert len(uni_logp) == len(ref[lang].uni_logp)
        assert len(bi_logp) == len(ref[lang].bi_count)
        assert oov == ref[lang].oov_logp


def _audio_sql_vs_python(tmp_path, pdf):
    """Run both audio SQL oracles over a parquet fixture and the numpy path
    over the same rows; return (sql_feat, py_feat, sql_seg, py_seg)."""
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from curator_spark.scoring import audio_sql

    path = str(tmp_path / "clips.parquet")
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
    con = duckdb.connect()
    feat = con.execute(audio_sql.audio_decode_features_sql(path)).df()
    seg = con.execute(audio_sql.audio_segments_sql(path)).df()

    frows, srows = [], []
    for r in pdf.itertuples():
        f = audio.decode_features(r.bytes, r.codec, r.sr_hz, r.dur_ms)
        ok = not np.isnan(f["rms_db"])
        frows.append({"clip_id": r.clip_id, "decode_ok": ok, **f})
        try:
            s = audio.segments(audio.decode(r.bytes, r.codec, r.sr_hz), r.sr_hz)
            srows.append({"clip_id": r.clip_id, "decode_ok": True, **s})
        except Exception:  # noqa: BLE001 - mirror of the stage quarantine
            srows.append({"clip_id": r.clip_id, "decode_ok": False})
    order = lambda df: df.sort_values("clip_id").reset_index(drop=True)  # noqa: E731
    return order(feat), order(pd.DataFrame(frows)), order(seg), order(pd.DataFrame(srows))


def test_audio_sql_oracle_parity(tmp_path):
    """The SQL audio decoder (scoring/audio_sql.py) must match the numpy
    path on clean PCM16 + μ-law clips — features to <1e-6 (the rounding
    grain) and VAD run-length stats exactly."""
    from curator_spark.synth import clips

    pdf = clips.clips_pandas(24)
    feat, pyf, seg, pys = _audio_sql_vs_python(tmp_path, pdf)
    assert feat["decode_ok"].all() and bool(pyf["decode_ok"].all())
    for c in ["rms_db", "silence_ratio", "clip_ratio"]:
        assert np.abs(feat[c].values - pyf[c].values).max() < 1e-6
    for c in ["n_speech_segments", "speech_ratio", "longest_speech_ms", "longest_silence_ms"]:
        assert np.abs(seg[c].values.astype(float) - pys[c].values.astype(float)).max() == 0.0


def test_audio_sql_oracle_quarantine_parity(tmp_path):
    """Malformed payloads must quarantine IDENTICALLY in SQL and Python:
    bad magic, unsupported codec, stereo layout, header/meta sr mismatch,
    odd-byte truncation (frombuffer int16 failure)."""
    import pandas as pd

    from curator_spark.synth import audiogen, clips

    base = clips.clips_pandas(2)
    good = base.iloc[0]
    wav = bytes(good["bytes"])
    stereo = bytearray(wav)
    stereo[22] = 2  # channels field
    rows = [
        dict(good),
        {**dict(good), "clip_id": "bad_magic", "bytes": b"JUNK" + wav[4:]},
        {**dict(good), "clip_id": "bad_codec", "codec": "mp3"},
        {**dict(good), "clip_id": "stereo", "bytes": bytes(stereo)},
        {**dict(good), "clip_id": "sr_lie", "sr_hz": good["sr_hz"] * 2},
        {**dict(good), "clip_id": "odd_trunc", "bytes": wav[:-1]},
        {**dict(base.iloc[1]), "clip_id": "ulaw_ok",
         "bytes": audiogen.mulaw_encode(audiogen.gen_waveform(1, 8000, 100)),
         "codec": "ulaw", "sr_hz": 8000, "dur_ms": 100},
    ]
    pdf = pd.DataFrame(rows)[list(base.columns)]
    feat, pyf, seg, pys = _audio_sql_vs_python(tmp_path, pdf)
    assert feat["decode_ok"].tolist() == pyf["decode_ok"].tolist()
    assert seg["decode_ok"].tolist() == pys["decode_ok"].tolist()
    assert feat.set_index("clip_id")["decode_ok"].to_dict() == {
        "bad_codec": False, "bad_magic": False, "odd_trunc": False,
        "sr_lie": False, "stereo": False, "ulaw_ok": True,
        good["clip_id"]: True,
    }


def test_pipeline_sql_per_clip_label_parity():
    """The composed full-DAG SQL oracle (pipeline_sql) must agree with the
    pure-Python oracle on EVERY clip's (lang, keep) — the fine-grained
    guarantee behind the clip_keep_summary rollup gate row (a compensating
    flip inside a (lang, keep) group would be invisible to the rollup)."""
    duckdb = pytest.importorskip("duckdb")

    from curator_spark import oracle
    from curator_spark.scoring import pipeline_sql

    path = pipeline_sql.ensure_pipe_fixture()
    con = duckdb.connect()  # must outlive the lazy relation below
    got = con.sql(pipeline_sql.clip_keep_labels_sql(path)).df()
    gold = (
        oracle.golden_labels(pipeline_sql.N_FIXTURE_PIPE_CLIPS)
        .sort_values("clip_id")
        .reset_index(drop=True)
    )
    assert got["clip_id"].tolist() == gold["clip_id"].tolist()
    assert got["lang"].tolist() == gold["lang"].tolist()
    assert got["keep"].tolist() == gold["keep"].tolist()


def test_loudness_plan_invariants():
    """gain_db must be exactly what moves rms to the target (up to the
    1e-6 dB quantization); amplification toward a LOUDER target increases
    the predicted post-gain clip fraction; attenuation never clips."""
    import numpy as np

    from curator_spark.scoring import audio as audio_scoring
    from curator_spark.synth import clips as clips_mod

    for i in range(20):
        r = clips_mod.clip_row(i)
        pcm = audio_scoring.decode(r["bytes"], r["codec"], r["sr_hz"])
        out = audio_scoring.loudness(pcm)
        assert abs((out["rms_db"] + out["gain_db"]) - (-20.0)) < 1e-5
        louder = audio_scoring.loudness(pcm, target_db=0.0)
        assert louder["post_gain_clip_ratio"] >= out["post_gain_clip_ratio"]
        quiet = audio_scoring.loudness(pcm, target_db=-60.0)
        assert quiet["post_gain_clip_ratio"] == 0.0
        # applying the plan's gain really lands the RMS on target
        g = 10.0 ** (out["gain_db"] / 20.0)
        scaled = pcm * g
        got_db = 20.0 * np.log10(np.sqrt(np.dot(scaled, scaled) / len(scaled)))
        assert abs(got_db - (-20.0)) < 1e-5


def test_zcr_tracks_tone_frequency():
    """For a pure sine at frequency f, zcr·sr/2 must estimate f within a
    few percent; totality on degenerate inputs (empty, single sample,
    constant) must hold."""
    import numpy as np

    from curator_spark.scoring import audio as audio_scoring

    sr = 16000
    for f in (220.0, 440.0, 1000.0):
        t = np.arange(sr) / sr
        out = audio_scoring.zcr_stats(np.sin(2 * np.pi * f * t), sr)
        assert abs(out["est_freq_hz"] - f) / f < 0.02
        assert abs(out["peak"] - 1.0) < 1e-6
    assert audio_scoring.zcr_stats(np.array([]), sr) == {
        "zcr": 0.0, "est_freq_hz": 0.0, "peak": 0.0}
    assert audio_scoring.zcr_stats(np.array([0.5]), sr)["peak"] == 0.5
    assert audio_scoring.zcr_stats(np.full(100, 0.3), sr)["zcr"] == 0.0


def test_pitch_tracks_tone_frequency():
    """For a pure sine whose period divides the sample grid, the
    autocorrelation pitch must land within the estimator's inherent
    ±1-lag slip (unnormalized r(lag) can edge past r(0) when the lagged
    window holds a fraction more energy — ~0.5% at 80 Hz) and the clip
    must be voiced. Fractional-period tones legitimately snap to an
    integer-aligned lag MULTIPLE (the classic octave error), so only
    integer-period tones are asserted. Degenerate inputs (too short,
    silent) are unvoiced with NULL estimates."""
    sr = 16000
    t = np.arange(sr) / sr
    for f in (80.0, 125.0, 200.0, 320.0):  # periods: 200/128/80/50 samples
        out = audio.pitch_stats(np.sin(2 * np.pi * f * t), sr)
        assert out["voiced"] is True
        assert abs(out["f0_hz"] - f) / f < 0.02
        assert out["ac_peak_ratio"] > 0.8
    # white noise: autocorrelation peak collapses -> unvoiced
    rng = np.random.default_rng(0)
    noise = audio.pitch_stats(np.clip(rng.standard_normal(sr) * 0.3, -1, 1), sr)
    assert noise["voiced"] is False
    # silence: r0 = 0
    silent = audio.pitch_stats(np.zeros(sr), sr)
    assert silent == {"f0_hz": None, "ac_peak_ratio": None, "voiced": False}
    # too short to hold frame + max lag
    short = audio.pitch_stats(np.sin(2 * np.pi * 100.0 * t[:200]), sr)
    assert short == {"f0_hz": None, "ac_peak_ratio": None, "voiced": False}


def test_pitch_int16_requantize_roundtrip():
    """The int16 re-quantization inside pitch_stats must recover the raw
    int sample exactly after a WAV decode round-trip (the property the
    SQL oracle's exactness argument rests on)."""
    pcm = audiogen.gen_waveform(11, 8000, 400)
    blob = audiogen.pcm16_to_wav(pcm, 8000)
    dec, _sr = audiogen.wav_to_pcm(blob)
    raw = np.frombuffer(blob[44:], dtype="<i2").astype(np.int64)
    xi = np.floor(dec * 32767.0 + 0.5).astype(np.int64)
    assert np.array_equal(xi, raw)


def test_audio_fingerprint_gain_invariance():
    """The energy-shape fingerprint is the near-dup key: volume-scaled
    copies must land at Hamming ~0 while unrelated clips stay far — and
    a planted re-encode pair must be bit-identical after the full
    decode→scale→clip→re-encode round trip."""
    import numpy as np

    from curator_spark.scoring import audio as audio_scoring
    from curator_spark.synth import clips as clips_mod

    def hd(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    fps = []
    for i in range(30):
        r = clips_mod.clip_row(i)
        pcm = audio_scoring.decode(r["bytes"], r["codec"], r["sr_hz"])
        f = audio_scoring.fingerprint(pcm)
        assert all(0 <= b <= 0xFFFF for b in f)
        # in-memory gain scale: exact relative threshold → distance 0
        assert hd(f, audio_scoring.fingerprint(np.clip(pcm * 0.9, -1, 1))) == 0
        # full re-encode round trip (int16/mu-law quantization wiggles a
        # few boundary slices): must stay within the op's Hamming-3 gate
        d = clips_mod.near_dup_row(i)
        pcm_d = audio_scoring.decode(d["bytes"], d["codec"], d["sr_hz"])
        assert hd(f, audio_scoring.fingerprint(pcm_d)) <= 3
        fps.append(f)
    dists = [hd(fps[i], fps[j]) for i in range(30) for j in range(i + 1, 30)]
    # unrelated clips: median far out; the verify stage handles the tail
    assert sorted(dists)[len(dists) // 2] >= 16


def test_resample_nn_invariants():
    """Identity at equal rates; exact integer index selection both ways;
    empty input stays empty."""
    import numpy as np

    from curator_spark.scoring import audio

    x = np.linspace(-1, 1, 1000)
    assert np.array_equal(audio.resample_nn(x, 16000, 16000), x)
    down = audio.resample_nn(x, 16000, 8000)
    assert down.shape[0] == 500 and np.array_equal(down, x[::2])
    up = audio.resample_nn(x, 8000, 16000)
    assert up.shape[0] == 2000 and np.array_equal(up, np.repeat(x, 2))
    assert audio.resample_nn(x[:0], 16000, 8000).shape[0] == 0


def test_snr_stats_separates_clean_from_noisy():
    """A tone with quiet gaps must score a much higher decile SNR than the
    same tone drowned in broadband noise; totality on degenerate inputs
    (empty, constant, all-zero) must hold and NULL where log10 has no
    argument."""
    import numpy as np

    from curator_spark.scoring import audio as audio_scoring

    sr = 16000
    t = np.arange(sr) / sr
    tone = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    gated = tone * (np.sin(2 * np.pi * 2.0 * t) > 0)  # half tone, half silence
    rng = np.random.default_rng(7)
    floor = 0.001 * rng.standard_normal(sr)
    clean = audio_scoring.snr_stats(gated + floor, sr)
    noisy = audio_scoring.snr_stats(tone + 0.3 * rng.standard_normal(sr), sr)
    assert clean["snr_db"] is not None and noisy["snr_db"] is not None
    assert clean["snr_db"] > 30.0  # quiet floor vs tone: wide gap
    assert noisy["snr_db"] < 10.0  # noise dominates every frame
    assert clean["n_frames"] == noisy["n_frames"] == 50

    empty = audio_scoring.snr_stats(np.array([]), sr)
    assert empty == {"signal_db": None, "noise_db": None, "snr_db": None, "n_frames": 0}
    silent = audio_scoring.snr_stats(np.zeros(sr), sr)
    assert silent["snr_db"] is None and silent["n_frames"] == 50
    const = audio_scoring.snr_stats(np.full(sr, 0.25), sr)
    assert abs(const["snr_db"]) < 1e-9  # flat energy: top == bottom decile


def test_snr_decile_is_integer_exact():
    """The decile size must be (n+9)//10 == ceil(n/10) for every frame
    count — pure integer arithmetic, so the Spark and DuckDB sides cannot
    disagree the way a float ``ceil(n*0.1)`` could after rounding."""
    import math

    for n in range(1, 2000):
        assert (n + 9) // 10 == math.ceil(n / 10)


def test_band_ratios_track_tone_frequency():
    """A pure tone near a probe frequency must dominate that band's ratio;
    ratios sum to ~1; degenerate inputs (empty, all-zero) are all-None."""
    import numpy as np

    from curator_spark.scoring import audio as audio_scoring

    sr = 16000
    t = np.arange(sr) / sr
    for f, key in ((105.0, "r100"), (310.0, "r300"), (695.0, "r700"), (1492.0, "r1500")):
        out = audio_scoring.band_ratios(0.5 * np.sin(2 * np.pi * f * t), sr)
        assert max(out, key=lambda k: out[k]) == key, (f, out)
        assert abs(sum(out.values()) - 1.0) < 1e-9
    assert set(audio_scoring.band_ratios(np.array([]), sr).values()) == {None}
    assert set(audio_scoring.band_ratios(np.zeros(1000), sr).values()) == {None}


def test_trim_bounds_finds_silence_edges():
    """Leading/trailing silence must trim to the active span on the 20 ms
    grid; all-silent and empty clips trim to nothing."""
    import numpy as np

    from curator_spark.scoring import audio as audio_scoring

    sr = 16000
    frame = sr * 20 // 1000  # 320 samples
    sig = np.zeros(100 * frame)
    t = np.arange(40 * frame) / sr
    sig[30 * frame : 70 * frame] = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    out = audio_scoring.trim_bounds(sig, sr)
    assert out == {"n_frames": 100, "trim_start_ms": 600,
                   "trim_end_ms": 1400, "kept_ms": 800}
    assert audio_scoring.trim_bounds(np.zeros(10 * frame), sr) == {
        "n_frames": 10, "trim_start_ms": None, "trim_end_ms": None, "kept_ms": 0}
    assert audio_scoring.trim_bounds(np.array([]), sr) == {
        "n_frames": 0, "trim_start_ms": None, "trim_end_ms": None, "kept_ms": 0}


def test_image_ahash_brightness_invariance():
    """The integer aHash is the image near-dup key: brightness-shifted
    other-format re-encodes must land at Hamming <= 1 while unrelated
    images sit far; bits are pure-integer so re-decoding is bit-stable."""
    from curator_spark.scoring import image as image_scoring
    from curator_spark.synth import imagegen

    def hd(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    fps = []
    for i in range(30):
        px = imagegen.make_pixels(i)
        f = image_scoring.ahash64(px)
        assert all(0 <= b <= 0xFFFF for b in f)
        assert f == image_scoring.ahash64(px)  # deterministic
        d = imagegen.near_dup_image(i)
        px_d = image_scoring.decode(d["data"], d["fmt"], d["width"], d["height"])
        assert hd(f, image_scoring.ahash64(px_d)) <= 1  # planted twin
        fps.append(f)
    dists = [hd(fps[i], fps[j]) for i in range(30) for j in range(i + 1, 30)]
    assert sorted(dists)[len(dists) // 2] >= 16  # unrelated: median far out


def test_video_vhash_brightness_invariance():
    """The slice-block video fingerprint: brightness-shifted re-encodes
    land at Hamming 0 while unrelated videos sit far; stub ids plant no
    twin (their base quarantines)."""
    from curator_spark.scoring import video as video_scoring
    from curator_spark.synth import videogen

    def hd(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    assert videogen.near_dup_video(5) is None  # 5 % 9 == 5: stub base
    fps = []
    for i in range(20):
        if i % 9 == 5:
            continue
        f = video_scoring.vhash64(videogen.make_frames(i))
        assert all(0 <= b <= 0xFFFF for b in f)
        d = videogen.near_dup_video(i)
        fr = video_scoring.decode(
            d["data"], d["fmt"], d["width"], d["height"], d["n_frames"], d["fps"]
        )
        assert hd(f, video_scoring.vhash64(fr)) <= 1
        fps.append(f)
    dists = [hd(fps[i], fps[j]) for i in range(len(fps)) for j in range(i + 1, len(fps))]
    assert sorted(dists)[len(dists) // 2] >= 16


def test_cepstral_flatness_separates_tone_from_noise():
    """Spectral flatness over the probe bands must be near 1 for white
    noise (energy in every band) and much lower for a pure tone parked
    on one probe frequency; degenerate inputs give all-None."""
    sr = 16000
    t = np.arange(sr) / sr
    rng = np.random.default_rng(3)
    noise = audio.cepstral_features(np.clip(rng.standard_normal(sr) * 0.2, -1, 1), sr)
    tone = audio.cepstral_features(0.8 * np.sin(2 * np.pi * 300.0 * t), sr)
    assert noise["flatness"] is not None and tone["flatness"] is not None
    assert noise["flatness"] > 0.5
    assert tone["flatness"] < 0.1 * noise["flatness"]
    # c0 is the sum of the log band energies; noise >= tone off-band leakage
    assert noise["c0"] is not None and tone["c0"] is not None
    silent = audio.cepstral_features(np.zeros(sr), sr)
    assert silent == {"c0": None, "c1": None, "c2": None, "flatness": None}
    empty = audio.cepstral_features(np.array([]), sr)
    assert empty == {"c0": None, "c1": None, "c2": None, "flatness": None}


def test_level_stats_physics():
    """Level gauges must read the physics: a DC-shifted signal reports
    its offset, a square wave has ~0 dB crest, a sine ~3.01 dB, and
    silence has zero levels with an undefined crest."""
    sr = 16000
    t = np.arange(sr) / sr
    sine = audio.level_stats(0.5 * np.sin(2 * np.pi * 100.0 * t), sr)
    assert abs(sine["crest_db"] - 3.0103) < 0.02  # 20*log10(sqrt(2))
    assert abs(sine["dc_offset"]) < 1e-4
    assert abs(sine["rms"] - 0.5 / np.sqrt(2)) < 1e-3
    square = audio.level_stats(0.8 * np.sign(np.sin(2 * np.pi * 100.0 * t)), sr)
    assert abs(square["crest_db"]) < 0.01
    shifted = audio.level_stats(np.clip(0.2 + 0.1 * np.sin(2 * np.pi * 100.0 * t), -1, 1), sr)
    assert abs(shifted["dc_offset"] - 0.2) < 1e-3
    silent = audio.level_stats(np.zeros(100), sr)
    assert silent["rms"] == 0.0 and silent["peak"] == 0.0 and silent["crest_db"] is None
    empty = audio.level_stats(np.array([]), sr)
    assert empty == {"dc_offset": None, "rms": None, "peak": None, "crest_db": None}


def test_audio_oracle_null_and_empty_payload_parity(spark, tmp_path):
    """The SQL decode oracle must agree with the Python stage on the
    degenerate payloads the fixtures never emit: a NULL bytes column
    (any codec) is ok=FALSE (Python raises on bytes(None) and
    quarantines — a NULL comparison leaking into ok would desync
    decode_ok), and an EMPTY ulaw payload decodes ok with the
    zero-sample feature constants (-120 / 1.0 / 0.0)."""
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    from curator_spark import stages
    from curator_spark.scoring import audio_sql
    from curator_spark.synth import clips

    base = clips.clips_pandas(4)
    rows = base.iloc[:2].copy()
    extra = pd.DataFrame(
        {
            "clip_id": ["z_empty_ulaw", "z_null_pcm", "z_null_ulaw"],
            "bytes": [b"", None, None],
            "sr_hz": [8000, 16000, 8000],
            "dur_ms": [0, 1000, 1000],
            "codec": ["ulaw", "pcm_s16le", "ulaw"],
            "transcript": ["", "", ""],
        }
    )
    pdf = pd.concat([rows, extra], ignore_index=True)
    path = str(tmp_path / "degen.parquet")
    pdf.to_parquet(path)

    got_sql = (
        duckdb.connect()
        .execute(audio_sql.audio_decode_features_sql(path))
        .df()
        .set_index("clip_id")
    )
    sdf = spark.createDataFrame(
        pdf,
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string",
    )
    got_spark = {
        r["clip_id"]: r for r in stages.decode_stage(sdf).collect()
    }
    assert set(got_sql.index) == set(got_spark)
    for cid, srow in got_spark.items():
        qrow = got_sql.loc[cid]
        assert bool(qrow["decode_ok"]) == bool(srow["decode_ok"]), cid
        # tolerance, not equality-after-round: the SQL side is already
        # rounded half-up while the raw stage output is not, and Python's
        # round() banker's-rounds — the gate itself rounds BOTH sides
        # with the same half-up pair (F.round / duckdb round)
        for col in ("silence_ratio", "clip_ratio"):
            assert abs(float(qrow[col]) - float(srow[col])) <= 1.01e-6, (cid, col)
        # Spark's quarantine NaN surfaces as NULL after the Arrow
        # boundary; DuckDB keeps it a literal NaN — both mean "no value"
        a = float(qrow["rms_db"]) if qrow["rms_db"] is not None else float("nan")
        b = float(srow["rms_db"]) if srow["rms_db"] is not None else float("nan")
        assert (a != a and b != b) or abs(a - b) <= 1.01e-6, cid
    assert not got_spark["z_null_pcm"]["decode_ok"]
    assert not got_spark["z_null_ulaw"]["decode_ok"]
    assert got_spark["z_empty_ulaw"]["decode_ok"]
    assert got_spark["z_empty_ulaw"]["rms_db"] == -120.0
