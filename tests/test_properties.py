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
