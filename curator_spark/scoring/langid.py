"""fastText-style language identification (public algorithm, no model file).

A linear classifier over hashed character trigrams — the hashing-trick
bag-of-ngrams architecture of fastText (Joulin et al. 2016, public) with
multinomial-NB-fit weights, trained deterministically on the seeded
synthetic corpus (:func:`curator_spark.synth.textgen.training_corpus`).

Everything is float64 numpy and a pure function of the input string, so the
Spark pandas-UDF path and the single-node oracle produce bit-identical
scores regardless of batching/partitioning (the determinism requirement in
SURVEY.md §7 "What's hard").

Reference analog: the generate-map scoring stage
(``base_online_request_processor.py:304-449`` maps rows through a model);
here the "model" is executor-local, loaded once per process via
lru_cache — the Spark analog of vLLM's load-once
(``base_offline_request_processor.py:159-161``).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..synth import textgen

N_BUCKETS = 1 << 16
_P1, _P2 = np.uint64(131), np.uint64(17161)  # 131^2


def _codes(text: str) -> np.ndarray:
    """String → uint64 byte codes; non-latin1 chars map to '?'."""
    b = text.lower().encode("latin-1", errors="replace")
    return np.frombuffer(b, dtype=np.uint8).astype(np.uint64)


def trigram_buckets(text: str) -> np.ndarray:
    """Vectorized hashed char-trigram extraction (the fastText hashing trick)."""
    c = _codes(f"^{text}$")  # boundary markers
    if c.shape[0] < 3:
        return np.empty(0, dtype=np.int64)
    h = (c[:-2] * _P2 + c[1:-1] * _P1 + c[2:]) % np.uint64(N_BUCKETS)
    return h.astype(np.int64)


@lru_cache(maxsize=1)
def model() -> tuple[np.ndarray, np.ndarray]:
    """(logpT[bucket, lang], log_prior[lang]) — trained once per process.

    Stored bucket-major: scoring gathers whole rows (one cache line per
    trigram, all languages) instead of striding a lang-major table —
    the gather is the langid hot loop."""
    langs = textgen.LANGS
    logp = np.zeros((len(langs), N_BUCKETS), dtype=np.float64)
    for li, lang in enumerate(langs):
        counts = np.zeros(N_BUCKETS, dtype=np.float64)
        for sent in textgen.training_corpus(lang):
            b = trigram_buckets(sent)
            if b.shape[0]:
                counts += np.bincount(b, minlength=N_BUCKETS)
        total = counts.sum()
        logp[li] = np.log((counts + 0.5) / (total + 0.5 * N_BUCKETS))
    log_prior = np.log(np.asarray(textgen.LANG_PROBS, dtype=np.float64))
    return np.ascontiguousarray(logp.T), log_prior


def score_text(text: str) -> tuple[str, float]:
    """→ (predicted_lang, confidence). Pure per-row function."""
    logpT, log_prior = model()
    b = trigram_buckets(text)
    if b.shape[0] == 0:
        i = int(np.argmax(log_prior))
        return textgen.LANGS[i], 0.0
    # mean per-ngram log-likelihood keeps softmax length-invariant
    s = logpT[b].sum(axis=0) / b.shape[0] + log_prior / b.shape[0]
    s = s - s.max()
    # fixed temperature calibrated on the synthetic corpus: clean-language
    # margins (~6-8 nats/trigram) map to conf ~0.95+, mixed-language
    # margins (<4) fall under the lang_conf_min=0.70 rule boundary
    p = np.exp(s * 0.5)
    p = p / p.sum()
    i = int(np.argmax(p))
    return textgen.LANGS[i], float(p[i])


def score_batch(texts: "list[str] | np.ndarray") -> tuple[list[str], np.ndarray]:
    """Batch wrapper used by the pandas UDF: per-row pure calls, Arrow-batched."""
    langs: list[str] = []
    confs = np.empty(len(texts), dtype=np.float64)
    for i, t in enumerate(texts):
        lang, conf = score_text(t if isinstance(t, str) else "")
        langs.append(lang)
        confs[i] = conf
    return langs, confs
