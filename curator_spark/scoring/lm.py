"""KenLM-style n-gram perplexity scoring (public algorithm, no model file).

Word-bigram language model with stupid backoff (Brants et al. 2007, public)
per synthetic language, trained deterministically on the seeded corpus.
The CCNet-style quality signal: noisy/OOV/repetitive transcripts score high
perplexity and get dropped by the ``ppl_max`` rule.

Pure float64 per-row math shared by the Spark UDF and the oracle — see the
determinism note in :mod:`curator_spark.scoring.langid`. Models are built
once per executor process via ``lru_cache`` (Spark analog of the
reference's load-once model hosting,
``base_offline_request_processor.py:159-161``).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..synth import textgen

_BACKOFF = 0.4
_BOS = "<s>"
_MASK = 0xFFFFFFFFFFFFFFFF


@lru_cache(maxsize=1 << 16)
def _whash(w: str) -> int:
    # cached: FNV-1a is pure-Python per char, and transcripts draw from a
    # bounded vocabulary — the cache turns the per-word hash into a dict hit
    return textgen.hash_str(f"w:{w}")


def _pair(a: int, b: int) -> int:
    return (a * 1000003 + b) & _MASK


class _LangLM:
    """Immutable per-language bigram LM.

    Lookup tables are sorted uint64 key arrays probed with ``searchsorted``
    (vectorized over a whole transcript — the hot path). The dict-based
    ``logprob`` defines the exact semantics; the array mirrors store values
    computed by the very same expressions, so both paths are bit-equal
    (asserted in tests/test_scoring_core.py)."""

    __slots__ = (
        "uni_logp", "bi_count", "ctx_count", "oov_logp", "backoff_logp",
        "bi_keys", "bi_logp", "uni_keys", "uni_vals",
    )

    def __init__(self, sentences: tuple[str, ...]):
        uni: dict[int, int] = {}
        bi: dict[int, int] = {}
        ctx: dict[int, int] = {}
        left: dict[int, int] = {}  # pair_key -> a (for ctx lookup at build)
        total = 0
        for sent in sentences:
            hs = [_whash(_BOS)] + [_whash(w) for w in sent.split(" ") if w != ""]
            for h in hs[1:]:
                uni[h] = uni.get(h, 0) + 1
                total += 1
            for a, b in zip(hs[:-1], hs[1:]):
                pk = _pair(a, b)
                bi[pk] = bi.get(pk, 0) + 1
                left[pk] = a
                ctx[a] = ctx.get(a, 0) + 1
        v = len(uni)
        denom = total + 0.1 * (v + 1)
        self.uni_logp = {h: float(np.log((c + 0.1) / denom)) for h, c in uni.items()}
        self.oov_logp = float(np.log(0.1 / denom))
        self.backoff_logp = float(np.log(_BACKOFF))
        self.bi_count = bi
        self.ctx_count = ctx

        bk = np.fromiter(bi.keys(), dtype=np.uint64, count=len(bi))
        order = np.argsort(bk, kind="stable")
        self.bi_keys = bk[order]
        self.bi_logp = np.array(
            [float(np.log(bi[int(k)] / ctx[left[int(k)]])) for k in self.bi_keys],
            dtype=np.float64,
        )
        uk = np.fromiter(uni.keys(), dtype=np.uint64, count=len(uni))
        uorder = np.argsort(uk, kind="stable")
        self.uni_keys = uk[uorder]
        self.uni_vals = np.array([self.uni_logp[int(k)] for k in self.uni_keys], dtype=np.float64)

    def logprob(self, a: int, b: int) -> float:
        c_bi = self.bi_count.get(_pair(a, b))
        if c_bi is not None:
            return float(np.log(c_bi / self.ctx_count[a]))
        return self.backoff_logp + self.uni_logp.get(b, self.oov_logp)

    def logprob_vec(self, hs: np.ndarray) -> np.ndarray:
        """Per-bigram logprobs for a hashed-word sequence (vectorized mirror
        of ``logprob`` over ``zip(hs[:-1], hs[1:])``)."""
        a, b = hs[:-1], hs[1:]
        pk = (a * np.uint64(1000003) + b)  # wraps mod 2^64 == _pair
        pos = np.searchsorted(self.bi_keys, pk)
        pos_c = np.minimum(pos, len(self.bi_keys) - 1) if len(self.bi_keys) else pos
        hit = (
            (self.bi_keys[pos_c] == pk) if len(self.bi_keys) else np.zeros(len(pk), dtype=bool)
        )
        upos = np.searchsorted(self.uni_keys, b)
        upos_c = np.minimum(upos, len(self.uni_keys) - 1)
        uhit = self.uni_keys[upos_c] == b
        uni_part = np.where(uhit, self.uni_vals[upos_c], self.oov_logp)
        out = self.backoff_logp + uni_part
        if len(self.bi_keys):
            out = np.where(hit, self.bi_logp[pos_c], out)
        return out


@lru_cache(maxsize=1)
def model() -> dict[str, _LangLM]:
    return {lang: _LangLM(textgen.training_corpus(lang)) for lang in textgen.LANGS}


def ppl(text: str, lang: str) -> float:
    """Perplexity of ``text`` under ``lang``'s bigram LM with stupid backoff.

    Pure per-row function — no batch-context dependence.
    """
    lm = model()[lang]
    words = [w for w in text.split(" ") if w != ""]
    if not words:
        return float(np.exp(-lm.oov_logp))
    hs = np.fromiter(
        (_whash(w) for w in [_BOS, *words]), dtype=np.uint64, count=len(words) + 1
    )
    lp = float(lm.logprob_vec(hs).sum())
    return float(np.exp(-lp / len(words)))


def ppl_batch(texts: "list[str]", langs: "list[str]") -> np.ndarray:
    """Batch wrapper for the pandas UDF: per-row pure calls, Arrow-batched."""
    out = np.empty(len(texts), dtype=np.float64)
    for i, (t, g) in enumerate(zip(texts, langs)):
        out[i] = ppl(t if isinstance(t, str) else "", g)
    return out
