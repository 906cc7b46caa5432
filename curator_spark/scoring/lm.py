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


def _whash(w: str) -> int:
    return textgen.hash_str(f"w:{w}")


def _pair(a: int, b: int) -> int:
    return (a * 1000003 + b) & _MASK


class _LangLM:
    """Immutable per-language bigram LM."""

    __slots__ = ("uni_logp", "bi_count", "ctx_count", "oov_logp")

    def __init__(self, sentences: tuple[str, ...]):
        uni: dict[int, int] = {}
        bi: dict[int, int] = {}
        ctx: dict[int, int] = {}
        total = 0
        for sent in sentences:
            hs = [_whash(_BOS)] + [_whash(w) for w in sent.split(" ") if w != ""]
            for h in hs[1:]:
                uni[h] = uni.get(h, 0) + 1
                total += 1
            for a, b in zip(hs[:-1], hs[1:]):
                bi[_pair(a, b)] = bi.get(_pair(a, b), 0) + 1
                ctx[a] = ctx.get(a, 0) + 1
        v = len(uni)
        denom = total + 0.1 * (v + 1)
        self.uni_logp = {h: float(np.log((c + 0.1) / denom)) for h, c in uni.items()}
        self.oov_logp = float(np.log(0.1 / denom))
        self.bi_count = bi
        self.ctx_count = ctx

    def logprob(self, a: int, b: int) -> float:
        c_bi = self.bi_count.get(_pair(a, b))
        if c_bi is not None:
            return float(np.log(c_bi / self.ctx_count[a]))
        return float(np.log(_BACKOFF)) + self.uni_logp.get(b, self.oov_logp)


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
    hs = [_whash(_BOS)] + [_whash(w) for w in words]
    lp = 0.0
    for a, b in zip(hs[:-1], hs[1:]):
        lp += lm.logprob(a, b)
    return float(np.exp(-lp / len(words)))


def ppl_batch(texts: "list[str]", langs: "list[str]") -> np.ndarray:
    """Batch wrapper for the pandas UDF: per-row pure calls, Arrow-batched."""
    out = np.empty(len(texts), dtype=np.float64)
    for i, (t, g) in enumerate(zip(texts, langs)):
        out[i] = ppl(t if isinstance(t, str) else "", g)
    return out
