"""Deterministic byte-pair-encoding token counter (Sennrich et al. 2016,
public algorithm — no model file, no external tokenizer).

Merges are trained once per process on the seeded synthetic corpus
(:func:`curator_spark.synth.textgen.training_corpus`, all languages),
exactly like the langid/LM models: training is a pure function of the
seeds, so every executor process derives the SAME merge table and the
Spark pandas-UDF path is bit-identical to a single-node application
(the determinism requirement in SURVEY.md §7).

Reference analog: the reference counts prompt/completion tokens with the
provider's tokenizer for its cost/token aggregates (SURVEY §2.5 A1;
``online_status_tracker.py:355-386`` budgets by token counts). An offline
engine needs a provider-free deterministic stand-in — ``ops.text.
token_count`` keeps the ceil(chars/4) rule-of-thumb; this module is the
real subword path.

Encoding applies merges greedily by training rank (the standard BPE
apply), with an LRU word cache — Zipf-distributed corpora re-encode the
same few thousand words, so the per-batch cost is bounded by the unique
vocabulary, not the token count.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..synth import textgen

N_MERGES = 200
END = "</w>"  # end-of-word marker (standard BPE formulation)


@lru_cache(maxsize=1)
def merges() -> dict[tuple[str, str], int]:
    """(pair → rank) trained on the seeded corpus, ties broken
    lexicographically so training is order-independent and deterministic."""
    word_freq: dict[tuple[str, ...], int] = {}
    for lang in textgen.LANGS:
        for sent in textgen.training_corpus(lang):
            for w in sent.split(" "):
                if w:
                    key = tuple(w) + (END,)
                    word_freq[key] = word_freq.get(key, 0) + 1
    ranks: dict[tuple[str, str], int] = {}
    words = dict(word_freq)
    for rank in range(N_MERGES):
        pairs: dict[tuple[str, str], int] = {}
        for sym, f in words.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        # max count, then lexicographically smallest pair — deterministic
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        ranks[best] = rank
        merged = best[0] + best[1]
        new_words: dict[tuple[str, ...], int] = {}
        for sym, f in words.items():
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and (sym[i], sym[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_words[key] = new_words.get(key, 0) + f
        words = new_words
    return ranks


@lru_cache(maxsize=65536)
def encode_word(word: str) -> tuple[str, ...]:
    """BPE-encode one word: repeatedly merge the lowest-rank pair present
    (the standard greedy apply; identical to applying merges in training
    order). LRU-cached — Zipf makes the unique-word set tiny."""
    ranks = merges()
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return tuple(sym)


def count_batch(texts) -> np.ndarray:
    """(n,) int64 BPE token counts (whitespace pre-tokenization, per-word
    encode). Pure per-row function of the text — partitioning-invariant."""
    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        s = t if isinstance(t, str) else ""
        n = 0
        for w in s.split(" "):
            if w:
                n += len(encode_word(w))
        out[i] = n
    return out
