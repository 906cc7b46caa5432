"""Deterministic synthetic multi-language text model.

Three synthetic "languages" with disjoint-ish syllable inventories so a
char-n-gram classifier is genuinely learnable (the public fastText langid
setup), plus seeded noise injections: repetition runs, symbol bursts,
stopword-poor strings, and PII/toxicity tokens from fixed pattern lists.

This is the analog of the reference's fixture datasets
(``tests/conftest.py:20-50`` builds small deterministic datasets; we need
them at SF scale, so everything here is a pure function of ``(seed, i)``).
No external data is used anywhere.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

GLOBAL_SEED = 42

LANGS = ("avelian", "brontic", "cyrric")
# hot-language skew per FIXTURES.md: ~60/25/15
LANG_PROBS = (0.60, 0.25, 0.15)

# Distinct phonotactics per language → distinct char n-gram distributions.
_SYLLABLES = {
    "avelian": [
        "ka", "mi", "to", "ra", "ne", "su", "el", "an", "ori", "ume",
        "ta", "ki", "mo", "re", "nu", "sa", "il", "on", "ari", "eko",
    ],
    "brontic": [
        "sch", "ber", "gru", "fel", "tz", "dor", "wek", "bla", "stu", "ng",
        "krf", "ulb", "ost", "dre", "zam", "bro", "gel", "wur", "fen", "tak",
    ],
    "cyrric": [
        "yl", "qi", "vyx", "ol", "wy", "ju", "pex", "ly", "qu", "xi",
        "vy", "jo", "wix", "py", "qy", "lu", "xo", "jy", "vex", "wyl",
    ],
}

VOCAB_SIZE = 600
STOPWORD_COUNT = 20  # the top-N Zipf words of each language act as stopwords

# Fixed PII templates (shape matters, content synthetic) and a fixed
# sci-fi-expletive "toxic" lexicon — all scrub targets are drawn from these.
PII_EMAILS = [
    "ada.lovelace{n}@example.com",
    "unit{n}@mail.example.org",
    "test.user+{n}@example.net",
]
PII_PHONES = ["555-{a:03d}-{b:04d}"]
PII_SSNS = ["{a:03d}-{b:02d}-{c:04d}"]
TOXIC_LEXICON = ("frak", "smeg", "gorram", "frell", "shazbot")

SYMBOL_BURST_CHARS = list("#$%&*@!~^<>{}[]|\\")


@lru_cache(maxsize=None)
def vocab(lang: str) -> tuple[str, ...]:
    """Deterministic vocabulary: VOCAB_SIZE words of 1-4 syllables."""
    rng = np.random.default_rng(abs(hash_str(f"vocab:{lang}")) % (2**32))
    syl = _SYLLABLES[lang]
    words = []
    seen = set()
    while len(words) < VOCAB_SIZE:
        n = int(rng.integers(1, 5))
        w = "".join(syl[int(rng.integers(0, len(syl)))] for _ in range(n))
        if w not in seen:
            seen.add(w)
            words.append(w)
    return tuple(words)


@lru_cache(maxsize=None)
def zipf_probs(n: int) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = 1.0 / ranks**1.1
    return p / p.sum()


@lru_cache(maxsize=None)
def stopwords(lang: str) -> frozenset[str]:
    return frozenset(vocab(lang)[:STOPWORD_COUNT])


def hash_str(s: str) -> int:
    """Stable 64-bit string hash (FNV-1a); Python's hash() is salted per
    process, which would break cross-process determinism."""
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def clip_rng(i: int, tag: str = "clip") -> np.random.Generator:
    """Per-clip RNG — a pure function of (GLOBAL_SEED, tag, i)."""
    return np.random.default_rng(
        (hash_str(f"{tag}:{GLOBAL_SEED}:{i}")) % (2**63)
    )


def sample_lang(rng: np.random.Generator) -> str:
    return LANGS[int(rng.choice(len(LANGS), p=np.asarray(LANG_PROBS)))]


def gen_sentence(lang: str, rng: np.random.Generator, n_words: int) -> list[str]:
    v = vocab(lang)
    idx = rng.choice(len(v), size=n_words, p=zipf_probs(len(v)))
    return [v[int(j)] for j in idx]


def gen_transcript(i: int) -> tuple[str, str, dict[str, bool]]:
    """Generate (transcript, true_lang, noise_flags) for clip index ``i``.

    Noise injections (independent seeded coin flips; probabilities chosen so
    ~20-30%% of clips trip at least one drop rule):
      rep    — a word repeated 8-30× (repetition-ratio rule)
      sym    — a 10-60-char symbol burst (symbol-ratio rule)
      rare   — words drawn uniformly from the rare tail (stopword-density rule)
      pii    — email/phone/SSN tokens injected (scrub targets)
      tox    — toxic-lexicon words injected (scrub + tox_max rule)
      short  — truncated to <4 words (length rules)
      mixed  — a run of words from another language (langid-confidence rule)
    """
    rng = clip_rng(i, "text")
    lang = sample_lang(rng)
    # log-normal word count, long tail >= 10x median (FIXTURES.md skew req)
    n_words = max(1, int(rng.lognormal(mean=3.0, sigma=0.7)))
    words = gen_sentence(lang, rng, n_words)

    flags = {
        "rep": rng.random() < 0.06,
        "sym": rng.random() < 0.06,
        "rare": rng.random() < 0.05,
        "pii": rng.random() < 0.10,
        "tox": rng.random() < 0.06,
        "short": rng.random() < 0.04,
        "mixed": rng.random() < 0.05,
    }

    if flags["short"]:
        words = words[: int(rng.integers(1, 4))]
    if flags["rare"]:
        v = vocab(lang)
        tail = v[VOCAB_SIZE // 2 :]
        words = [tail[int(j)] for j in rng.integers(0, len(tail), size=max(6, len(words)))]
    if flags["rep"]:
        w = words[int(rng.integers(0, len(words)))]
        reps = int(rng.integers(8, 31))
        pos = int(rng.integers(0, len(words) + 1))
        words = words[:pos] + [w] * reps + words[pos:]
    if flags["mixed"]:
        other = LANGS[(LANGS.index(lang) + 1) % len(LANGS)]
        run = gen_sentence(other, rng, max(3, len(words) // 2))
        pos = int(rng.integers(0, len(words) + 1))
        words = words[:pos] + run + words[pos:]
    if flags["pii"]:
        kind = int(rng.integers(0, 3))
        if kind == 0:
            tpl = PII_EMAILS[int(rng.integers(0, len(PII_EMAILS)))]
            tok = tpl.format(n=int(rng.integers(0, 1000)))
        elif kind == 1:
            tok = PII_PHONES[0].format(a=int(rng.integers(0, 1000)), b=int(rng.integers(0, 10000)))
        else:
            tok = PII_SSNS[0].format(
                a=int(rng.integers(1, 900)), b=int(rng.integers(1, 100)), c=int(rng.integers(1, 10000))
            )
        pos = int(rng.integers(0, len(words) + 1))
        words = words[:pos] + [tok] + words[pos:]
    if flags["tox"]:
        k = int(rng.integers(1, 5))
        for _ in range(k):
            tok = TOXIC_LEXICON[int(rng.integers(0, len(TOXIC_LEXICON)))]
            pos = int(rng.integers(0, len(words) + 1))
            words = words[:pos] + [tok] + words[pos:]
    if flags["sym"]:
        n_sym = int(rng.integers(10, 61))
        burst = "".join(
            SYMBOL_BURST_CHARS[int(j)] for j in rng.integers(0, len(SYMBOL_BURST_CHARS), size=n_sym)
        )
        pos = int(rng.integers(0, len(words) + 1))
        words = words[:pos] + [burst] + words[pos:]

    return " ".join(words), lang, flags


@lru_cache(maxsize=None)
def training_corpus(lang: str, n_sentences: int = 2000) -> tuple[str, ...]:
    """Clean seeded corpus per language — trains langid + the n-gram LM.

    Independent of the clip RNG stream so models never peek at eval rows.
    """
    rng = np.random.default_rng(abs(hash_str(f"train:{lang}")) % (2**32))
    out = []
    for _ in range(n_sentences):
        n = max(3, int(rng.lognormal(mean=2.8, sigma=0.5)))
        out.append(" ".join(gen_sentence(lang, rng, n)))
    return tuple(out)
