"""Heuristic quality rules — pure-Python mirror of the Catalyst expressions.

The Spark side (stages.py) expresses every rule as built-in SQL functions
(whole-stage-codegen'd, no Python in the hot path); this module is the
single-node oracle's evaluation, written token-for-token against the same
semantics (split on single space, Java-compatible regex classes) so the
keep/drop label matches exactly (F1 gate, BASELINE.md).

Reference analog: the user-level quality filter idiom
(``examples/bespoke-stratos-data-generation/generate_numina_data.py:113-116``
``.filter(lambda x: x["correct"])``) — SURVEY.md §2.3 F4.
"""

from __future__ import annotations

import math
import re

from ..config import RuleThresholds
from ..synth import textgen

# EXPLICIT whitespace class = Python str-pattern \s, enumerated: Java's
# (?U)\s uses the Unicode White_Space property, which EXCLUDES the
# separator controls U+001C-U+001F that Python includes — an implicit \s
# on either side would diverge on those. Both engines read this class
# identically. (Single source: stages.py imports these.)
WS_INNER = "\\t-\\r\\x1c-\\x20\\x85\\xa0\\u1680\\u2000-\\u200a\\u2028\\u2029\\u202f\\u205f\\u3000"
WS_CLASS = f"[{WS_INNER}]"
NON_ALNUM_CLASS = f"[A-Za-z0-9{WS_INNER}]"

_NON_ALNUM = re.compile(NON_ALNUM_CLASS)
_WS = re.compile(WS_CLASS)


def text_features(transcript: str, lang: str) -> dict[str, float]:
    """Rule inputs. Mirrors stages.py exactly:
    words = filter(split(transcript, ' '), w -> w != '')."""
    words = [w for w in transcript.split(" ") if w != ""]
    n_words = len(words)
    n_chars = len(transcript)
    distinct_ratio = (len(set(words)) / n_words) if n_words else 0.0
    nonspace = len(_WS.sub("", transcript))
    symbols = len(_NON_ALNUM.sub("", transcript))
    symbol_ratio = symbols / max(nonspace, 1)
    stops = textgen.stopwords(lang)
    stop_hits = sum(1 for w in words if w in stops)
    stopword_density = (stop_hits / n_words) if n_words else 0.0
    return {
        "n_chars": float(n_chars),
        "n_words": float(n_words),
        "distinct_ratio": distinct_ratio,
        "symbol_ratio": symbol_ratio,
        "stopword_density": stopword_density,
    }


def evaluate(
    feats: dict[str, float],
    lang_conf: float,
    ppl: float,
    tox_hits: int,
    dur_ms: int,
    audio: dict[str, float],
    t: RuleThresholds,
) -> tuple[bool, list[str]]:
    """→ (keep, ordered failed-rule ids). Order = config.RULE_IDS."""
    rms_ok = (not math.isnan(audio["rms_db"])) and audio["rms_db"] >= t.rms_db_min
    checks = [
        ("len_min", feats["n_chars"] >= t.len_min),
        ("len_max", feats["n_chars"] <= t.len_max),
        ("words_min", feats["n_words"] >= t.words_min),
        ("rep_ratio", feats["distinct_ratio"] >= t.distinct_ratio_min),
        ("symbol_ratio", feats["symbol_ratio"] <= t.symbol_ratio_max),
        ("stopword_density", feats["stopword_density"] >= t.stopword_density_min),
        ("lang_conf", lang_conf >= t.lang_conf_min),
        ("ppl_max", ppl <= t.ppl_max),
        ("tox_max", tox_hits <= t.tox_hits_max),
        ("dur_min", dur_ms >= t.dur_ms_min),
        ("dur_max", dur_ms <= t.dur_ms_max),
        ("audio_rms", rms_ok),
        ("audio_silence", audio["silence_ratio"] <= t.silence_ratio_max),
        ("audio_clip", audio["clip_ratio"] <= t.clip_ratio_max),
    ]
    reasons = [rid for rid, ok in checks if not ok]
    return (len(reasons) == 0), reasons
