"""Single-node pure-Python reference implementation (the oracle).

Computes the exact labels the Spark pipeline must reproduce — the analog of
the reference's golden-output fixtures (SHA-256-hash-asserted cassette
outputs, ``tests/integrations/test_all.py:22-23``). Shares every scoring
function with the Spark UDFs; the *composition* here is a 40-line loop, so
it independently exercises the same math single-threaded.

Gates (BASELINE.md): keep/drop F1 >= 0.99, exact scrubbed-transcript match,
decoded-PCM SNR >= 30 dB, exact transcript pass-through.
"""

from __future__ import annotations

import pandas as pd

from .config import PipelineConfig
from .scoring import audio as audio_scoring
from .scoring import langid, lm, rules, scrub
from .synth import clips


def label_row(row: dict, cfg: PipelineConfig) -> dict:
    """All pipeline outputs for one input row."""
    aud = audio_scoring.decode_features(row["bytes"], row["codec"], row["sr_hz"], row["dur_ms"])
    lang, conf = langid.score_text(row["transcript"])
    ppl = lm.ppl(row["transcript"], lang)
    scrubbed, hits = scrub.scrub(row["transcript"])
    feats = rules.text_features(row["transcript"], lang)
    keep, reasons = rules.evaluate(
        feats, conf, ppl, hits["tox"], row["dur_ms"], aud, cfg.rules
    )
    return {
        "clip_id": row["clip_id"],
        "lang": lang,
        "lang_conf": conf,
        "ppl": ppl,
        "scrubbed_transcript": scrubbed,
        "scrub_hits": sum(hits.values()),
        "tox_hits": hits["tox"],
        "rms_db": aud["rms_db"],
        "silence_ratio": aud["silence_ratio"],
        "clip_ratio": aud["clip_ratio"],
        "keep": keep,
        "reasons": reasons,
    }


def golden_labels(n: int, cfg: PipelineConfig | None = None) -> pd.DataFrame:
    """Regenerate clips 0..n-1 and label them — the golden fixture."""
    cfg = cfg or PipelineConfig()
    return pd.DataFrame([label_row(clips.clip_row(i), cfg) for i in range(n)])
