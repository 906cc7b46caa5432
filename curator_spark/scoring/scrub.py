"""Compiled-regex PII / toxicity scrubbing.

The patterns are written in the regex subset where Java (Spark
``regexp_replace``) and Python ``re`` semantics coincide — character
classes, ``\\b``, ``\\d``, bounded quantifiers — so the Catalyst
`regexp_replace` chain (stages.py) and this pure-Python oracle produce
byte-identical scrubbed text. Order is fixed: EMAIL → SSN → PHONE → TOX
(SSN before PHONE because both are digit-dash shapes).

Reference analog: the code-execution / arbitrary-map stage
(``code_executor/code_executor.py:99-181``) is curator's "run a transform
over every row" surface; the scrub stage is its lightweight in-engine form
(see SURVEY.md §2.2 M7).
"""

from __future__ import annotations

import re

# (rule_id, pattern, replacement) — applied in order.
SCRUB_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("tox", r"\b(?:frak|smeg|gorram|frell|shazbot)\b", "<TOX>"),
)

_COMPILED = [(rid, re.compile(pat), rep) for rid, pat, rep in SCRUB_PATTERNS]


def scrub(text: str) -> tuple[str, dict[str, int]]:
    """→ (scrubbed_text, hits-per-pattern). Pure per-row function."""
    hits: dict[str, int] = {}
    out = text
    for rid, cre, rep in _COMPILED:
        out, n = cre.subn(rep, out)
        hits[rid] = n
    return out, hits
