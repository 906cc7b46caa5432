"""curator_spark — a PySpark-native data-curation / quality-filter engine.

A from-scratch reimplementation of the data-processing capabilities of
``kartik4949/curator`` (Bespoke Curator) on Apache Spark: deterministic
cached map stages, filter stages, checkpoint/resume, per-partition lineage
and metrics — instantiated as a language-ID + perplexity + heuristic
quality-filter + PII/toxicity-scrub DAG over a table of audio clip +
transcript pairs.

Reference parity map (see SURVEY.md §2): every module docstring cites the
reference file:line whose *semantics* it reproduces. No reference code is
copied — the reference is a single-process asyncio/JSONL engine; this is an
idiomatic Spark DataFrame / Arrow-UDF / Catalyst design.
"""

__version__ = "0.1.0"
