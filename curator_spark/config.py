"""Pipeline configuration + deterministic fingerprinting.

The fingerprint is the engine's cache/resume identity — the analog of the
reference's xxh64 run fingerprint over (dataset fingerprint, function
source, model, params) at ``llm/llm.py:139-164``. Here:
``blake2b(input_snapshot_id + canonical-JSON(config))``.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class RuleThresholds:
    """Keep/drop rule constants. Rule ids are stable — they appear in the
    ``reasons`` output column and the golden fixtures."""

    len_min: int = 20          # chars
    len_max: int = 5000
    words_min: int = 3
    distinct_ratio_min: float = 0.30   # repetition rule: distinct/total words
    symbol_ratio_max: float = 0.10     # non-alnum-nonspace / non-space chars
    stopword_density_min: float = 0.05
    lang_conf_min: float = 0.70
    ppl_max: float = 1500.0
    tox_hits_max: int = 2
    dur_ms_min: int = 200
    dur_ms_max: int = 60000
    rms_db_min: float = -45.0
    silence_ratio_max: float = 0.98
    clip_ratio_max: float = 0.30


# Fixed evaluation order → fixed ``reasons`` array order (oracle + Spark).
RULE_IDS: tuple[str, ...] = (
    "len_min", "len_max", "words_min", "rep_ratio", "symbol_ratio",
    "stopword_density", "lang_conf", "ppl_max", "tox_max",
    "dur_min", "dur_max", "audio_rms", "audio_silence", "audio_clip",
)


@dataclass(frozen=True)
class PipelineConfig:
    rules: RuleThresholds = field(default_factory=RuleThresholds)
    n_partitions: int = 64        # logical partition keys (checkpoint grain)
    commit_batches: int = 4       # partition groups committed independently
    stages: tuple[str, ...] = ("decode", "langid", "ppl", "rules", "scrub", "decide")
    # optional exact-dedup stage (≙ the reference's content-identity cache
    # skip, llm/llm.py:139-164, applied row-wise): duplicate transcripts
    # keep only the min-clip_id canonical; later copies are labeled
    # keep=false with 'duplicate' appended to reasons. Off by default —
    # it adds one digest scan + one clip_id-keyed join to the DAG.
    dedup_exact: bool = False
    # physical scan strategy for the byte-heavy decode stage:
    #   auto     — "column" when the input already carries part_key
    #              (pre-partitioned layout → pruned reads), else "manifest"
    #   manifest — driver plans (file, row_group) splits, Python workers
    #              read them directly with pyarrow (bytes never cross the
    #              JVM→Python socket; zero read amplification per group)
    #   column   — plain DataFrame scan + Arrow ship (always correct;
    #              needed when the input is not a parquet directory)
    scan_mode: str = "auto"

    def canonical_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True, separators=(",", ":"))

    def fingerprint(self, input_snapshot_id: str) -> str:
        """Cache/resume identity. scan_mode is EXCLUDED: it is a purely
        physical knob (manifest vs column scans produce bit-identical
        labels — asserted by tests), and hashing it would discard all
        completed work when an operator retries a crashed run with a
        different scan strategy."""
        h = hashlib.blake2b(digest_size=16)
        h.update(input_snapshot_id.encode())
        logical = asdict(self)
        logical.pop("scan_mode", None)
        h.update(json.dumps(logical, sort_keys=True, separators=(",", ":")).encode())
        return h.hexdigest()
