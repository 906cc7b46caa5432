"""File-manifest scan: Python-native parquet reads for the byte-heavy stage.

Why this exists (measured on this box, 100k clips / 3.4 GB audio):
shipping the ``bytes`` column JVM→Python through the Arrow socket is the
pipeline's bottleneck — warm tasks spend ~80% of their time blocked on
batch delivery, and wall time *increases* from local[8] to local[32]
because the JVM-side copy path saturates memory bandwidth. Reading the
parquet row groups directly inside the Python workers with pyarrow removes
that transfer entirely: the only thing the JVM ships is a tiny manifest of
``(file, row_group)`` splits, and the only thing Python ships back is the
scored, bytes-free rows.

This is the DataSourceV2 / Iceberg execution model re-expressed at the UDF
layer: the driver plans splits from file metadata (≙ Iceberg manifest
entries, with record counts from the footers), workers claim splits and
read their own columns. On a real cluster pyarrow reads object storage
directly, so the pattern carries to 10^12-clip tables unchanged.

Checkpoint / resume semantics in manifest mode:
- file→part_key assigned driver-side by LPT bin-packing on compressed
  bytes over the *sorted* file list — deterministic for a static input
  (no row hashing).
- a commit group's read set is exactly its files: zero read amplification
  across groups (the column path re-scans the table per group unless the
  input is pre-partitioned by part_key).
- per-key input row counts come from the parquet footers — the audit
  reconciliation (rows_in == rows_out) is exact and costs no scan.

Reference analog: batch chunking by request count/bytes
(``base_request_processor.py:253-271``) — chunks ≙ row-group splits;
``custom_id`` rejoin is unnecessary because rows never leave their split.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

CLIP_COLUMNS = ["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"]


@dataclass(frozen=True)
class Manifest:
    """Planned splits + per-key row counts for one input directory."""

    splits: pd.DataFrame  # path, row_group, n_rows, part_key
    rows_per_key: dict[int, int]

    @property
    def n_files(self) -> int:
        return self.splits["path"].nunique()


def list_parquet_files(input_path: str) -> list[str]:
    """Parquet data files under ``input_path``, with Spark's hidden-path
    semantics: files AND whole directories starting with ``_``/``.`` are
    excluded (a crashed writer's ``_temporary/.../part-0.parquet`` must
    not be decoded by manifest mode when the column path would ignore
    it)."""
    files = []
    # absolute paths: src_file provenance must match the spelling
    # input_file_name()-derived marks use (pipeline._src_file_expr) even
    # when the caller passes a relative input_path
    for root, dirs, names in os.walk(os.path.abspath(input_path)):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for n in sorted(names):
            if n.endswith(".parquet") and not n.startswith(("_", ".")):
                files.append(os.path.join(root, n))
    return sorted(files)


def build_manifest(input_path: str, n_partitions: int) -> Manifest:
    """Driver-side split planning from parquet footers (≙ Iceberg manifest
    scan).

    file→part_key assignment is **LPT bin-packing on compressed byte size**
    (largest file first onto the lightest key, deterministic tie-breaks):
    the clip table's skewed duration/codec distribution makes file sizes
    uneven, and a round-robin assignment turns that into straggler tasks
    (measured: slowest task 1.6× the mean at 8 cores). Byte-balanced keys
    are the explicit skew handling the engine's salting story promises —
    decode/score cost tracks compressed bytes, so equal-byte keys give
    equal-cost tasks."""
    import heapq

    import pyarrow.parquet as pq

    per_file: list[tuple[str, list[tuple[int, int]], int]] = []  # path, [(rg, rows)], bytes
    for path in list_parquet_files(input_path):
        meta = pq.ParquetFile(path).metadata
        rgs = [(rg, meta.row_group(rg).num_rows) for rg in range(meta.num_row_groups)]
        # COMPRESSED bytes (column-chunk sums): read cost tracks on-disk
        # size; row_group.total_byte_size is the uncompressed size, which
        # diverges under mixed codecs/compressibility and would reintroduce
        # the straggler skew LPT exists to remove
        nbytes = sum(
            meta.row_group(rg).column(c).total_compressed_size
            for rg in range(meta.num_row_groups)
            for c in range(meta.row_group(rg).num_columns)
        )
        per_file.append((path, rgs, nbytes))

    # LPT: heaviest file first, onto the currently lightest key. Heap of
    # (assigned_bytes, key) with key order as tie-break → deterministic.
    heap = [(0, k) for k in range(n_partitions)]
    heapq.heapify(heap)
    rows = []
    rows_per_key: dict[int, int] = dict.fromkeys(range(n_partitions), 0)
    for path, rgs, nbytes in sorted(per_file, key=lambda t: (-t[2], t[0])):
        load, key = heapq.heappop(heap)
        heapq.heappush(heap, (load + nbytes, key))
        for rg, n in rgs:
            rows.append((path, rg, n, key))
            rows_per_key[key] += n
    splits = (
        pd.DataFrame(rows, columns=["path", "row_group", "n_rows", "part_key"])
        .sort_values(["path", "row_group"])
        .reset_index(drop=True)
    )
    return Manifest(splits=splits, rows_per_key=rows_per_key)


def decode_score_splits(
    spark: SparkSession, splits: pd.DataFrame, with_src: bool = False
) -> DataFrame:
    """Run the fused decode+score stage over manifest splits.

    Returns the same schema as ``stages.decode_score_stage`` plus
    ``part_key`` — bytes-free scored rows, ready for the Catalyst
    scrub/rules/decide suffix. ``with_src`` additionally carries the
    source file path (``src_file``) and the content digest (``digest``)
    for the exact-dedup stage's duplicate-mark joins; the column-scan
    twins are ``input_file_name()`` / ``stages.transcript_digest()``.
    The digest is hashed here from the RAW transcript (hashlib md5 of
    UTF-8, the exact value Spark's ``F.md5`` produces — parity asserted
    in tests/test_pipeline_resume.py) because ``score_clip_pdf``
    normalizes NULL transcripts to '' and the marks were computed against
    the raw column."""
    from . import stages

    # the reader materializes exactly the clip schema (pipeline.run guards
    # non-clip inputs onto the column path) — a columns parameter here
    # would desync from the hardcoded output schema below
    columns = CLIP_COLUMNS
    out_cols = [c for c in columns if c != "bytes"] + ["part_key"]
    schema = (
        "clip_id string, sr_hz int, dur_ms int, codec string, transcript string, "
        "part_key int, "
        + stages._DECODE_ADDED
        + ", lang string, lang_conf double, ppl double"
    )
    if with_src:
        out_cols = [*out_cols, "src_file", "digest"]
        schema += ", src_file string, digest string"

    # Cluster splits by part_key, one manifest partition per core: rows
    # come out of the stage already grouped by their output partition, so
    # the downstream partitionBy(part_key) write needs NO row shuffle —
    # the whole pipeline is shuffle-free (only the ~KB manifest moves).
    # Range partitioning packs contiguous key runs per task; keys are
    # byte-balanced by the LPT assignment in build_manifest, so any k-key
    # run is ~k/n of the total work — no hash-collision imbalance.
    n_splits = len(splits)
    n_keys = max(1, splits["part_key"].nunique())
    n_parts = max(1, min(n_splits, n_keys, spark.sparkContext.defaultParallelism))
    man_df = spark.createDataFrame(splits).repartitionByRange(n_parts, "part_key")

    def _proc(it):
        import hashlib

        import pyarrow.parquet as pq

        for mpdf in it:
            # one open + footer parse per FILE, not per row group (on
            # object storage every ParquetFile() is extra ranged GETs)
            handle_path, handle = None, None
            for path, rg, key in zip(mpdf["path"], mpdf["row_group"], mpdf["part_key"]):
                if path != handle_path:
                    handle_path, handle = path, pq.ParquetFile(path)
                tab = handle.read_row_group(int(rg), columns=columns)
                pdf = tab.to_pandas()
                pdf["part_key"] = pd.array([int(key)] * len(pdf), dtype="int32")
                if with_src:
                    pdf["src_file"] = [str(path)] * len(pdf)
                    pdf["digest"] = [
                        hashlib.md5(
                            (t if isinstance(t, str) else "\x00null").encode("utf-8")
                        ).hexdigest()
                        for t in pdf["transcript"]
                    ]
                yield stages.score_clip_pdf(pdf, out_cols)

    return man_df.mapInPandas(_proc, schema=schema)
