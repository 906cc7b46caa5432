"""Export sink: curated parquet + a generated dataset card (SURVEY §2.1 S5).

The reference's ``push_to_hub`` writes the dataset plus a generated card
describing it (``base_request_processor.py:481-494``); its local export
writes plain files. Here: ``data/`` parquet (the curated rows),
``README.md`` (card with YAML front-matter metadata + stats table) and
``dataset_info.json`` (machine-readable twin). Stats come from ONE
aggregation job over the exported table; the card is driver-side file IO.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _stats(df: DataFrame) -> dict:
    agg = df.agg(
        F.count("*").alias("n_rows"),
        F.avg("ppl").alias("mean_ppl"),
        F.avg("lang_conf").alias("mean_lang_conf"),
        F.sum("scrub_hits").alias("total_scrub_hits"),
    ).head()
    langs = {
        r["lang"]: r["n"]
        for r in df.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    return {
        "n_rows": int(agg["n_rows"]),
        "mean_ppl": None if agg["mean_ppl"] is None else round(float(agg["mean_ppl"]), 4),
        "mean_lang_conf": (
            None if agg["mean_lang_conf"] is None else round(float(agg["mean_lang_conf"]), 4)
        ),
        "total_scrub_hits": int(agg["total_scrub_hits"] or 0),
        "languages": dict(sorted(langs.items())),
    }


def export_dataset(
    pipe,
    out_dir: str,
    fingerprint: str | None = None,
    kept_only: bool = True,
    data_format: str = "parquet",
) -> dict:
    """Write one run's curated table + card to ``out_dir``; returns the
    card metadata dict. ``kept_only`` exports the keep=true view (the
    dataset a trainer consumes); pass False for the full labeled table.
    ``data_format``: parquet (default), jsonl, or csv — the labeled table
    is media-free (bytes never leave the decode stage), so the text
    formats are lossless apart from their usual type erasure; stats are
    computed from the read-back so the card describes what was actually
    written."""
    labeled = pipe.output(fingerprint)
    df = labeled.filter(F.col("keep")) if kept_only else labeled
    os.makedirs(out_dir, exist_ok=True)
    data_dir = os.path.join(out_dir, "data")
    if data_format == "parquet":
        df.write.mode("overwrite").parquet(data_dir)
        exported = pipe.spark.read.parquet(data_dir)
    elif data_format == "jsonl":
        # arrays (reasons) survive; write.json emits one object per line
        df.write.mode("overwrite").json(data_dir)
        exported = pipe.spark.read.schema(df.schema).json(data_dir)
    elif data_format == "csv":
        # CSV has no array type: render the reasons list as a '|' string.
        # escape='"' writes RFC-4180 doubled quotes and multiLine=True lets
        # the reader keep embedded newlines inside quoted fields — without
        # it a transcript containing '\n' splits into garbage rows and the
        # card stats below describe a corrupted table.
        flat = df.withColumn("reasons", F.concat_ws("|", "reasons"))
        (flat.write.mode("overwrite").option("header", True)
             .option("escape", '"').csv(data_dir))
        exported = (
            pipe.spark.read.schema(flat.schema).option("header", True)
            .option("escape", '"').option("multiLine", True).csv(data_dir)
        )
    else:
        raise ValueError(f"unknown data_format {data_format!r}")

    # keep_rate is the CURATION stat (kept / labeled), so it is always
    # measured over the full labeled run — computing it over a kept-only
    # export would be tautologically 1.0 and tell the card reader nothing
    total, kept = labeled.agg(
        F.count("*"), F.sum(F.col("keep").cast("long"))
    ).head()
    fp = fingerprint or pipe.last_fingerprint
    info = {
        "run_fingerprint": fp,
        "config_json": pipe.cfg.canonical_json(),
        "kept_only": kept_only,
        "data_format": data_format,
        "generated_at": datetime.now(timezone.utc).isoformat(),
        "schema": {f.name: f.dataType.simpleString() for f in exported.schema},
        **_stats(exported),
        "labeled_rows": int(total),
        "keep_rate": round(int(kept or 0) / total, 6) if total else None,
    }
    with open(os.path.join(out_dir, "dataset_info.json"), "w") as fh:
        json.dump(info, fh, indent=2)

    lang_rows = "\n".join(f"| {k} | {v} |" for k, v in info["languages"].items())
    card = f"""---
run_fingerprint: {fp}
n_rows: {info["n_rows"]}
kept_only: {str(kept_only).lower()}
generated_at: {info["generated_at"]}
---

# Curated clip dataset

Produced by the curator_spark pipeline (langid + perplexity + quality
rules + PII/toxicity scrub DAG). Run fingerprint `{fp}` — same input +
same config always reproduces this dataset bit-identically.

| Stat | Value |
|---|---|
| rows | {info["n_rows"]} |
| keep_rate | {info["keep_rate"]} |
| mean_ppl | {info["mean_ppl"]} |
| mean_lang_conf | {info["mean_lang_conf"]} |
| total_scrub_hits | {info["total_scrub_hits"]} |

## Languages

| lang | rows |
|---|---|
{lang_rows}

## Config

```json
{pipe.cfg.canonical_json()}
```
"""
    with open(os.path.join(out_dir, "README.md"), "w") as fh:
        fh.write(card)
    return info


def publish_dataset(
    pipe,
    repo_dir: str,
    fingerprint: str | None = None,
    val_frac: float = 0.1,
    test_frac: float = 0.1,
    checksums: bool = True,
) -> dict:
    """Hub-style local publish — the reference's ``push_to_hub``
    (``base_request_processor.py:481-494``) re-expressed as a dataset-repo
    layout a trainer (or an actual hub uploader) consumes directly:

    ``repo_dir/data/{split}-{i:05d}-of-{n:05d}.parquet`` (hub shard
    naming), ``README.md`` (card with YAML front-matter incl. the split
    sizes), ``dataset_info.json`` (machine-readable twin) and
    ``SHA256SUMS`` (the upload-integrity manifest the hub verifies).

    Splits are the leakage-safe md5-prefix assignment on ``clip_id``
    (ops/text._split_expr) — reproducible across runs and cluster sizes,
    so republishing the same fingerprint yields byte-stable membership.
    The split writes are distributed; only shard renames and (optional)
    checksum hashing run driver-side. At a 100 TB publish the checksum
    pass would move into a ``mapPartitions`` over the shard files —
    driver-side hashing is the local-repo convenience, gated behind
    ``checksums``."""
    import hashlib
    import shutil

    from .ops.text import SPLIT_SCHEME, _split_expr

    labeled = pipe.output(fingerprint)
    kept = labeled.filter(F.col("keep")).withColumn(
        "split", _split_expr(val_frac, test_frac, id_col="clip_id")
    )
    data_dir = os.path.join(repo_dir, "data")
    shutil.rmtree(data_dir, ignore_errors=True)
    os.makedirs(data_dir, exist_ok=True)

    # ONE partitioned write produces all three splits in a single scan of
    # the labeled table (three filtered writes would re-scan it per
    # split); partitionBy also drops the split column from the data files,
    # matching the hub shard layout. Counts come from the written shards'
    # parquet footers — metadata reads, not data scans.
    tmp = os.path.join(repo_dir, "_tmp_splits")
    kept.write.mode("overwrite").partitionBy("split").parquet(tmp)
    split_rows: dict[str, int] = {}
    shards: list[str] = []
    for split in ("train", "val", "test"):
        sdir = os.path.join(tmp, f"split={split}")
        files = sorted(
            f for f in (os.listdir(sdir) if os.path.isdir(sdir) else [])
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
        n = len(files)
        split_shards = []
        for i, f in enumerate(files):
            shard = f"{split}-{i:05d}-of-{n:05d}.parquet"
            os.replace(os.path.join(sdir, f), os.path.join(data_dir, shard))
            split_shards.append(shard)
        shards.extend(split_shards)
        split_rows[split] = pipe.spark.read.parquet(
            *(os.path.join(data_dir, s) for s in split_shards)
        ).count() if n else 0
    shutil.rmtree(tmp, ignore_errors=True)

    sums_path = os.path.join(repo_dir, "SHA256SUMS")
    if checksums:
        with open(sums_path, "w") as fh:
            for shard in shards:
                h = hashlib.sha256()
                with open(os.path.join(data_dir, shard), "rb") as sf:
                    for chunk in iter(lambda: sf.read(1 << 20), b""):
                        h.update(chunk)
                fh.write(f"{h.hexdigest()}  data/{shard}\n")
    elif os.path.exists(sums_path):
        # re-publish with checksums=False: a SURVIVING manifest from a
        # previous publish would describe shards that no longer exist —
        # an integrity file actively lying about the dataset. Remove it.
        os.remove(sums_path)

    fp = fingerprint or pipe.last_fingerprint
    info = {
        "run_fingerprint": fp,
        "generated_at": datetime.now(timezone.utc).isoformat(),
        "splits": split_rows,
        "n_shards": len(shards),
        "val_frac": val_frac,
        "test_frac": test_frac,
        # scheme tag (round-5 ADVICE): the r4 salt reassigned membership
        # vs bare-md5 publishes — mixing publishes across schemes
        # cross-contaminates splits; consumers compare THIS field
        "split_scheme": SPLIT_SCHEME,
        "config_json": pipe.cfg.canonical_json(),
    }
    with open(os.path.join(repo_dir, "dataset_info.json"), "w") as fh:
        json.dump(info, fh, indent=2)
    split_lines = "\n".join(f"| {k} | {v} |" for k, v in split_rows.items())
    with open(os.path.join(repo_dir, "README.md"), "w") as fh:
        fh.write(
            f"""---
run_fingerprint: {fp}
splits: {json.dumps(split_rows)}
split_scheme: {SPLIT_SCHEME}
generated_at: {info["generated_at"]}
---

# Curated clip dataset (published)

Hub-layout publish of run `{fp}` — kept rows only, leakage-safe
`md5('split|' || clip_id)` split assignment (first 8 hex chars as a
fraction of 2^32: test < {test_frac} <= val < {test_frac + val_frac} <= train).

Split scheme: `{SPLIT_SCHEME}`. Do **not** mix shards from publishes with
a different `split_scheme` — membership was reassigned between schemes,
so mixed publishes cross-contaminate train/val/test.

| split | rows |
|---|---|
{split_lines}
"""
        )
        if checksums:  # only advertise a manifest that actually exists
            fh.write(
                "\nShard integrity: `sha256sum -c SHA256SUMS` "
                "(from this directory).\n"
            )
    return info
