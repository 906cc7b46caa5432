"""spark-submit entry point for audio augmentation.

Reads a clip table (the pipeline's input schema), applies deterministic
noise-mix and/or speed-perturb augmentation, and writes an augmented
corpus in the SAME schema — ready to feed jobs/run_pipeline.py::

    cd /root/repo && zip -qr /tmp/curator_spark.zip curator_spark
    spark-submit --py-files /tmp/curator_spark.zip --driver-memory 8g \
        jobs/run_augment.py --input /path/clips --output /path/clips_aug \
        --noise-snr-db 20 --speed

Quarantined rows (undecodable payloads) are counted and EXCLUDED from the
output corpus — an augmentation job must not emit null-byte rows into a
table the curation pipeline will manifest-scan.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# direct `python jobs/run_augment.py` puts jobs/ (not the repo root) on
# sys.path; under spark-submit the package arrives via --py-files instead
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CLIP_COLS = ["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"]


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="clip table parquet path")
    p.add_argument("--output", required=True, help="augmented corpus output path")
    p.add_argument("--master", default=None, help="override master (local runs)")
    p.add_argument("--noise-snr-db", type=float, default=None,
                   help="emit noise-mixed copies at this target SNR")
    p.add_argument("--speed", action="store_true",
                   help="emit 0.9x/1.1x speed-perturbed copies")
    p.add_argument("--include-originals", action="store_true",
                   help="also copy the input rows into the output corpus")
    args = p.parse_args(argv)
    if args.noise_snr_db is None and not args.speed:
        p.error("nothing to do: pass --noise-snr-db and/or --speed")

    from curator_spark.ops import multimodal
    from curator_spark.session import build_session

    spark = build_session(master=args.master, app_name="curator_augment")
    t0 = time.monotonic()
    src = spark.read.parquet(args.input)
    parts = []
    if args.noise_snr_db is not None:
        parts.append(multimodal.augment_mix_stage(src, args.noise_snr_db))
    if args.speed:
        parts.append(multimodal.speed_perturb_stage(src))
    aug = parts[0]
    for extra in parts[1:]:
        aug = aug.unionByName(extra)
    # observe() counts quarantined rows DURING the output write — a
    # separate count() would re-run the whole decode+augment+encode DAG
    # a second time just to count failures
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation("augment_metrics")
    aug = aug.observe(
        obs,
        F.count(F.lit(1)).alias("n_aug"),
        F.sum(F.col("decode_ok").cast("long")).alias("n_ok"),
    )
    kept = aug.filter("decode_ok").select(*CLIP_COLS)
    if args.include_originals:
        kept = src.select(*CLIP_COLS).unionByName(kept)
    kept.write.mode("overwrite").parquet(args.output)

    n_in = src.count()  # parquet count() is row-group metadata, not a scan
    n_out = spark.read.parquet(args.output).count()
    m = obs.get
    n_quarantined = int(m["n_aug"]) - int(m["n_ok"] or 0)
    print(json.dumps({
        "input_rows": n_in,
        "output_rows": n_out,
        "quarantined": n_quarantined,
        "wall_sec": round(time.monotonic() - t0, 2),
        "output": args.output,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
