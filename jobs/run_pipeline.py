"""spark-submit entry point for the curation pipeline.

Cluster launch (the BASELINE.json north-rule launch mode)::

    cd /root/repo && zip -qr /tmp/curator_spark.zip curator_spark
    spark-submit --py-files /tmp/curator_spark.zip --driver-memory 8g \
        jobs/run_pipeline.py --input /path/clips --warehouse /path/wh \
        --n-partitions 4096 --commit-batches 16

(``--driver-memory`` matters: configs set by the in-process builder are
ignored once spark-submit has already launched the JVM.)

Local two-cluster-size evidence run (bench_scaling.py drives this)::

    python jobs/run_pipeline.py --master local[8]  --input ... --warehouse ...
    python jobs/run_pipeline.py --master local[32] --input ... --warehouse ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# direct `python jobs/run_pipeline.py` puts jobs/ (not the repo root) on
# sys.path; under spark-submit the package arrives via --py-files instead
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="clips parquet/Iceberg path")
    p.add_argument("--warehouse", required=True, help="output catalog root")
    p.add_argument("--master", default=None, help="override master (local runs)")
    p.add_argument("--n-partitions", type=int, default=64)
    p.add_argument("--commit-batches", type=int, default=4)
    p.add_argument("--fresh", action="store_true", help="ignore existing checkpoints")
    p.add_argument(
        "--export",
        default=None,
        metavar="DIR",
        help="after the run, export the kept rows + a generated dataset "
        "card (README.md/dataset_info.json) to DIR (SURVEY S5)",
    )
    p.add_argument(
        "--publish",
        default=None,
        metavar="DIR",
        help="after the run, publish the kept rows as a hub-layout dataset "
        "repo (split shards + SHA256SUMS + card) to DIR — the push_to_hub "
        "analog (export.publish_dataset)",
    )
    p.add_argument(
        "--warmup",
        action="store_true",
        help="pay CPU-ramp/codegen/worker cold-start before the timed run "
        "(benchmark mode; see curator_spark/warmup.py)",
    )
    p.add_argument(
        "--cost-report",
        action="store_true",
        help="after the run, print the per-stage USD rollup priced from "
        "the audit table at the default rate card (curator_spark/cost.py; "
        "the reference's per-model cost map analog)",
    )
    args = p.parse_args(argv)

    from curator_spark.catalog import ParquetCatalog
    from curator_spark.config import PipelineConfig
    from curator_spark.pipeline import Pipeline
    from curator_spark.session import build_session

    spark = build_session(master=args.master, app_name="curator_spark_pipeline")
    cfg = PipelineConfig(n_partitions=args.n_partitions, commit_batches=args.commit_batches)
    if args.fresh:
        import os
        import shutil

        # only the resume state: prior runs' outputs and audit lineage are
        # kept (deleting the whole warehouse would destroy other runs' data)
        shutil.rmtree(os.path.join(args.warehouse, "checkpoints"), ignore_errors=True)
    cat = ParquetCatalog(spark, args.warehouse)
    pipe = Pipeline(spark, cat, cfg)

    if args.warmup:
        from curator_spark.warmup import warmup

        warmup(spark, args.input, cfg.rules)

    t0 = time.monotonic()
    res = pipe.run(args.input)
    wall = time.monotonic() - t0
    n_rows = pipe.output().count()
    exported = None
    if args.export:
        from curator_spark.export import export_dataset

        exported = export_dataset(pipe, args.export)["n_rows"]
    published = None
    if args.publish:
        from curator_spark.export import publish_dataset

        published = publish_dataset(pipe, args.publish)["splits"]
    cost_rows = None
    if args.cost_report:
        cost_rows = [
            {
                "stage": r["stage"],
                "rows_in": r["rows_in"],
                "usd": r["usd"],
            }
            for r in pipe.cost_report().collect()
        ]
    # clips/sec is only meaningful when this invocation did ALL the work —
    # a cached or partially-resumed run divides total rows by partial wall
    full_run = not res.cached and res.partitions_skipped == 0
    print(
        json.dumps(
            {
                "fingerprint": res.fingerprint,
                "cached": res.cached,
                "partitions_run": res.partitions_run,
                "partitions_skipped": res.partitions_skipped,
                "rows": n_rows,
                "wall_sec": round(wall, 2),
                "clips_per_sec": round(n_rows / wall, 1) if wall > 0 and full_run else None,
                "exported_rows": exported,
                "published_splits": published,
                "stage_costs_usd": cost_rows,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
