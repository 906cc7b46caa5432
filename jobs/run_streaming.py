"""spark-submit entry point for the streaming curation pipeline.

Continuous ingest topology: new clip parquet files landing in --input are
scored exactly once (file-stream source + checkpointLocation; per-batch
idempotent writes), labeled output accumulates under --output partitioned
by (batch_id, part_key).

    spark-submit --py-files /tmp/curator_spark.zip --driver-memory 8g \
        jobs/run_streaming.py --input /path/landing --output /path/labeled \
        --checkpoint /path/ckpt [--follow]

Default is a one-shot drain (Trigger.AvailableNow — process the backlog,
then exit 0); --follow keeps the query running for true continuous ingest.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="landing dir of clip parquet files")
    p.add_argument("--output", required=True, help="labeled output dir")
    p.add_argument("--checkpoint", required=True, help="streaming checkpoint dir")
    p.add_argument("--master", default=None)
    p.add_argument("--n-partitions", type=int, default=64)
    p.add_argument("--max-files-per-trigger", type=int, default=8)
    p.add_argument("--follow", action="store_true", help="run until killed")
    p.add_argument(
        "--metrics-dir",
        default=None,
        help="also drain the durable hourly keep-rate rollup into DIR "
        "(restartable; checkpoint lives under DIR/_checkpoint)",
    )
    args = p.parse_args(argv)

    from curator_spark import streaming
    from curator_spark.config import PipelineConfig
    from curator_spark.session import build_session

    spark = build_session(master=args.master, app_name="curator_spark_streaming")
    cfg = PipelineConfig(n_partitions=args.n_partitions)
    t0 = time.monotonic()
    q = streaming.stream_pipeline(
        spark,
        args.input,
        args.output,
        args.checkpoint,
        cfg,
        max_files_per_trigger=args.max_files_per_trigger,
        available_now=not args.follow,
    )
    q.awaitTermination()
    wall = time.monotonic() - t0
    try:
        n = spark.read.parquet(args.output).count()
    except Exception:  # zero batches fired -> output dir was never created
        n = 0
    n_windows = None
    if args.metrics_dir and n:
        qm = streaming.stream_hourly_metrics(
            spark,
            args.output,
            os.path.join(args.metrics_dir, "_checkpoint"),
            output_dir=args.metrics_dir,
        )
        qm.awaitTermination()
        n_windows = streaming.read_hourly_metrics(spark, args.metrics_dir).count()
    print(
        json.dumps(
            {"rows_labeled_total": n, "wall_sec": round(wall, 2), "metric_windows": n_windows}
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
