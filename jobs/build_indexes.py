"""spark-submit entry point for the materialized index builds.

At real scale the ANN and dedup indexes are built ONCE per corpus
snapshot as their own jobs and then served to every consumer — the
ensure-* wrappers the gate queries use are the build-if-missing local
convenience, not the production story. This job is that story::

    cd /root/repo && zip -qr /tmp/curator_spark.zip curator_spark
    spark-submit --py-files /tmp/curator_spark.zip --driver-memory 8g \
        jobs/build_indexes.py --sf-dir /root/testdata/sf0.1 \
        --out /tmp/indexes --kinds ivf,lsh,dedup

Outputs, each under ``<out>/<kind>``:

- ``ivf``   — embeddings hive-partitioned by nearest-centroid cell +
              ``centroids.json`` (query = partition pruning;
              similarity.build_ivf_index)
- ``lsh``   — embeddings per (band, bgrp) with bkey sorted in-file
              (two-level pruning; similarity.build_lsh_index)
- ``dedup`` — MinHash-LSH component labels (doc_id, group_id,
              is_canonical) hive-partitioned by doc-hash bucket
              (dedup.build_dedup_index)
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
    p.add_argument("--sf-dir", required=True, help="table directory (documents/embeddings parquet)")
    p.add_argument("--out", required=True, help="index output root")
    p.add_argument(
        "--kinds",
        default="ivf,lsh,dedup",
        help="comma list of indexes to build: ivf,lsh,dedup",
    )
    p.add_argument("--master", default=None)
    p.add_argument("--n-cells", type=int, default=16, help="IVF cell count")
    args = p.parse_args(argv)

    from curator_spark.session import build_session

    spark = build_session(master=args.master, app_name="curator_spark_build_indexes")
    built = {}
    for kind in [k.strip() for k in args.kinds.split(",") if k.strip()]:
        dest = os.path.join(args.out, kind)
        t0 = time.monotonic()
        if kind == "ivf":
            from curator_spark.ops.similarity import build_ivf_index

            build_ivf_index(spark, args.sf_dir, dest, n_cells=args.n_cells)
        elif kind == "lsh":
            from curator_spark.ops.similarity import build_lsh_index

            build_lsh_index(spark, args.sf_dir, dest)
        elif kind == "dedup":
            from curator_spark.ops.dedup import build_dedup_index

            build_dedup_index(spark, args.sf_dir, dest)
        else:
            raise SystemExit(f"unknown index kind {kind!r} (ivf,lsh,dedup)")
        built[kind] = {"path": dest, "build_sec": round(time.monotonic() - t0, 2)}
    print(json.dumps({"sf_dir": args.sf_dir, "built": built}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
