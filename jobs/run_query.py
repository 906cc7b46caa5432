"""spark-submit entry point for any registered curation query.

Runs one `__spark_entry__.queries()` entry against a table directory and
writes or prints the result — the operator library's production face
(the pipeline job covers the flagship DAG; this covers everything else)::

    cd /root/repo && zip -qr /tmp/curator_spark.zip curator_spark
    spark-submit --py-files /tmp/curator_spark.zip --driver-memory 8g \
        jobs/run_query.py --name events_funnel \
        --sf-dir /root/testdata/sf0.1 --output /tmp/funnel_out

    python jobs/run_query.py --list          # enumerate registered queries
    python jobs/run_query.py --name topk_events --show 20
    python jobs/run_query.py --sql "SELECT event_type, count(*) n \
        FROM events GROUP BY 1 ORDER BY 1"   # ad-hoc SQL over the views
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# direct `python jobs/run_query.py` puts jobs/ (not the repo root) on
# sys.path; under spark-submit the package arrives via --py-files instead
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--name", help="query name from __spark_entry__.queries()")
    p.add_argument("--sql", help="run an ANSI SQL statement over the table views instead")
    p.add_argument("--list", action="store_true", help="print registered query names")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.1", help="table directory")
    p.add_argument("--master", default=None, help="override master (local runs)")
    p.add_argument("--output", default=None, help="write the result table here")
    p.add_argument("--format", default="parquet", choices=("parquet", "jsonl", "csv"),
                   help="output format (default parquet)")
    p.add_argument("--show", type=int, default=0, help="print the first N rows")
    args = p.parse_args(argv)

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    if args.list:
        print("\n".join(qs))
        return 0
    if bool(args.name) == bool(args.sql):
        p.error("exactly one of --name / --sql (or --list) is required")
    if args.name and args.name not in qs:
        p.error(f"unknown query {args.name!r} (use --list)")

    from curator_spark.session import build_session

    tag = args.name or "sql"
    spark = build_session(master=args.master, app_name=f"curator_query_{tag}")
    t0 = time.monotonic()
    if args.sql:
        from curator_spark.ops import register_views

        register_views(spark, args.sf_dir)
        df = spark.sql(args.sql)
    else:
        df = qs[args.name](spark, args.sf_dir)
    if args.output:
        if args.format == "parquet":
            df.write.mode("overwrite").parquet(args.output)
            n = spark.read.parquet(args.output).count()
        elif args.format == "jsonl":
            df.write.mode("overwrite").json(args.output)
            n = spark.read.schema(df.schema).json(args.output).count()
        else:
            # escape + multiLine keep embedded newlines/quotes in string
            # fields intact across the write→read round trip
            (df.write.mode("overwrite").option("header", True)
               .option("escape", '"').csv(args.output))
            n = (spark.read.option("header", True).option("escape", '"')
                 .option("multiLine", True).csv(args.output).count())
    else:
        n = df.count()
    wall = round(time.monotonic() - t0, 2)
    if args.show:
        df.show(args.show, truncate=False)
    print(json.dumps({"query": tag, "rows": n, "wall_sec": wall,
                      "sf_dir": args.sf_dir, "output": args.output}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
