"""SparkSession factory tuned for the curation pipeline.

Local sandbox runs on ``local[N]`` (single JVM); on a real cluster the same
builder is used by ``spark-submit --py-files curator_spark.zip job.py``.

Scale rationale (100 TB / 1000 executors):
- AQE on: runtime coalescing + skew-join splitting replaces hand-tuned
  shuffle partition counts per stage.
- Arrow batches capped at 2k rows: clip rows carry binary audio payloads
  (10s of KB each); a 10k-row Arrow batch of audio would be ~0.5-1 GB per
  Python worker. 2k rows keeps the decode UDF's peak (bytes + float64 PCM)
  well under worker memory.
- ``maxPartitionBytes`` left at default 128 MB: parquet scan tasks stay
  executor-memory-sized regardless of total table size.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    master: str | None = None,
    app_name: str = "curator_spark",
    shuffle_partitions: int | None = None,
    arrow_max_records: int = 2048,
    extra_conf: dict[str, str] | None = None,
    builder_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build the session.

    If the environment provides an Iceberg runtime jar
    (``CURATOR_SPARK_ICEBERG_JAR``) a local Hadoop-catalog Iceberg catalog
    named ``curator`` is configured; otherwise the engine falls back to the
    parquet+manifest catalog in :mod:`curator_spark.catalog` (same commit
    semantics, no external jars — the sandbox image has none).
    """
    # Python WORKERS inherit PYTHONPATH from the environment, not the
    # driver's sys.path — a driver that found this package via
    # sys.path.insert from another cwd would spawn workers that cannot
    # unpickle curator_spark UDFs. Export the package root before the JVM
    # (and its worker factory) starts. No-op under spark-submit --py-files.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = pkg_root + (os.pathsep + pp if pp else "")

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else cpus
        # local[N,maxFailures] / local-cluster[n,c,m] carry extra
        # comma-separated fields — only the first is the thread count
        n = n.split(",", 1)[0]
        shuffle_partitions = (os.cpu_count() or 8) if n == "*" else int(n)

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_max_records))
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # Vectorized-reader batches are rows×row-size memory: the default
        # 4096 rows × ~33 KB audio bytes ≈ 135 MB *per scan task* — 32 local
        # tasks OOM a small heap instantly. 512 bounds scan memory to
        # ~17 MB/task for clip-sized rows; at 100 TB the same bound holds
        # per executor core regardless of table size.
        .config("spark.sql.parquet.columnarReaderBatchSize", "512")
        # NOTE: only honored when the JVM starts in-process (python jobs/...);
        # under spark-submit pass --driver-memory explicitly.
        .config("spark.driver.memory", os.environ.get("CURATOR_SPARK_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )

    iceberg_jar = os.environ.get("CURATOR_SPARK_ICEBERG_JAR")
    if iceberg_jar:  # pragma: no cover - no jar in sandbox image
        warehouse = os.environ.get("CURATOR_SPARK_WAREHOUSE", "/tmp/curator_warehouse")
        b = (
            b.config("spark.jars", iceberg_jar)
            .config(
                "spark.sql.extensions",
                "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
            )
            .config("spark.sql.catalog.curator", "org.apache.iceberg.spark.SparkCatalog")
            .config("spark.sql.catalog.curator.type", "hadoop")
            .config("spark.sql.catalog.curator.warehouse", warehouse)
        )

    # builder_conf: settings that only take effect at SparkContext startup
    # (e.g. spark.ui.showConsoleProgress) — runtime conf.set is too late
    if builder_conf:
        for k, v in builder_conf.items():
            b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if extra_conf:
        for k, v in extra_conf.items():
            spark.conf.set(k, v)
    return spark
