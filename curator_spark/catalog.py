"""Table catalog abstraction — Iceberg on a real cluster, parquet locally.

The engine's commit model needs three table capabilities (the analogs of
the reference's on-disk exchange + metadata layers, SURVEY.md §1.1):

1. snapshot identity for cache fingerprints (≙ dataset fingerprint,
   ``llm/llm.py:139-164``)
2. idempotent partition overwrite for resumable stage output (≙ response-
   file rewrite, ``base_request_processor.py:508-537``)
3. append for checkpoint/audit logs (≙ ``batch_objects.jsonl`` appends,
   ``base_batch_request_processor.py:334-343``)

``IcebergCatalog`` maps these to real Iceberg (snapshot ids,
``overwritePartitions``, ``append``) when the runtime jar is configured
(see session.py). The sandbox image has no Iceberg jar, so
``ParquetCatalog`` provides the same contract on plain parquet:
snapshot id = digest of the file listing, partition overwrite via Spark's
dynamic ``partitionOverwriteMode`` (atomic per-partition directory swap).
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def dir_snapshot_id(path: str) -> str:
    """Deterministic content identity of a parquet directory: blake2b over
    the sorted (relative-path, size, mtime_ns) listing. Stands in for an
    Iceberg snapshot id in the sandbox. mtime is included so a file
    rewritten with different contents but an identical byte count still
    changes the fingerprint (size alone would silently serve stale
    cached results)."""
    if not os.path.isdir(path):
        # a non-walkable path (missing dir, or an object-store URI this
        # local stand-in cannot list) must NOT hash to the same constant
        # for every such input — two different s3:// tables would share a
        # run fingerprint and serve each other's cached output. Include
        # the path itself; real remote tables get identity from
        # IcebergCatalog.snapshot_id instead.
        return hashlib.blake2b(f"nonlocal:{path}".encode(), digest_size=16).hexdigest()
    entries = []
    # os.walk must be consumed LAZILY for dirs[:] pruning to take effect —
    # sorted(os.walk(...)) would materialize the whole walk first and hash
    # files under _temporary/.spark-staging subtrees the reader ignores
    # (a crashed writer's junk would then change the fingerprint of
    # logically identical data, defeating resume exactly after a crash).
    # Determinism comes from sorting the collected entries instead.
    for root, dirs, files in os.walk(path):
        # prune hidden DIRECTORIES too (Spark's reader semantics)
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in files:
            if f.startswith(("_", ".")):
                continue
            full = os.path.join(root, f)
            st = os.stat(full)
            entries.append((os.path.relpath(full, path), st.st_size, st.st_mtime_ns))
    h = hashlib.blake2b(digest_size=16)
    for rel, size, mtime_ns in sorted(entries):
        h.update(f"{rel}:{size}:{mtime_ns}".encode())
    return h.hexdigest()


@dataclass
class ParquetCatalog:
    """Local-filesystem catalog with Iceberg-shaped commit semantics."""

    spark: SparkSession
    root: str

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        # any parquet part file or hive-style partition subdir counts —
        # hardcoding part_key= would report tables partitioned by other
        # columns (e.g. the run_fp= output subtrees) as missing
        p = self.path(table)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f.startswith("part-") or ("=" in f and not f.startswith("."))
            for f in os.listdir(p)
        )

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table))

    def append(self, df: DataFrame, table: str) -> None:
        df.write.mode("append").parquet(self.path(table))

    def overwrite_partitions(self, df: DataFrame, table: str, partition_col: str) -> None:
        """Idempotent per-partition replace (Iceberg: ``overwritePartitions``)."""
        (
            df.write.mode("overwrite")
            .partitionBy(partition_col)
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self.path(table))
        )

    def snapshot_id(self, table: str) -> str:
        return dir_snapshot_id(self.path(table))


@dataclass
class IcebergCatalog:  # pragma: no cover - requires the Iceberg runtime jar
    """Real-cluster catalog: tables live under a Spark SQL catalog name
    (configured in session.py). Same contract as ParquetCatalog."""

    spark: SparkSession
    namespace: str = "curator.db"

    def _fqn(self, table: str) -> str:
        return f"{self.namespace}.{table}"

    def exists(self, table: str) -> bool:
        return self.spark.catalog.tableExists(self._fqn(table))

    def read(self, table: str) -> DataFrame:
        return self.spark.read.table(self._fqn(table))

    def append(self, df: DataFrame, table: str) -> None:
        if not self.exists(table):
            df.writeTo(self._fqn(table)).create()
        else:
            df.writeTo(self._fqn(table)).append()

    def overwrite_partitions(self, df: DataFrame, table: str, partition_col: str) -> None:
        if not self.exists(table):
            df.writeTo(self._fqn(table)).partitionedBy(partition_col).create()
        else:
            df.writeTo(self._fqn(table)).overwritePartitions()

    def snapshot_id(self, table: str) -> str:
        row = (
            self.spark.sql(
                f"SELECT snapshot_id FROM {self._fqn(table)}.snapshots "
                "ORDER BY committed_at DESC LIMIT 1"
            ).head()
        )
        return str(row[0]) if row else "empty"
