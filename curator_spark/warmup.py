"""Steady-state warmup for benchmark / scaling runs.

Two cold-start effects would otherwise dominate timed runs and make
throughput numbers meaningless:

1. **Host CPU ramp** — virtualized sandboxes (and real clusters with
   power-managed nodes) run the first parallel burst several times slower
   than steady state. A short all-core numpy burn brings every core to
   steady clock before the clock starts.
2. **JVM/Python lazy init** — whole-stage codegen compilation, the parquet
   write path (zstd contexts, committer), and one Arrow-Python worker per
   core (pyspark+pandas+numpy imports, model singletons) are all first-use
   costs. A small slice pushed through the full stage chain plus a throwaway
   partitioned write pays them once, outside the measurement window.

On a 1000-executor cluster the equivalent is simply the first few tasks of
a 100 TB job — these costs amortize to nothing at scale; the warmup exists
so *small-scale* measurements reflect the amortized regime the engine is
designed for.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _burn_one(_i: int) -> int:  # pragma: no cover - trivial
    import numpy as np

    a = np.random.rand(600, 600)
    for _ in range(8):
        a = a @ a
        a /= np.abs(a).max()
    return 0


def _cpu_burn(n_procs: int) -> None:
    import multiprocessing as mp

    with mp.Pool(n_procs) as p:
        p.map(_burn_one, range(n_procs))


def warmup(spark: SparkSession, input_path: str, rules, n_rows: int = 2000) -> None:
    """Bring the session to steady state: CPU clocks, codegen, Python
    workers, scoring-model singletons, and the partitioned parquet write
    path. Runs on a ``limit(n_rows)`` slice of the real input."""
    import os

    from . import stages

    _cpu_burn(os.cpu_count() or 8)

    par = spark.sparkContext.defaultParallelism
    # one warm task PER core: a limit() slice runs as a single task and
    # would leave every other Python worker cold (pyspark+pandas imports +
    # scoring-model build ≈ tens of seconds each inside the timed run)
    base = spark.read.parquet(input_path).limit(n_rows).repartition(par)
    base = base.withColumn("part_key", F.pmod(F.xxhash64("clip_id"), F.lit(8)).cast("int"))
    labeled = stages.apply_all(base, rules)
    tmp = tempfile.mkdtemp(prefix="curator_warmup_")
    try:
        (
            labeled.repartition(4, "part_key")
            .write.mode("overwrite")
            .partitionBy("part_key")
            .parquet(f"{tmp}/out")
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
