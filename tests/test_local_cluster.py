"""Multi-executor execution: the full pipeline on ``local-cluster``.

``local-cluster[W,C,M]`` launches W REAL executor JVMs (separate
processes with their own Python workers) — unlike ``local[N]``, this
exercises the actual multi-executor paths the north rule targets:
closure/UDF serialization to remote workers, broadcast distribution,
shuffle over the block manager, and worker-side PYTHONPATH resolution.
Labels must be bit-identical to local mode (partitioning invariance is
already asserted; this asserts EXECUTOR-BOUNDARY invariance).

Runs in a subprocess because a JVM already holding a local-mode session
cannot host a second master (getOrCreate would silently reuse it).
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import sys
sys.path.insert(0, sys.argv[3])
from curator_spark.session import build_session
from curator_spark.catalog import ParquetCatalog
from curator_spark.config import PipelineConfig
from curator_spark.pipeline import Pipeline

inp, wh = sys.argv[1], sys.argv[2]
spark = build_session(master="local-cluster[2,4,2048]", app_name="lc_pipeline")
cfg = PipelineConfig(n_partitions=8, commit_batches=2)
pipe = Pipeline(spark, ParquetCatalog(spark, wh), cfg)
pipe.run(inp)
n = pipe.output().count()
spark.stop()
print("LC_ROWS", n)
"""


def test_pipeline_on_real_executors_matches_local(spark, workdir):
    from pyspark.sql import functions as F  # noqa: F401

    from curator_spark.catalog import ParquetCatalog
    from curator_spark.config import PipelineConfig
    from curator_spark.pipeline import Pipeline
    from curator_spark.synth import clips

    n = 240
    inp = os.path.join(workdir, "clips_in")
    clips.write_clips(spark, n, inp)

    # golden: local-mode run in THIS session
    cfg = PipelineConfig(n_partitions=8, commit_batches=2)
    golden_pipe = Pipeline(spark, ParquetCatalog(spark, os.path.join(workdir, "wh_local")), cfg)
    golden_pipe.run(inp)
    golden = {
        r["clip_id"]: (r["keep"], r["scrubbed_transcript"], r["lang"])
        for r in golden_pipe.output().collect()
    }

    # multi-executor: same job on 2 real executor JVMs in a subprocess
    wh_lc = os.path.join(workdir, "wh_lc")
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, inp, wh_lc, REPO],
        capture_output=True, text=True, timeout=600, cwd=REPO,
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"},
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert f"LC_ROWS {n}" in out.stdout

    lc = {
        r["clip_id"]: (r["keep"], r["scrubbed_transcript"], r["lang"])
        for r in spark.read.parquet(os.path.join(wh_lc, "clips_labeled")).collect()
    }
    assert lc == golden  # executor-boundary invariance, bit-exact


# one query per distinct execution shape: HOF aggregate chain, collect_set
# + window-over-rollup, conditional-agg top-k, Expand grouping sets, scan
# predicate sampling, fused MapInPandas decode (Python workers on REMOTE
# executors via the addPyFile zip), persisted-bucket LSH self-join
LC_QUERIES = (
    "events_funnel",
    "retention_cohorts",
    "heavy_hitters_sample",
    "events_cube",
    "weighted_sample_docs",
    "audio_level_stats",
    "minhash_dup_pairs",
)

QUERY_RUNNER = r"""
import sys
sys.path.insert(0, sys.argv[1])
from curator_spark.session import build_session
import __spark_entry__ as entrymod
from tools.verify_oracles import norm, value_hash

spark = build_session(master="local-cluster[2,4,2048]", app_name="lc_queries")
qs = entrymod.queries()
for name in sys.argv[3:]:
    h = value_hash(norm(qs[name](spark, sys.argv[2]).toPandas()))
    print(f"LC_HASH {name} {h}")
spark.stop()
"""


def test_gate_queries_on_real_executors_match_local(spark):
    """Executor-boundary invariance for the OPERATOR family (not just the
    pipeline): the same gate queries on 2 real executor JVMs must
    value-hash identically to this session's local-mode run — shuffles,
    broadcasts, and Arrow batches all cross real process boundaries."""
    import __spark_entry__ as entrymod
    from tools.verify_oracles import norm, value_hash

    sf_dir = "/root/testdata/sf0.001"
    qs = entrymod.queries()
    golden = {
        name: value_hash(norm(qs[name](spark, sf_dir).toPandas())) for name in LC_QUERIES
    }

    out = subprocess.run(
        [sys.executable, "-c", QUERY_RUNNER, REPO, sf_dir, *LC_QUERIES],
        capture_output=True, text=True, timeout=900, cwd=REPO,
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"},
    )
    assert out.returncode == 0, out.stderr[-3000:]
    got = dict(
        line.split()[1:3] for line in out.stdout.splitlines() if line.startswith("LC_HASH")
    )
    assert got == golden
