"""Generic VectorMap stage: retry, poisoned-row isolation, fan-out, order
restoration — the reference's LLM/CodeExecutor lifecycle semantics
(SURVEY.md §2.2 M2/M4, §2.8 T2)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from curator_spark.api import VectorMap, failed, fingerprint_fn, ok


def _mk_df(spark, n=40):
    return spark.createDataFrame(
        pd.DataFrame({"row_key": range(n), "x": [i * 10 for i in range(n)]})
    ).repartition(4)


def test_vector_map_happy_path_and_order(spark):
    stage = VectorMap(
        name="double",
        fn=lambda pdf: pdf.assign(y=pdf["x"] * 2)[["row_key", "y"]],
        out_schema="row_key long, y long",
    )
    out = ok(stage(_mk_df(spark))).orderBy("row_key").collect()
    assert [r["y"] for r in out] == [i * 20 for i in range(40)]


def test_vector_map_poisoned_rows_isolated(spark):
    def poison(pdf: pd.DataFrame) -> pd.DataFrame:
        if (pdf["x"] % 170 == 0).any() and (pdf["x"] > 0).any():
            bad = pdf[(pdf["x"] % 170 == 0) & (pdf["x"] > 0)]
            if len(bad):
                raise ValueError(f"poisoned: {sorted(bad['x'])}")
        return pdf.assign(y=pdf["x"] + 1)[["row_key", "y"]]

    stage = VectorMap(name="poison", fn=poison, out_schema="row_key long, y long")
    res = stage(_mk_df(spark))
    good = ok(res)
    bad = failed(res)
    # x in {170, 340} (rows 17, 34) are poisoned; everything else survives
    assert sorted(r["row_key"] for r in bad.collect()) == [17, 34]
    assert bad.head()["_error"].startswith("ValueError")
    assert good.count() == 38
    assert good.filter(F.col("row_key") == 16).head()["y"] == 161


def test_vector_map_fanout(spark):
    def explode_tokens(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, x in zip(pdf["row_key"], pdf["x"]):
            for j in range(int(k) % 3):  # 0..2 output rows per input row
                rows.append({"row_key": k, "j": j, "x": x})
        return pd.DataFrame(rows, columns=["row_key", "j", "x"])

    stage = VectorMap(
        name="fanout", fn=explode_tokens, out_schema="row_key long, j long, x long"
    )
    out = ok(stage(_mk_df(spark, 9)))
    # sum over k in 0..8 of (k % 3) = 0+1+2+0+1+2+0+1+2 = 9
    assert out.count() == 9
    assert out.filter(F.col("row_key") == 5).count() == 2


def test_fingerprint_tracks_source(spark):
    f1 = lambda pdf: pdf  # noqa: E731
    f2 = lambda pdf: pdf.assign(z=1)  # noqa: E731
    assert fingerprint_fn(f1) != fingerprint_fn(f2)
    assert fingerprint_fn(f1) == fingerprint_fn(f1)


def test_vector_map_nested_ddl_quarantine(spark):
    """out_schema with comma-bearing nested types (map<,>, decimal(p,s))
    must parse correctly so the quarantine path emits the right columns."""
    def always_fail(pdf: pd.DataFrame) -> pd.DataFrame:
        raise RuntimeError("boom")

    stage = VectorMap(
        name="nested",
        fn=always_fail,
        out_schema="row_key long, metrics map<string,double>, amt decimal(10,2)",
        retries=1,
    )
    res = stage(_mk_df(spark, 8))
    bad = failed(res)
    assert bad.count() == 8
    assert set(res.columns) == {"row_key", "metrics", "amt", "_error"}
    assert bad.head()["_error"].startswith("RuntimeError")


def test_run_with_retries_recovers_transient_failures(spark, tmp_path):
    """T2/F2 retry sub-DAG: rows that fail transiently (first attempt only)
    are quarantined by pass 1 and recovered by pass 2; the merged output
    has no _error rows and correct values (≙ rewrite-response-file-minus-
    failures, base_request_processor.py:508-537)."""
    from curator_spark.api import run_with_retries

    marker_dir = str(tmp_path)

    def flaky(pdf: pd.DataFrame) -> pd.DataFrame:
        """Rows with row_key % 7 == 0 fail until their singleton bisect
        attempt has happened (marker written only at len==1, so the row is
        deterministically quarantined in pass 1 and recovers in pass 2)."""
        import os

        bad = [
            int(k)
            for k in pdf["row_key"]
            if int(k) % 7 == 0 and not os.path.exists(os.path.join(marker_dir, f"seen_{int(k)}"))
        ]
        if bad:
            if len(pdf) == 1:
                open(os.path.join(marker_dir, f"seen_{bad[0]}"), "w").close()
            raise ValueError(f"transient {bad}")
        return pdf.assign(y=pdf["x"] + 5)[["row_key", "y"]]

    stage = VectorMap(name="flaky", fn=flaky, out_schema="row_key long, y long", retries=1)
    first = stage(_mk_df(spark, 30)).persist()
    assert sorted(r["row_key"] for r in failed(first).collect()) == [0, 7, 14, 21, 28]
    first.unpersist()
    # fresh markers for the measured run: wipe and go through the sub-DAG
    import os, shutil  # noqa: E401

    shutil.rmtree(marker_dir)
    os.makedirs(marker_dir)
    out = run_with_retries(stage, _mk_df(spark, 30), max_passes=3).persist()
    rows = out.orderBy("row_key").collect()
    out.unpersist()
    assert all(r["_error"] is None for r in rows)
    assert [r["y"] for r in rows] == [i * 10 + 5 for i in range(30)]


def test_vector_map_per_row_params_override(spark):
    """M8: per-row params map merged over stage defaults
    (≙ prompt_formatter.py:101-112)."""
    df = spark.createDataFrame(
        pd.DataFrame({"row_key": [0, 1, 2], "x": [5, 5, 5]})
    ).withColumn(
        "params",
        F.when(F.col("row_key") == 1, F.create_map(F.lit("mult"), F.lit(10))),
    )

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["row_key"]].copy()
        out["y"] = [int(x) * int(p["mult"]) for x, p in zip(pdf["x"], pdf["_params"])]
        return out

    stage = VectorMap(
        name="scale",
        fn=scale,
        out_schema="row_key long, y long",
        defaults=(("mult", 2),),
        params_col="params",
    )
    got = {r["row_key"]: r["y"] for r in ok(stage(df)).collect()}
    assert got == {0: 10, 1: 50, 2: 10}  # row 1 overrides mult=10


def test_code_exec_stage(spark):
    """M7: per-row sandboxed code execution via subprocess pool."""
    from curator_spark.api import code_exec_stage

    rows = pd.DataFrame(
        {
            "row_key": [0, 1, 2],
            "code": [
                "import sys; print(int(sys.stdin.read()) * 2)",
                "print('hello')",
                "import sys; sys.exit(3)",
            ],
            "stdin": ["21", "", ""],
        }
    )
    df = spark.createDataFrame(rows).repartition(2)
    out = {r["row_key"]: r for r in ok(code_exec_stage()(df)).collect()}
    assert out[0]["stdout"].strip() == "42" and out[0]["exit_code"] == 0
    assert out[1]["stdout"].strip() == "hello"
    assert out[2]["exit_code"] == 3


def test_run_query_cli():
    """jobs/run_query.py: --list enumerates the registry; a named query
    runs in a subprocess session and writes its parquet output."""
    import json
    import os
    import subprocess
    import sys
    import tempfile

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "SPARK_GRAFT_CPUS": "8"}
    listing = subprocess.run(
        [sys.executable, "jobs/run_query.py", "--list"],
        capture_output=True, text=True, timeout=120, cwd=repo, env=env,
    )
    assert listing.returncode == 0
    names = listing.stdout.split()
    assert "events_funnel" in names and "clip_keep_summary" in names

    with tempfile.TemporaryDirectory() as td:
        out = subprocess.run(
            [sys.executable, "jobs/run_query.py", "--name", "topk_events",
             "--sf-dir", "/root/testdata/sf0.001", "--master", "local[4]",
             "--output", os.path.join(td, "topk")],
            capture_output=True, text=True, timeout=600, cwd=repo, env=env,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        rec = json.loads(out.stdout.strip().splitlines()[-1])
        assert rec["rows"] == 20 and rec["query"] == "topk_events"


def test_sql_face_matches_dataframe_op(spark):
    """register_views exposes the tables to spark.sql; an ANSI statement
    over them matches the DataFrame operator row for row."""
    from curator_spark.ops import register_views, relational

    sf = "/root/testdata/sf0.001"
    register_views(spark, sf)
    via_sql = spark.sql(
        "SELECT event_type, COUNT(*) AS n, "
        "CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value "
        "FROM events GROUP BY event_type ORDER BY event_type"
    ).collect()
    via_df = relational.status_counters(spark, sf).collect()
    assert via_sql == via_df


def test_run_augment_cli(spark, workdir):
    """jobs/run_augment.py: clips in → (originals + noise + 2 speeds)
    out, zero quarantined on the clean seeded batch, pipeline schema."""
    import json
    import os
    import subprocess
    import sys

    from curator_spark.synth import clips

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    inp = os.path.join(workdir, "aug_in")
    clips.write_clips(spark, 50, inp)
    out_dir = os.path.join(workdir, "aug_out")
    res = subprocess.run(
        [sys.executable, "jobs/run_augment.py", "--input", inp, "--output", out_dir,
         "--noise-snr-db", "20", "--speed", "--include-originals",
         "--master", "local[4]"],
        capture_output=True, text=True, timeout=600, cwd=repo,
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"},
    )
    assert res.returncode == 0, res.stderr[-2000:]
    rec = json.loads(res.stdout.strip().splitlines()[-1])
    assert rec["input_rows"] == 50 and rec["output_rows"] == 200
    assert rec["quarantined"] == 0
    aug = spark.read.parquet(out_dir)
    src = spark.read.parquet(inp)
    assert set(aug.columns) == set(src.columns)  # pipeline-ready schema


def test_run_augment_cli_counts_quarantine_without_recompute(spark, workdir):
    """Quarantine counting rides the output write via observe() — it must
    still be exact when rows DO quarantine (one NULL-sr_hz input row
    poisons all 3 of its augmented copies, which are excluded from the
    output corpus)."""
    import json
    import os
    import subprocess
    import sys

    from pyspark.sql import functions as F

    from curator_spark.synth import clips

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    inp = os.path.join(workdir, "aug_in_bad")
    clean = os.path.join(workdir, "aug_in_clean")
    clips.write_clips(spark, 20, clean)
    src = spark.read.parquet(clean)
    bad_id = src.orderBy("clip_id").first()["clip_id"]
    src.withColumn(
        "sr_hz",
        F.when(F.col("clip_id") == bad_id, F.lit(None)).otherwise(F.col("sr_hz")),
    ).write.parquet(inp)
    out_dir = os.path.join(workdir, "aug_out_bad")
    res = subprocess.run(
        [sys.executable, "jobs/run_augment.py", "--input", inp, "--output", out_dir,
         "--noise-snr-db", "20", "--speed", "--master", "local[4]"],
        capture_output=True, text=True, timeout=600, cwd=repo,
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"},
    )
    assert res.returncode == 0, res.stderr[-2000:]
    rec = json.loads(res.stdout.strip().splitlines()[-1])
    assert rec["input_rows"] == 20
    assert rec["quarantined"] == 3  # noise + 2 speed copies of the bad row
    assert rec["output_rows"] == 19 * 3


def test_vector_map_fingerprint_sees_closure_and_retries():
    """Two stages from the same factory with different captured
    parameters share SOURCE — the fingerprint must still differ, or a
    cache/resume layer would serve one configuration's results for the
    other. Same parameters ⇒ same fingerprint (the cache must still
    hit across rebuilds)."""
    from curator_spark.api import code_exec_stage

    fast = code_exec_stage(timeout_s=1.0)
    slow = code_exec_stage(timeout_s=600.0)
    again = code_exec_stage(timeout_s=1.0)
    assert fast.fingerprint == again.fingerprint
    assert fast.fingerprint != slow.fingerprint
    # retries is part of the identity too (it changes quarantine output)
    assert fast.fingerprint != code_exec_stage(timeout_s=1.0, retries=3).fingerprint


def test_vector_map_retries_means_retries(spark):
    """retries=N ⇒ 1 initial attempt + N whole-batch re-tries before
    bisecting, per the documented contract: a batch that fails exactly
    once must succeed on the retry without any per-row sub-runs (which
    would re-execute every row)."""
    import os
    import tempfile

    import pandas as pd

    from curator_spark import api

    marker_dir = tempfile.mkdtemp()

    def flaky(pdf: pd.DataFrame) -> pd.DataFrame:
        marker = os.path.join(marker_dir, f"b{int(pdf['row_key'].iloc[0])}")
        with open(marker, "a") as fh:
            fh.write("x")
        if os.path.getsize(marker) == 1:
            raise RuntimeError("transient")
        out = pdf[["row_key"]].copy()
        out["v"] = pdf["row_key"] * 2
        return out

    stage = api.VectorMap(
        name="flaky", fn=flaky, out_schema="row_key long, v long", retries=1
    )
    df = spark.createDataFrame([(i,) for i in range(8)], "row_key long").coalesce(1)
    rows = stage(df).collect()
    assert all(r["_error"] is None for r in rows) and len(rows) == 8
    # exactly 2 attempts (initial + 1 retry), batch never bisected: ONE
    # marker file with 2 writes
    markers = os.listdir(marker_dir)
    assert len(markers) == 1
    assert os.path.getsize(os.path.join(marker_dir, markers[0])) == 2


def test_ingest_dicts_with_missing_keys_keep_integer_types(spark):
    """List-of-dicts ingest with non-uniform keys: the missing value must
    arrive as a NULL, not drag the whole column to double via pandas
    NaN-fill (id=1 must not round-trip as 1.0/DoubleType — a later join
    against a long doc_id would silently cast)."""
    from curator_spark import ingest

    df = ingest.to_dataframe(spark, [{"id": 1, "x": "a"}, {"x": "b"}])
    assert dict(df.dtypes)["id"] == "bigint"
    rows = {r["x"]: r["id"] for r in df.collect()}
    assert rows == {"a": 1, "b": None}


def test_ingest_dicts_with_all_null_key(spark):
    """A key that is None in EVERY row (an always-empty optional field)
    gives Spark's inference no type evidence anywhere — it must default
    to a NULL string column, not crash createDataFrame."""
    from curator_spark import ingest

    df = ingest.to_dataframe(spark, [{"id": 1, "note": None}, {"id": 2, "note": None}])
    assert df.columns == ["id", "note"]
    assert dict(df.dtypes) == {"id": "bigint", "note": "string"}
    assert [r["note"] for r in df.orderBy("id").collect()] == [None, None]
    # degenerate shape: EVERY key all-None
    df2 = ingest.to_dataframe(spark, [{"a": None}, {"a": None}])
    assert df2.count() == 2 and dict(df2.dtypes) == {"a": "string"}


def test_ingest_csv_roundtrip_embedded_newline(spark, tmp_path):
    """CSV read-back uses the same RFC-4180 options the export side
    writes with: a transcript containing '\\n' and '\"' must survive as
    ONE row, not split into garbage rows."""
    from curator_spark import ingest

    path = str(tmp_path / "t.csv")
    df = spark.createDataFrame(
        [(1, 'line one\nline "two"'), (2, "plain")], ["id", "text"]
    )
    df.coalesce(1).write.option("header", True).option("escape", '"').csv(path)
    back = ingest.to_dataframe(spark, path)
    rows = {r["id"]: r["text"] for r in back.collect()}
    assert len(rows) == 2
    assert rows[1] == 'line one\nline "two"'


def test_fingerprint_stable_for_default_repr_captures():
    """A captured object with the default '<Foo object at 0x..>' repr must
    NOT leak its per-process address into the stage fingerprint — that
    would bust cache/resume on every rerun of an identical pipeline."""
    from curator_spark.api import _closure_repr, fingerprint_fn

    class Handle:  # default repr embeds id(self)
        pass

    def factory(h):
        def fn(pdf):
            return (h, pdf)

        return fn

    a, b = factory(Handle()), factory(Handle())
    assert repr(a.__closure__[0].cell_contents) != repr(b.__closure__[0].cell_contents)
    assert _closure_repr(a) == _closure_repr(b)
    assert fingerprint_fn(a) == fingerprint_fn(b)

    # ...but two captures with DIFFERENT state must NOT collide — that
    # would be a silent wrong cache HIT (resume serving the other
    # configuration's results), worse than the instability it fixes
    class Cfg:
        def __init__(self, env):
            self.env = env

    prod, staging = factory(Cfg("prod")), factory(Cfg("staging"))
    assert _closure_repr(prod) != _closure_repr(staging)
    assert _closure_repr(prod) == _closure_repr(factory(Cfg("prod")))


def test_fingerprint_slots_and_sourceless_callables():
    """Round-5 ADVICE: (a) a captured __slots__ instance has no __dict__,
    so its state must be harvested from the slot declarations (walking
    the MRO) — otherwise two differently-configured captures collapse
    into one fingerprint, the silent wrong cache HIT; (b) a source-less
    callable (eval/exec-compiled, REPL lambda) must fingerprint by its
    compiled body, not its qualname — two different lambdas both named
    '<lambda>' must not collide."""
    from curator_spark.api import _closure_repr, _stable_repr, fingerprint_fn

    class SlotBase:
        __slots__ = ("base_env",)

    class SlotCfg(SlotBase):  # slots split across the MRO
        __slots__ = ("rate",)

        def __init__(self, base_env, rate):
            self.base_env = base_env
            self.rate = rate

    def factory(h):
        def fn(pdf):
            return (h, pdf)

        return fn

    prod, staging = factory(SlotCfg("prod", 1)), factory(SlotCfg("staging", 2))
    assert _closure_repr(prod) != _closure_repr(staging)
    assert _closure_repr(prod) == _closure_repr(factory(SlotCfg("prod", 1)))
    # address-stability still holds: same state, different instances
    assert "0x" not in _stable_repr(SlotCfg("prod", 1)) or " at 0x" not in (
        _stable_repr(SlotCfg("prod", 1))
    )

    # a declared-but-never-assigned slot must not blow up the repr
    class Lazy:
        __slots__ = ("maybe",)

    assert "Lazy" in _stable_repr(Lazy())

    f1 = eval("lambda x: x + 1")
    f2 = eval("lambda x: x - 1")
    f1b = eval("lambda x: x + 1")
    for f in (f1, f2):
        try:
            import inspect

            inspect.getsource(f)
            raise AssertionError("expected source-less callable")
        except OSError:
            pass
    assert fingerprint_fn(f1) != fingerprint_fn(f2)
    assert fingerprint_fn(f1) == fingerprint_fn(f1b)
