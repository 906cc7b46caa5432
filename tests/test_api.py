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
