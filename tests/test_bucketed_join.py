"""Bucketed co-located join — the pre-shuffle technique for repeated big
joins (SURVEY §2.4 note: bucketing ≙ the reference's chunk-aligned request/
response files that never need a redistribution).

At 100 TB, joining clips↔labels (or orders↔lineitem) on every run would
shuffle both sides each time; bucketing both tables by the join key at
write time makes every subsequent join shuffle-free."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F


def test_bucketed_join_is_shuffle_free(spark, workdir):
    sf_dir = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    spark.sql("DROP TABLE IF EXISTS bktest.orders_b")
    spark.sql("DROP TABLE IF EXISTS bktest.lineitem_b")
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("bktest.orders_b")
    )
    (
        li.withColumnRenamed("l_orderkey", "o_orderkey")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("bktest.lineitem_b")
    )

    a = spark.table("bktest.orders_b")
    b = spark.table("bktest.lineitem_b")
    joined = a.join(b, "o_orderkey").groupBy("o_orderstatus").agg(
        F.count("*").alias("n")
    )

    buf = io.StringIO()
    with redirect_stdout(buf):
        joined.explain()
    plan = buf.getvalue()
    # both scan sides feed the join without an Exchange: bucket layout
    # satisfies the join's distribution requirement
    join_part = plan.split("Join")[1] if "Join" in plan else plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan, plan

    # and the result is right
    expect = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus").agg(F.count("*").alias("n"))
    )
    got = {r["o_orderstatus"]: r["n"] for r in joined.collect()}
    want = {r["o_orderstatus"]: r["n"] for r in expect.collect()}
    assert got == want
    spark.sql("DROP TABLE IF EXISTS bktest.orders_b")
    spark.sql("DROP TABLE IF EXISTS bktest.lineitem_b")
