"""Sink-side scale contracts: bucketed writes must buy shuffle-free
joins, and the plan itself is the evidence."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from xgboost_spark.sources.sinks import write_bucketed


def plan_of(df, mode="formatted"):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice")
    write_bucketed(li, "bt_lineitem", "l_orderkey", 4,
                   path=str(tmp_path / "li"))
    write_bucketed(orders.withColumnRenamed("o_orderkey", "l_orderkey"),
                   "bt_orders", "l_orderkey", 4,
                   path=str(tmp_path / "ord"))
    try:
        a = spark.table("bt_lineitem")
        b = spark.table("bt_orders")
        # force the shuffle-join path so the assertion is about
        # bucketing, not about broadcast kicking in at test scale
        with_conf = spark.conf
        old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = a.join(b, "l_orderkey").groupBy("l_orderkey").agg(
                F.sum("l_quantity").alias("q"),
                F.sum("o_totalprice").alias("p"))
            p = plan_of(j)
            # co-located: neither join side may re-shuffle, and the
            # groupBy on the bucket key rides the same distribution
            assert "SortMergeJoin" in p
            assert "Exchange" not in p
            # correctness of the bucketed copy
            expect = (li.join(orders.withColumnRenamed(
                "o_orderkey", "l_orderkey"), "l_orderkey").count())
            assert j.count() > 0
            assert a.join(b, "l_orderkey").count() == expect
        finally:
            with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_lineitem")
        spark.sql("DROP TABLE IF EXISTS bt_orders")


def test_bucketed_write_roundtrip_values(spark, sf_dir, tmp_path):
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    write_bucketed(n, "bt_nation", "n_nationkey", 2,
                   path=str(tmp_path / "nat"))
    try:
        back = spark.table("bt_nation")
        assert sorted(r["n_nationkey"] for r in back.collect()) == \
            sorted(r["n_nationkey"] for r in n.collect())
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_nation")
