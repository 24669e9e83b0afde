"""Bucketed-sink demo: shuffle ONCE at write time, join shuffle-free
forever after (sources/sinks.write_bucketed).

Writes lineitem and orders bucketed by order key at the same bucket
count, then runs the fact-to-fact join + aggregation twice — once on
the plain parquet (two Exchanges + Sorts) and once on the bucketed
tables (ZERO Exchange; the groupBy on the bucket key rides the same
distribution) — printing both physical plans and wall times.  At
100 TB this is the difference between re-shuffling a fact table on
every join and amortizing one shuffle into the write.

Run:  python examples/bucketed_join_demo.py [sf_dir]   (default sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from xgboost_spark.session import get_session  # noqa: E402
from xgboost_spark.sources.sinks import write_bucketed  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_BUCKETS = 8


def plan_of(df) -> str:
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def main():
    spark = get_session("bucketed_demo", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "8")))
    # isolate the plan comparison from broadcast: at demo scale the
    # small side would broadcast and hide the shuffle being amortized
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice")

    def query(a, b):
        return (a.join(b, "l_orderkey")
                .groupBy("l_orderkey")
                .agg(F.sum("l_quantity").alias("sum_qty"),
                     F.sum("o_totalprice").alias("sum_price")))

    t0 = time.time()
    plain = query(li, orders)
    n_plain = plain.count()
    t_plain = time.time() - t0
    p_plain = plan_of(plain)

    t0 = time.time()
    write_bucketed(li, "demo_li", "l_orderkey", N_BUCKETS,
                   path="/tmp/bucketed_demo/li")
    write_bucketed(orders, "demo_ord", "l_orderkey", N_BUCKETS,
                   path="/tmp/bucketed_demo/ord")
    t_write = time.time() - t0

    t0 = time.time()
    bucketed = query(spark.table("demo_li"), spark.table("demo_ord"))
    n_bucketed = bucketed.count()
    t_bucketed = time.time() - t0
    p_bucketed = plan_of(bucketed)

    print(f"rows: plain={n_plain} bucketed={n_bucketed} (must match)")
    assert n_plain == n_bucketed
    print(f"plain join+agg:    {t_plain:6.2f}s  "
          f"(Exchanges in plan: {p_plain.count('Exchange')})")
    print(f"bucketed write:    {t_write:6.2f}s  (one-time, amortized)")
    print(f"bucketed join+agg: {t_bucketed:6.2f}s  "
          f"(Exchanges in plan: {p_bucketed.count('Exchange')})")
    assert "Exchange" not in p_bucketed, "bucketed plan must not shuffle"
    print("\n--- bucketed physical plan (no Exchange) ---")
    print(p_bucketed[:2000])

    spark.sql("DROP TABLE IF EXISTS demo_li")
    spark.sql("DROP TABLE IF EXISTS demo_ord")
    spark.stop()


if __name__ == "__main__":
    main()
