"""Distributed prefix scan (running totals over a global order).

A global `SUM() OVER (ORDER BY k)` window in Spark collapses to a single
partition (WindowExec warns "No Partition Defined") — unusable at 100 TB.
This operator computes the same result scale-safely in two passes, both
entirely JVM-side (whole-stage codegen; no Python workers):

1. range-repartition by the order column, sort within partitions, tag
   rows with `spark_partition_id()`, and pin with `localCheckpoint` so
   both passes see identical partitioning;
2. pass A: per-partition totals via `groupBy(pid)` — a tiny hash
   aggregation (n_partitions rows to the driver);
3. pass B: within-partition running sum via a window PARTITIONED BY pid
   (parallel — never a single-partition window) plus the partition's
   exclusive prefix offset, joined in from a broadcast table.

Used by the Cox partial-likelihood gradient pass (risk-set suffix sums,
`xgboost_spark/plans/booster.py`), the exact-quantile and AUC operators,
and exposed as a relational operator.  The reference's analogous pattern
is the split-enumeration prefix scan
(`src/tree/hist/evaluate_splits.h:205-330`), which it runs per-node on
histograms; here the scan itself is distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prefix_sums(df: DataFrame, order_col: str | list[str], value_cols: list[str],
                n_part: int | None = None) -> DataFrame:
    """Append inclusive running totals ``cum_<c>`` for each value column,
    ordered globally by ``order_col`` (ascending; may be a list for
    lexicographic order).  Rows with equal keys are accumulated in their
    within-partition sort order — for set semantics, pre-aggregate to
    distinct keys first (as the Cox pass does).
    """
    spark = df.sparkSession
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    if n_part is None:
        n_part = spark.sparkContext.defaultParallelism
    d = (df.repartitionByRange(n_part, *order_cols)
           .sortWithinPartitions(*order_cols)
           .withColumn("_pid", F.spark_partition_id()))
    d = d.localCheckpoint(eager=True)  # pin partitioning for both passes

    totals = (d.groupBy("_pid")
                .agg(*[F.sum(F.col(c).cast("double")).alias(c) for c in value_cols])
                .collect())
    tot = {r["_pid"]: [float(r[c] or 0.0) for c in value_cols] for r in totals}
    off_rows, acc = [], [0.0] * len(value_cols)
    for pid in sorted(tot):
        off_rows.append((pid, *acc))
        acc = [a + b for a, b in zip(acc, tot[pid])]
    off_schema = "_pid int" + "".join(f", _off_{c} double" for c in value_cols)
    if not off_rows:  # empty input: keep schema, produce no rows
        off_rows = [(0, *([0.0] * len(value_cols)))]
    off = spark.createDataFrame(off_rows, off_schema)

    w = (Window.partitionBy("_pid").orderBy(*order_cols)
         .rowsBetween(Window.unboundedPreceding, 0))
    out = d.join(F.broadcast(off), "_pid")
    for c in value_cols:
        out = out.withColumn(
            f"cum_{c}",
            F.col(f"_off_{c}") + F.sum(F.col(c).cast("double")).over(w))
    return out.drop("_pid", *[f"_off_{c}" for c in value_cols])
