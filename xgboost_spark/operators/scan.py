"""Distributed prefix scan (running totals over a global order).

A global `SUM() OVER (ORDER BY k)` window in Spark collapses to a single
partition (WindowExec warns "No Partition Defined") — unusable at 100 TB.
This operator computes the same result scale-safely in two passes:

1. range-repartition by the order column and sort within partitions;
2. job A: per-partition totals (tiny — n_partitions rows to the driver);
3. job B: per-partition local cumsum + broadcast exclusive offset.

Used by the Cox partial-likelihood gradient pass (risk-set suffix sums,
`xgboost_spark/plans/booster.py`) and exposed as a relational operator.
The reference's analogous pattern is the split-enumeration prefix scan
(`src/tree/hist/evaluate_splits.h:205-330`), which it runs per-node on
histograms; here the scan itself is distributed.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def prefix_sums(df: DataFrame, order_col: str | list[str], value_cols: list[str],
                n_part: int | None = None) -> DataFrame:
    """Append inclusive running totals ``cum_<c>`` for each value column,
    ordered globally by ``order_col`` (ascending; may be a list for
    lexicographic order).  Rows with equal keys are accumulated in their
    within-partition order — for set semantics, pre-aggregate to
    distinct keys first (as the Cox pass does).
    """
    spark = df.sparkSession
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    if n_part is None:
        n_part = spark.sparkContext.defaultParallelism
    d = (df.repartitionByRange(n_part, *order_cols)
           .sortWithinPartitions(*order_cols))
    d = d.localCheckpoint(eager=True)  # pin partitioning for both passes

    part_schema = T.StructType(
        [T.StructField("pid", T.IntegerType())]
        + [T.StructField(c, T.DoubleType()) for c in value_cols])

    def totals_fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        sums = np.zeros(len(value_cols))
        for pdf in it:
            for i, c in enumerate(value_cols):
                sums[i] += pdf[c].to_numpy(dtype=np.float64).sum()
        yield pd.DataFrame({"pid": [pid], **{c: [sums[i]] for i, c in enumerate(value_cols)}})

    totals = {r["pid"]: [r[c] for c in value_cols]
              for r in d.mapInPandas(totals_fn, schema=part_schema).collect()}
    offsets = np.zeros((max(totals.keys(), default=-1) + 2, len(value_cols)))
    for pid in sorted(totals):
        offsets[pid + 1] = offsets[pid] + np.asarray(totals[pid])
    bc = spark.sparkContext.broadcast(offsets)

    out_fields = list(d.schema.fields) + [
        T.StructField(f"cum_{c}", T.DoubleType()) for c in value_cols]

    def scan_fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        off = bc.value[pid].copy()
        for pdf in it:
            out = pdf.copy()
            for i, c in enumerate(value_cols):
                v = pdf[c].to_numpy(dtype=np.float64)
                out[f"cum_{c}"] = off[i] + np.cumsum(v)
                off[i] += v.sum()
            yield out

    return d.mapInPandas(scan_fn, schema=T.StructType(out_fields))
