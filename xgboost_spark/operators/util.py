"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Round-robin repartition a DataFrame whose scan yields fewer
    partitions than the session can run in parallel.

    At production scale this is a no-op: a large table scans as
    thousands of splits, and adding a shuffle there would be pure waste.
    It matters for small/single-row-group files (parquet can only split
    at row-group boundaries), where otherwise every downstream per-row
    computation — hashing, shingling, binning, vector math — serializes
    onto one core while the rest of the cluster idles.  The repartition
    cost is tiny exactly when this triggers (the input is small).
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, int(n * min_fraction)):
        return df.repartition(n)
    return df
