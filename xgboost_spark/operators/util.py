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


def md5_h48(col) -> "object":
    """48-bit integer hash from the first 12 hex chars of md5 —
    replayable as ('0x' || substr(md5(x), 1, 12))::BIGINT in any SQL
    engine, which is why the dedup/sampling/sketch families all key on
    it.  Callers bake their own salt into ``col`` (usually
    F.concat(F.lit(salt), x)); the 48-bit width fits a double exactly,
    so downstream arithmetic is engine-exact too."""
    from pyspark.sql import functions as F
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("bigint")
