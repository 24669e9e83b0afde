"""Dataset sinks: deterministic sharded writers.

The write side of a training-data pipeline needs byte-reproducible
output: the same rows in the same shard in the same order on every run,
whatever the input partitioning or cluster size.  `write_shards` pairs
`operators/sampling.shuffle_shards` (hash-derived shard + sort key)
with a partitioned writer so re-running the pipeline rewrites identical
shard directories — the property epoch-reproducible data loaders need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_shards(df: DataFrame, key_col: str, path: str, n_shards: int,
                 fmt: str = "parquet", mode: str = "overwrite",
                 salt: str = "shard", keep_sort_key: bool = False) -> None:
    """Write ``df`` as ``path/shard=K/...`` with content-deterministic
    shard membership AND within-shard order.

    One shuffle (the writer's own repartition on shard); within each
    shard the rows sort by the md5 content key, so output bytes don't
    depend on input partitioning.  ``maxRecordsPerFile`` etc. compose
    via the normal writer options on top.
    """
    from xgboost_spark.operators.sampling import shuffle_shards
    s = shuffle_shards(df, key_col, n_shards, salt=salt)
    s = (s.repartition(n_shards, "shard")
          .sortWithinPartitions("shard", "sort_key"))
    if not keep_sort_key:
        s = s.drop("sort_key")
    s.write.partitionBy("shard").mode(mode).format(fmt).save(path)


def write_bucketed(df: DataFrame, table: str, key: str | list[str],
                   n_buckets: int, sort: bool = True, fmt: str = "parquet",
                   mode: str = "overwrite", path: str | None = None) -> None:
    """Write ``df`` as a bucketed (and optionally bucket-sorted) table:
    the co-location contract that lets every later equi-join or
    aggregation on ``key`` skip its shuffle entirely.

    At 100 TB this is the difference between re-shuffling a fact table
    on every join and shuffling it ONCE at write time: two tables
    bucketed by the same key into the same bucket count join with no
    Exchange on either side (asserted in
    tests/test_sinks.py::test_bucketed_join_has_no_exchange), and a
    sorted bucket also drops the join's Sort.  Bucketing metadata lives
    in the session catalog, so ``saveAsTable`` is required — pass
    ``path`` to keep the data external at a chosen location.
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
