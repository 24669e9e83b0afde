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
