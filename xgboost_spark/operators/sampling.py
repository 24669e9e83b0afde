"""Dataset curation operators: deterministic splits and sequence packing.

A training-data pipeline needs reproducible, engine-independent dataset
partitioning — `df.sample`/`randomSplit` depend on partitioning and RNG
state, so two runs (or two engines) disagree.  These operators derive
everything from content hashes / prefix scans, so the same row lands in
the same split on any engine at any scale (both have exact DuckDB
oracles in `__spark_entry__.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F



def _uniform_u32(key_col: str, salt: str):
    """Deterministic uniform [0, 1) from a salted 32-bit md5 prefix —
    the shared key-hash for all mixing/splitting operators, so rates
    configured across them compose on the same per-key draw."""
    return (F.conv(F.substring(F.md5(F.concat(F.lit(salt),
                                              F.col(key_col).cast("string"))),
                               1, 8), 16, 10).cast("double")
            / F.lit(float(2 ** 32)))

def hash_split(df: DataFrame, key_col: str, fractions: dict[str, float],
               salt: str = "split", out_col: str = "split") -> DataFrame:
    """Assign each row to a named split by hashing its key: the first 8
    md5 hex chars of (salt || key) uniformize to u in [0,1); cumulative
    fraction thresholds pick the split.  Deterministic, key-stable
    (adding rows never moves existing rows between splits), no shuffle —
    a pure projection that fuses into the scan.

    ``fractions`` values should sum to <= 1.0; rows falling beyond the
    total get NULL (useful for subsampling: {"train": 0.01} keeps 1%).
    """
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    u = _uniform_u32(key_col, salt)
    col = None
    cum = 0.0
    for name, frac in fractions.items():
        cum += float(frac)
        col = (F.when(u < cum, name) if col is None
               else col.when(u < cum, name))
    return df.withColumn(out_col, col)


def shuffle_shards(df: DataFrame, key_col: str, n_shards: int,
                   salt: str = "shard") -> DataFrame:
    """Deterministic global shuffle for training-data shard writers:
    appends ``shard`` (int in [0, n_shards)) and ``sort_key`` (the md5
    digest of salt||key).  Writing
    ``.repartition(n_shards, "shard").sortWithinPartitions("sort_key")``
    yields byte-identical shards on any engine, any input partitioning,
    any cluster size — the property epoch-reproducible LLM data loaders
    need.  Pure projections (shard choice and order both derive from the
    content hash); the only shuffle is the writer's own repartition.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    shard = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_shards
    return (df.withColumn("sort_key", h)
            .withColumn("shard", shard.cast("int")))


def stratified_take(df: DataFrame, strata_col: str, key_col: str, n_per: int,
                    salt: str = "take") -> DataFrame:
    """Exactly-n-per-stratum deterministic sample: rows rank by
    md5(salt || key) within their stratum; the n smallest win.  Unlike
    ``sampleBy`` this is engine-independent and gives exact counts.

    Scale: the rank window compiles to WindowGroupLimit (map-side
    partial top-n before the shuffle), so a giant stratum never sorts
    fully — each task keeps at most n rows per stratum.
    """
    from pyspark.sql import Window
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(h)
    return (df.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= n_per).drop("_rk"))


def pack_sequences(df: DataFrame, id_col: str, token_col: str,
                   budget: int, out_col: str = "pack_id") -> DataFrame:
    """Linear greedy sequence packing: documents in stable ``id_col``
    order are laid end-to-end and cut into packs of ~``budget`` tokens —
    a document belongs to the pack its START offset falls in.

    Distributed via operators/scan.prefix_sums (range repartition +
    per-partition windows + broadcast offsets), so no single-partition
    global window at any scale.  The budget is approximate by one
    document at pack boundaries — the standard streaming-packing
    tradeoff; exact bin packing is NP-hard and order-unstable.
    """
    from xgboost_spark.operators.scan import prefix_sums
    s = prefix_sums(df, id_col, [token_col])
    start = F.col(f"cum_{token_col}") - F.col(token_col)
    return (s.withColumn(out_col, F.floor(start / F.lit(float(budget)))
                         .cast("bigint"))
            .drop(f"cum_{token_col}"))


def sample_by_rates(df: DataFrame, rates: dict[str, float],
                    key_col: str, strat_col: str,
                    salt: str = "mix", default_rate: float = 1.0) -> DataFrame:
    """Deterministic per-stratum downsampling — the data-mixing step of
    an LLM corpus pipeline (keep source A at 100%, B at 25%, ...).

    A row survives iff its md5-uniformized key u(salt||key) < rate of
    its stratum.  Pure projection + filter (fuses into the scan, no
    shuffle); key-stable, so re-running over a grown corpus keeps
    exactly the rows it kept before.  Rates must be in [0, 1] —
    upweighting (>1) needs replication, which is a different operator.
    """
    for s, r in rates.items():
        if not 0.0 <= float(r) <= 1.0:
            raise ValueError(f"rate for {s!r} must be in [0, 1], got {r}")
    if not 0.0 <= float(default_rate) <= 1.0:
        raise ValueError("default_rate must be in [0, 1]")
    u = _uniform_u32(key_col, salt)
    rate = None
    for s, r in rates.items():
        rate = (F.when(F.col(strat_col) == s, float(r)) if rate is None
                else rate.when(F.col(strat_col) == s, float(r)))
    rate = F.lit(float(default_rate)) if rate is None else rate.otherwise(float(default_rate))
    return df.filter(u < rate)


def replicate_by_rates(df: DataFrame, rates: dict[str, float],
                       key_col: str, strat_col: str,
                       salt: str = "mix", default_rate: float = 1.0,
                       out_col: str = "copy") -> DataFrame:
    """Deterministic per-stratum UPweighting: each row appears
    floor(rate) or ceil(rate) times so the stratum's expected multiplier
    is exactly ``rate`` (epoch-style oversampling of premium sources).
    The fractional extra copy goes to rows whose md5-uniformized key
    falls under frac(rate) — the same hash as `sample_by_rates`, so a
    rate of 0.25 there and 2.5 here compose coherently.  Appends
    ``out_col`` (0-based copy index) to keep output keys unique.
    Pure explode over a per-row sequence — no shuffle.
    """
    vals = dict(rates, __default__=default_rate)
    for s, r in vals.items():
        if float(r) < 0.0:
            raise ValueError(f"rate for {s!r} must be >= 0, got {r}")
    u = _uniform_u32(key_col, salt)
    n = None
    for s, r in rates.items():
        r = float(r)
        expr = F.lit(int(r)) + (u < (r - int(r))).cast("int")
        n = (F.when(F.col(strat_col) == s, expr) if n is None
             else n.when(F.col(strat_col) == s, expr))
    dr = float(default_rate)
    d_expr = F.lit(int(dr)) + (u < (dr - int(dr))).cast("int")
    n = d_expr if n is None else n.otherwise(d_expr)
    return (df.withColumn("_n", n).filter(F.col("_n") > 0)
            .withColumn(out_col, F.explode(F.sequence(F.lit(0), F.col("_n") - 1)))
            .drop("_n"))


def reservoir_per_group(df: DataFrame, group_cols: list[str],
                        key_cols: list[str], k: int,
                        salt: str = "rsv") -> DataFrame:
    """Deterministic reservoir-style sample of exactly min(k, |group|)
    rows per group: each row's priority is the md5 of (salt, unique
    key), and the k smallest priorities win — the hash plays the role
    of the reservoir algorithm's random draws, so the sample is uniform
    in distribution yet reproducible in any engine.

    One shuffle on the group key; the per-group window sorts only that
    group's rows and emits k, so output size is bounded by
    k x |groups| regardless of group skew.  Appends ``rsv_rank``.
    """
    pr = F.md5(F.concat_ws(
        "|", F.lit(salt), *[F.col(c).cast("string") for c in key_cols]))
    w = Window.partitionBy(*group_cols).orderBy(pr.asc())
    return (df.withColumn("rsv_rank",
                          F.row_number().over(w).cast("bigint"))
            .filter(F.col("rsv_rank") <= k))
