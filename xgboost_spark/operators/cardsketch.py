"""Cardinality and frequency sketches — HyperLogLog and Count-Min —
built as plain DataFrame aggregations with md5-derived hashes.

Why not `approx_count_distinct`?  Spark's built-in HLL++ is the right
production default (and nothing here replaces it), but its register
layout is engine-private, so its estimate cannot be replayed by an
independent engine.  These operators use md5-derived bucket/register
hashes, which makes every intermediate — registers, counters, the
final estimate arithmetic — bit-reproducible in any SQL engine: the
DuckDB oracle recomputes the identical sketch, which is the same
replayability contract the MinHash/SimHash/LSH family uses.

Scale shape: both sketches are ONE groupBy over a corpus scan with a
bounded key domain (2^p registers / depth x width counters), i.e. a
map-side-combinable aggregate whose result is sketch-sized, not
data-sized.  Sketches from disjoint partitions/streams merge by
max (HLL) / sum (CMS) — the classic mergeability property, asserted
in tests.

References: Flajolet et al. 2007 (HyperLogLog, public paper);
Cormode & Muthukrishnan 2005 (Count-Min, public paper).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _h48(col, salt: str):
    """Salted 48-bit md5 hash (shared operators/util.md5_h48 decode)."""
    from xgboost_spark.operators.util import md5_h48
    return md5_h48(F.concat(F.lit(salt), col))


def hll_register_exprs(col, p: int = 10, salt: str = "hll"):
    """(bucket_expr, rho_expr) for a value column — the building blocks
    of an HLL register table, exposed so STREAMING aggregations can run
    the same max-merge per (window, bucket) with bounded state."""
    h = _h48(col.cast("string"), salt + ":")
    m = 1 << p
    bucket = (h % m).cast("bigint")
    suffix = F.shiftright(h, p)
    width = 48 - p
    rho = F.when(suffix == 0, F.lit(width + 1)) \
           .otherwise(F.lit(width + 1) - F.length(F.bin(suffix)))
    return bucket, rho.cast("bigint")


def hll_registers(df: DataFrame, col: str, p: int = 10,
                  salt: str = "hll") -> DataFrame:
    """HyperLogLog registers: (bucket, register) with bucket = the low
    ``p`` bits of the hash and register = 1 + leading-zero count of the
    remaining (48-p)-bit suffix (capped at 48-p+1 when the suffix is
    zero).  NULL values are ignored (like approx_count_distinct).
    One HashAggregate; at most 2^p output rows.

    The bucket/rho expressions (shared with the streaming path via
    `hll_register_exprs`) use the binary-string length for the
    highest-set-bit position — integer exact in both engines
    (length(bin(x)) = floor(log2 x) + 1), no libm log2 ulp hazards."""
    df = df.filter(F.col(col).isNotNull())
    bucket, rho = hll_register_exprs(F.col(col), p, salt)
    return (df.select(bucket.alias("bucket"), rho.alias("rho"))
            .groupBy("bucket").agg(F.max("rho").alias("register")))


def hll_estimate(df: DataFrame, col: str, p: int = 10,
                 salt: str = "hll") -> DataFrame:
    """One-row HLL cardinality estimate: (m, n_used, estimate).

    estimate = alpha_m * m^2 / sum(2^-M_j) over ALL m registers (empty
    registers count as 2^0), with the standard small-range linear
    counting correction when estimate <= 2.5m and some registers are
    empty.  Every term is reproducible double arithmetic, rounded 4dp.
    """
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    regs = hll_registers(df, col, p, salt)
    agg = regs.agg(
        F.count("*").cast("bigint").alias("n_used"),
        F.sum(F.pow(F.lit(2.0), -F.col("register"))).alias("s_used"))
    # empty registers contribute 2^0 = 1 each
    est = (F.lit(alpha * m * m)
           / (F.col("s_used") + (F.lit(m) - F.col("n_used"))))
    zeros = F.lit(m) - F.col("n_used")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    final = F.when(F.col("n_used") == 0, F.lit(0.0)) \
             .when((est <= 2.5 * m) & (zeros > 0), linear).otherwise(est)
    return agg.select(F.lit(m).cast("bigint").alias("m"), "n_used",
                      F.round(final, 4).alias("estimate"))


def cms_counters(df: DataFrame, col: str, width: int = 256, depth: int = 4,
                 salt: str = "cms") -> DataFrame:
    """Count-Min counters: (d, bucket, cnt) for ``depth`` independent
    md5-salted hash rows of ``width`` buckets.  One explode + one
    HashAggregate; at most depth x width output rows."""
    c = F.col(col).cast("string")
    rows = F.array(*[
        F.struct(F.lit(d).alias("d"),
                 (_h48(c, f"{salt}{d}:") % width).cast("bigint").alias("bucket"))
        for d in range(depth)])
    return (df.select(F.explode(rows).alias("r"))
            .select("r.d", "r.bucket")
            .groupBy("d", "bucket").agg(F.count("*").cast("bigint").alias("cnt")))


def bloom_bits(df: DataFrame, col: str, m_bits: int = 1 << 16,
               k: int = 4, salt: str = "bloom") -> DataFrame:
    """Bloom filter as a DataFrame of SET bit positions: (bit) distinct,
    bit = md5-salted hash mod m_bits, one row per set bit (<= m_bits
    rows, typically far fewer).  Spark's native bloom_filter_agg is the
    production default; this md5 form is engine-replayable, mergeable
    by plain UNION/DISTINCT, and joinable — the natural shape for
    massive-scale decontamination where the benchmark-side filter is
    small and the corpus side is only ever probed."""
    c = F.col(col).cast("string")
    bits = F.array(*[(_h48(c, f"{salt}{d}:") % m_bits).cast("bigint")
                     for d in range(k)])
    return df.select(F.explode(bits).alias("bit")).distinct()


def bloom_probe(items: DataFrame, bits: DataFrame, col: str,
                m_bits: int = 1 << 16, k: int = 4,
                salt: str = "bloom") -> DataFrame:
    """Membership probe: (item..., maybe_present) — true iff ALL k of
    the item's bit positions are set (no false negatives; false
    positives at the standard (1-e^{-kn/m})^k rate).  The bit set is
    broadcast; the probe side never shuffles.  ``items`` rows must be
    distinct (the hit count groups by all item columns)."""
    c = F.col(col).cast("string")
    probe = items.withColumn(
        "_bits", F.array(*[(_h48(c, f"{salt}{d}:") % m_bits).cast("bigint")
                           for d in range(k)]))
    hit = (probe.select("*", F.explode("_bits").alias("bit"))
           .join(F.broadcast(bits), "bit")
           .groupBy(*items.columns).agg(F.count("*").alias("_nhit")))
    return (items.join(hit, items.columns, "left")
            .withColumn("maybe_present",
                        F.coalesce(F.col("_nhit"), F.lit(0)) == k)
            .drop("_nhit"))


def cms_estimate(df: DataFrame, items: DataFrame, col: str,
                 item_col: str = "item", width: int = 256, depth: int = 4,
                 salt: str = "cms") -> DataFrame:
    """Point-query the sketch for each candidate item: (item, est) with
    est = min over rows of the item's bucket counter (the classic CMS
    upper bound).  The counter table (depth x width rows) is broadcast;
    the probe is a map-side join, no corpus shuffle.  A bucket with no
    counter row counts as 0 (left join + coalesce), so an item absent
    from the corpus correctly estimates 0 instead of being dropped or
    min'ed over only its non-empty buckets."""
    counters = cms_counters(df, col, width, depth, salt)
    it = F.col(item_col).cast("string")
    probes = items.select(
        it.alias("item"),
        F.explode(F.array(*[
            F.struct(F.lit(d).alias("d"),
                     (_h48(it, f"{salt}{d}:") % width).cast("bigint")
                     .alias("bucket"))
            for d in range(depth)])).alias("r")
    ).select("item", "r.d", "r.bucket")
    return (probes.join(F.broadcast(counters), ["d", "bucket"], "left")
            .groupBy("item")
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")))
