"""Split enumeration as a relational query.

The trainer runs `core.split_search` on the driver over the collected
histogram (tiny).  This module expresses the SAME computation as a pure
DataFrame/window query — prefix sums over bins per (node, feature), gain
expression, argmax — demonstrating the reference's `EnumerateSplit`
(`src/tree/hist/evaluate_splits.h:205-330`) as SQL, and serving the
DuckDB-oracle correctness gate.

Gain formula (`src/tree/param.h:245-283`):
    gain(G,H) = G^2 / (H + lambda)            (no L1/clipping form)
    loss_chg  = gain_L + gain_R - gain_parent
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def split_scan_query(hist: DataFrame, reg_lambda: float = 1.0,
                     keys: list[str] | None = None) -> DataFrame:
    """Input: histogram rows (keys..., bin, sum_g, sum_h).
    Output: one row per candidate split (keys..., bin, gain_*) where the
    split puts bins <= bin on the left.  Missing-direction variants are
    the two scans; here the hist has no missing bucket so one scan.
    """
    keys = keys or []
    w = Window.partitionBy(*keys).orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy(*keys)
    lam = float(reg_lambda)
    d = (
        hist
        .withColumn("gl", F.sum("sum_g").over(w))
        .withColumn("hl", F.sum("sum_h").over(w))
        .withColumn("gt", F.sum("sum_g").over(wall))
        .withColumn("ht", F.sum("sum_h").over(wall))
        .withColumn("max_bin", F.max("bin").over(wall))
        .filter(F.col("bin") < F.col("max_bin"))   # no split after the last bin
        .withColumn("gr", F.col("gt") - F.col("gl"))
        .withColumn("hr", F.col("ht") - F.col("hl"))
        .withColumn(
            "gain",
            F.col("gl") ** 2 / (F.col("hl") + lam)
            + F.col("gr") ** 2 / (F.col("hr") + lam)
            - F.col("gt") ** 2 / (F.col("ht") + lam),
        )
    )
    return d.select(*keys, "bin",
                    F.round("gl", 6).alias("gl"), F.round("hl", 6).alias("hl"),
                    F.round("gr", 6).alias("gr"), F.round("hr", 6).alias("hr"),
                    F.round("gain", 6).alias("gain"))


def best_split_query(hist: DataFrame, reg_lambda: float = 1.0,
                     keys: list[str] | None = None,
                     min_child_weight: float = 1.0) -> DataFrame:
    """Argmax gain per key group with deterministic tie-break (lowest bin)."""
    keys = keys or []
    scans = split_scan_query(hist, reg_lambda, keys)
    scans = scans.filter(
        (F.col("hl") >= min_child_weight) & (F.col("hr") >= min_child_weight)
    )
    w = Window.partitionBy(*keys).orderBy(F.col("gain").desc(), F.col("bin").asc())
    return (
        scans.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(*keys, F.col("bin").alias("best_bin"), F.col("gain").alias("best_gain"))
    )
