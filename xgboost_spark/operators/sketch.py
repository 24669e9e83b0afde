"""Quantile sketch operators — the engine's cut-finding stage.

The reference builds per-feature epsilon-approximate weighted quantile
summaries and merges them across workers
(`src/common/quantile.h:35`, merge `src/common/quantile.cc:389-473`,
`SketchOnDMatrix` `src/common/hist_util.h:198`).  Spark already ships a
distributed GK sketch as `percentile_approx`, so the unweighted path is
one aggregation job over all features.  The hessian-weighted path (the
`approx` updater's per-iteration re-sketch,
`src/tree/updater_approx.cc:95-130`) is expressed as a range-partitioned
cumulative-weight query — no single-partition global sort, so it scales.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _finish_cuts(qs: list[float], vmax: float) -> np.ndarray:
    cuts = np.unique(np.asarray(qs, dtype=np.float64))
    cuts = cuts[~np.isnan(cuts)]
    if cuts.size == 0:
        return np.asarray([np.inf])
    # final boundary covers the max (reference bumps the last cut)
    cuts[-1] = np.nextafter(max(cuts[-1], vmax), np.inf)
    return cuts


def approx_cuts(df: DataFrame, cols: list[str], max_bin: int,
                accuracy: int | None = None, extra_aggs=None):
    """Per-feature bin boundaries via Spark's distributed GK sketch.

    One job for all features; equivalent role to `HistogramCuts` build
    (`src/common/hist_util.h:39-147`).  Accuracy defaults to 8x the bin
    count (rank error 1/8 of a bin's mass) — the sketch insert/merge
    cost grows with accuracy, and bin boundaries don't need more.  NB
    measured: repartitioning before the sketch HURTS (the per-partition
    partials are cheap; merging many high-accuracy partials is not), so
    unlike the hashing/shingling operators this one takes the scan's
    natural partitioning.

    ``extra_aggs``: optional additional aggregate Columns to ride the
    SAME job (e.g. the trainer fuses its intercept sums here so cuts +
    base score cost one scan, not two).  When given, returns
    ``(cuts, row)`` so the caller can read its extra results.
    """
    if accuracy is None:
        accuracy = max(2048, 8 * max_bin)
    probs = [i / max_bin for i in range(1, max_bin + 1)]
    aggs = []
    for c in cols:
        aggs.append(F.percentile_approx(F.col(c), F.lit(probs), F.lit(accuracy)).alias(f"q_{c}"))
        aggs.append(F.max(c).alias(f"m_{c}"))
    if extra_aggs:
        aggs.extend(extra_aggs)
    row = df.agg(*aggs).first()
    out = []
    for c in cols:
        qs = row[f"q_{c}"] or []
        vmax = row[f"m_{c}"]
        out.append(_finish_cuts([q for q in qs if q is not None], vmax if vmax is not None else np.nan))
    return (out, row) if extra_aggs else out


def weighted_cuts(df: DataFrame, col: str, weight_col: str, max_bin: int,
                  num_partitions: int | None = None) -> np.ndarray:
    """Weighted quantile cuts: cut_b = max{v : cumw(v) <= b/B * W}.

    Scalable pattern: range-repartition on the value column, per-partition
    prefix sums plus broadcast partition offsets — the Spark-native
    equivalent of the reference's distributed weighted-sketch merge
    (`src/common/quantile.cc:389-473`).
    """
    d = df.select(F.col(col).cast("double").alias("v"), F.col(weight_col).cast("double").alias("w"))
    d = d.filter(F.col("v").isNotNull())
    if num_partitions:
        d = d.repartitionByRange(num_partitions, "v")
    # cumw within a range partition ordered by v; partition offsets are a
    # tiny driver-side cumsum — two jobs total, no global single-partition sort
    d = d.withColumn("pid", F.spark_partition_id())
    d = d.withColumn("cw_local", F.sum("w").over(Window.partitionBy("pid").orderBy("v", "w")))
    per_part = d.groupBy("pid").agg(F.sum("w").alias("pw")).collect()
    per_part.sort(key=lambda r: r["pid"])
    offsets = {}
    acc = 0.0
    for r in per_part:
        offsets[r["pid"]] = acc
        acc += r["pw"]
    total = acc
    if total <= 0:
        return np.asarray([np.inf])
    off_df = df.sparkSession.createDataFrame(
        [(int(p), float(o)) for p, o in offsets.items()], "pid int, off double"
    )
    d = d.join(F.broadcast(off_df), "pid")
    d = d.withColumn("bucket", F.ceil((F.col("cw_local") + F.col("off")) * max_bin / total))
    rows = (
        d.groupBy("bucket").agg(F.max("v").alias("cut"))
        .orderBy("bucket").collect()
    )
    vmax = max(r["cut"] for r in rows)
    return _finish_cuts([r["cut"] for r in rows], vmax)


def weighted_cuts_all(df: DataFrame, value_cols: list[str], weight_col: str,
                      max_bin: int, n_part: int | None = None,
                      skip: list[int] | None = None) -> list[np.ndarray]:
    """Hessian-weighted cuts for ALL features in ~4 jobs (the `approx`
    updater's per-iteration re-sketch, `src/tree/updater_approx.cc:95-130`).

    Plan: melt to long format with a JVM-side explode -> groupBy
    (fidx, value) weight sums -> ONE multi-column prefix scan over the
    (fidx, value) order (operators/scan.py) -> per-feature cumulative
    weight = running total minus the feature's start offset (driver
    math over F values) -> bucket boundaries collected (<= F x max_bin
    rows).  ``skip`` lists feature indices to exclude (categoricals).
    """
    skip_set = set(skip or [])
    pairs = [
        F.struct(F.lit(i).alias("fidx"),
                 F.col(c).cast("double").alias("v"))
        for i, c in enumerate(value_cols) if i not in skip_set
    ]
    if not pairs:
        return [np.asarray([np.inf])] * len(value_cols)
    long = (df.select(F.explode(F.array(*pairs)).alias("p"),
                      F.col(weight_col).cast("double").alias("w"))
            .select("p.fidx", "p.v", "w")
            .filter(F.col("v").isNotNull()))
    per_v = long.groupBy("fidx", "v").agg(F.sum("w").alias("ww"))
    from xgboost_spark.operators.scan import prefix_sums
    scanned = prefix_sums(per_v, ["fidx", "v"], ["ww"], n_part)
    totals = {int(r["fidx"]): (float(r["W"]), float(r["mx"]))
              for r in per_v.groupBy("fidx")
              .agg(F.sum("ww").alias("W"), F.max("v").alias("mx")).collect()}
    # feature start offsets: cumulative totals of preceding features
    starts = {}
    acc = 0.0
    for fi in sorted(totals):
        starts[fi] = acc
        acc += totals[fi][0]
    start_df = df.sparkSession.createDataFrame(
        [(fi, s) for fi, s in starts.items()], "fidx int, start double")
    tot_df = df.sparkSession.createDataFrame(
        [(fi, t[0]) for fi, t in totals.items()], "fidx int, W double")
    b = (scanned.join(F.broadcast(start_df), "fidx")
         .join(F.broadcast(tot_df), "fidx")
         .withColumn("cumw", F.col("cum_ww") - F.col("start"))
         .withColumn("bucket", F.ceil(F.col("cumw") * max_bin / F.col("W"))))
    rows = (b.groupBy("fidx", "bucket").agg(F.max("v").alias("cut"))
            .collect())
    cuts_map: dict[int, list[float]] = {}
    for r in rows:
        cuts_map.setdefault(int(r["fidx"]), []).append(float(r["cut"]))
    out = []
    for i in range(len(value_cols)):
        if i in skip_set or i not in cuts_map:
            out.append(None)
            continue
        out.append(_finish_cuts(sorted(cuts_map[i]), totals[i][1]))
    return out


def exact_quantiles(df: DataFrame, col: str, n_bins: int,
                    coarse: int = 8192, collect_threshold: int = 200_000) -> DataFrame:
    """Exact type-1 quantiles at k/n_bins — value at global rank
    ``ceil(k*n/B)``.  SQL-oracle-equivalent to a `row_number() OVER
    (ORDER BY v)` query, computed scale-safely by iterative histogram
    refinement (distributed selection): each round is ONE full-parallel
    scan with a map-side-combinable `groupBy(bin).agg(count,min,max)`
    over ≤ ``coarse`` bins — no data shuffle, no global window, no
    Python workers.  Every round shrinks each target rank's candidate
    interval ~``coarse``×, so 100 TB needs only 3-4 cheap scans; a bin
    whose min==max (ties) resolves immediately, and once all candidate
    sets fit ``collect_threshold`` the remainders are solved driver-side.
    Returns DataFrame (k, cut)."""
    spark = df.sparkSession
    d = (df.select(F.col(col).cast("double").alias("v"))
           .filter(F.col("v").isNotNull() & ~F.isnan("v")))
    first = d.agg(F.count("*").alias("n"), F.min("v").alias("lo"),
                  F.max("v").alias("hi")).first()
    n = first["n"]
    if n == 0:
        return spark.createDataFrame([], "k bigint, cut double")
    # per-target state: global rank t, candidate interval [lo, hi]
    # (data min/max of the set), #rows below lo, #candidates in interval
    state = {k: {"t": int(math.ceil(k * n / n_bins)), "lo": float(first["lo"]),
                 "hi": float(first["hi"]), "below": 0, "cnt": int(n)}
             for k in range(1, n_bins)}
    resolved: dict[int, float] = {}
    for k, s in list(state.items()):
        if s["lo"] == s["hi"]:
            resolved[k] = s["lo"]
            del state[k]
    while state:
        active = {k: s for k, s in state.items() if s["cnt"] > collect_threshold}
        # Distinct candidate intervals needing refinement.  Invariant:
        # every round, all targets' intervals are pairwise identical or
        # disjoint (round 0 they are all [min,max]; afterwards each is
        # the (mn,mx) of one bin of a shared partitioning, and bins of a
        # partitioning never straddle each other) — so dedup by value is
        # enough and every bin below belongs wholly to each target whose
        # interval it refines.
        merged = sorted({(s["lo"], s["hi"]) for s in active.values()})
        if merged:
            # one scan: histogram of every merged interval at once
            iv_expr = None
            bin_expr = None
            for i, (lo, hi) in enumerate(merged):
                w = (hi - lo) / coarse
                in_iv = (F.col("v") >= lo) & (F.col("v") <= hi)
                b = F.least(F.floor((F.col("v") - lo) / w), F.lit(coarse - 1))
                iv_expr = F.when(in_iv, i) if iv_expr is None else iv_expr.when(in_iv, i)
                bin_expr = F.when(in_iv, b) if bin_expr is None else bin_expr.when(in_iv, b)
            hist = (d.withColumn("_iv", iv_expr).filter(F.col("_iv").isNotNull())
                    .withColumn("_b", bin_expr)
                    .groupBy("_iv", "_b")
                    .agg(F.count("*").alias("c"), F.min("v").alias("mn"),
                         F.max("v").alias("mx"))
                    .collect())
            bins: dict[int, list] = {}
            for r in hist:
                bins.setdefault(int(r["_iv"]), []).append(
                    (int(r["_b"]), int(r["c"]), float(r["mn"]), float(r["mx"])))
            for k, s in list(active.items()):
                iv = merged.index((s["lo"], s["hi"]))
                local = s["t"] - s["below"]
                cum = 0
                for b, c, mn, mx in sorted(bins.get(iv, [])):
                    if cum + c >= local:
                        s["below"] += cum
                        s["cnt"] = c
                        s["lo"], s["hi"] = mn, mx
                        break
                    cum += c
                if s["lo"] == s["hi"]:
                    resolved[k] = s["lo"]
                    del state[k]
        # solve all small-candidate targets with one driver collect
        small = {k: s for k, s in state.items() if s["cnt"] <= collect_threshold}
        if small:
            ivs = sorted({(s["lo"], s["hi"]) for s in small.values()})
            cond = None
            for lo, hi in ivs:
                c = (F.col("v") >= lo) & (F.col("v") <= hi)
                cond = c if cond is None else cond | c
            vals = np.sort(np.array(
                [r["v"] for r in d.filter(cond).collect()], dtype=np.float64))
            for k, s in small.items():
                lo, hi = s["lo"], s["hi"]
                sub = vals[(vals >= lo) & (vals <= hi)]
                resolved[k] = float(sub[s["t"] - s["below"] - 1])
                del state[k]
    return spark.createDataFrame(
        sorted((k, v) for k, v in resolved.items()), "k bigint, cut double")
