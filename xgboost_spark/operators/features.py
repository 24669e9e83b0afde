"""Feature-engineering operators for tabular ML pipelines.

The reference engine consumes feature matrices; real deployments build
those matrices with exactly these transformations (rolling windows, lag
features, target encoding) before training.  Everything here is pure
window / aggregation plans — partitioned by the entity key, so no
single-partition global windows at any scale — and each has a DuckDB
oracle in `__spark_entry__.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_agg(df: DataFrame, key_col: str, ts_col: str, value_col: str,
                window_seconds: int,
                aggs: tuple[str, ...] = ("sum", "avg", "count")) -> DataFrame:
    """Per-key rolling aggregates over a trailing event-time window
    (inclusive of the current row): the standard "activity in the last
    hour" feature family.

    Plan: one shuffle on the key; a RANGE-framed window over epoch
    seconds per key.  Rows with equal timestamps inside a key all see
    the same frame (RANGE semantics), which keeps the result
    order-independent — and therefore engine-independent.

    Skew note: one key's full history lands in one task (inherent to
    per-key windows).  A key with billions of events needs a coarser
    pre-aggregation first (e.g. per (key, minute) partial sums via
    groupBy, then this window over the minute series) — same answer
    for sum/count, bounded per-task state.

    Appends ``<value>_roll_<agg>`` columns.
    """
    sec = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    w = (Window.partitionBy(key_col).orderBy(sec)
         .rangeBetween(-int(window_seconds), 0))
    out = df
    v = F.col(value_col)
    fns = {"sum": F.sum(v), "avg": F.avg(v), "count": F.count(v),
           "min": F.min(v), "max": F.max(v)}
    for a in aggs:
        if a not in fns:
            raise ValueError(f"unsupported agg {a!r} (have {sorted(fns)})")
        out = out.withColumn(f"{value_col}_roll_{a}", fns[a].over(w))
    return out


def lag_features(df: DataFrame, key_col: str, order_col: str,
                 value_col: str, lags: tuple[int, ...] = (1,),
                 tiebreak_col: str | None = None) -> DataFrame:
    """Per-key lagged values (previous event's metric, the one before,
    ...): appends ``<value>_lag_<k>`` columns, NULL where the history is
    shorter than ``k``.

    One shuffle on the key; ordering must be made total for
    engine-independence — pass ``tiebreak_col`` (a unique id) whenever
    ``order_col`` can repeat within a key.
    """
    order = [F.col(order_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    out = df
    for k in lags:
        if k <= 0:
            raise ValueError("lags must be positive")
        out = out.withColumn(f"{value_col}_lag_{k}",
                             F.lag(value_col, int(k)).over(w))
    return out


def target_encode(df: DataFrame, cat_col: str, label_col: str,
                  smoothing: float = 10.0,
                  out_col: str | None = None) -> DataFrame:
    """Smoothed mean target encoding of a categorical column:

        enc(c) = (sum_y(c) + smoothing * global_mean) / (n(c) + smoothing)

    (the empirical-Bayes shrinkage form; categories with few rows pull
    toward the global mean).  Plan: one scalar agg for the global mean,
    one groupBy(cat) for the per-category stats — that table is
    CATEGORY-cardinality sized, so it broadcasts back onto the input;
    the data never shuffles on a data-sized key.
    """
    gm = df.select(F.avg(label_col)).first()[0]
    if gm is None:
        raise ValueError(f"no non-null {label_col!r} values to encode against")
    stats = (df.groupBy(cat_col)
             .agg(F.sum(label_col).alias("_sy"), F.count(label_col).alias("_n")))
    enc = ((F.col("_sy") + float(smoothing) * float(gm))
           / (F.col("_n") + float(smoothing)))
    stats = stats.select(cat_col, enc.alias("_enc"))
    out_col = out_col or f"{cat_col}_te"
    return (df.join(F.broadcast(stats), cat_col, "left")
            .withColumn(out_col, F.coalesce(F.col("_enc"), F.lit(float(gm))))
            .drop("_enc"))


def population_stability(ref: DataFrame, cur: DataFrame, col: str,
                         cuts: list[float] | None = None,
                         bins: int = 10, eps: float = 1e-6) -> DataFrame:
    """Population Stability Index between a reference window and a
    current window of one feature — the standard production drift
    monitor (PSI < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted).

    ``cuts``: explicit bin edges; default = the reference window's
    ``bins``-quantile edges via percentile_approx (pass exact edges for
    engine-exact replication).  Plan: each side is one scan + one
    vocabulary-sized (bins) aggregation; the two tiny histograms join on
    bin id.  Returns one row per bin (bin, ref_frac, cur_frac, psi_term)
    — ``sum(psi_term)`` is the PSI.
    """
    if cuts is None:
        probs = [i / bins for i in range(1, bins)]
        cuts = [float(c) for c in
                ref.agg(F.percentile_approx(col, F.lit(probs),
                                            F.lit(10000)).alias("q"))
                .first()["q"]]

    def binned(df, name):
        b = F.lit(0)
        for c in cuts:
            b = b + (F.col(col) > float(c)).cast("int")
        return (df.filter(F.col(col).isNotNull())
                .groupBy(b.alias("bin"))
                .agg(F.count("*").alias(f"n_{name}")))

    r, c = binned(ref, "ref"), binned(cur, "cur")
    tot_r = F.sum("n_ref").over(Window.partitionBy())
    tot_c = F.sum("n_cur").over(Window.partitionBy())
    j = (r.join(c, "bin", "full")
         .na.fill({"n_ref": 0, "n_cur": 0}))
    # the totals window runs over the BINS table (<= bins+1 rows), not
    # the data — a "global" window here is metadata-scale by design
    j = (j.withColumn("ref_frac", F.col("n_ref") / tot_r)
          .withColumn("cur_frac", F.col("n_cur") / tot_c))
    pr = F.greatest(F.col("ref_frac"), F.lit(float(eps)))
    pc = F.greatest(F.col("cur_frac"), F.lit(float(eps)))
    return j.withColumn("psi_term", (pc - pr) * F.log(pc / pr)) \
            .select("bin", "ref_frac", "cur_frac", "psi_term")


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Data-quality profile: one row per column with n, null_frac, min,
    max, mean, stddev — the audit a pipeline runs before training
    (schema drift, null explosions, constant columns).

    ONE scan: all per-column aggregates ride a single job, then a
    metadata-sized reshape to long form (explode of a columns-count
    array literal — no second pass over the data).
    """
    if not cols:
        raise ValueError("no columns to profile")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        v = F.col(c)
        aggs += [F.count(v).alias(f"nn_{c}"),
                 F.min(v).cast("double").alias(f"mn_{c}"),
                 F.max(v).cast("double").alias(f"mx_{c}"),
                 F.avg(v).alias(f"av_{c}"),
                 F.stddev_pop(v).alias(f"sd_{c}")]
    wide = df.agg(*aggs)
    rows = F.array(*[
        F.struct(F.lit(c).alias("column"),
                 F.col("_n").alias("n"),
                 ((F.col("_n") - F.col(f"nn_{c}")) / F.col("_n")).alias("null_frac"),
                 F.col(f"mn_{c}").alias("min"),
                 F.col(f"mx_{c}").alias("max"),
                 F.col(f"av_{c}").alias("mean"),
                 F.col(f"sd_{c}").alias("stddev"))
        for c in cols])
    return wide.select(F.explode(rows).alias("p")).select("p.*")


def fit_scaler(df: DataFrame, cols: list[str],
               method: str = "standard") -> dict[str, tuple[float, float]]:
    """One-scan scaler fit: {col: (center, scale)}.

    ``standard``: (mean, stddev_pop); ``minmax``: (min, max - min).
    The stats dict is tiny (per column) — store it next to the model and
    apply with :func:`apply_scaler` at serving time, exactly like the
    category maps.
    """
    if method == "standard":
        aggs = [a for c in cols for a in (F.avg(c).alias(f"c_{c}"),
                                          F.stddev_pop(c).alias(f"s_{c}"))]
    elif method == "minmax":
        aggs = [a for c in cols
                for a in (F.min(c).cast("double").alias(f"c_{c}"),
                          (F.max(c) - F.min(c)).cast("double").alias(f"s_{c}"))]
    else:
        raise ValueError("method must be standard|minmax")
    row = df.agg(*aggs).first()
    return {c: (float(row[f"c_{c}"]), float(row[f"s_{c}"]) or 1.0) for c in cols}


def apply_scaler(df: DataFrame, stats: dict[str, tuple[float, float]],
                 suffix: str = "_scaled") -> DataFrame:
    """(x - center) / scale per column — a pure projection that fuses
    into the scan."""
    for c, (center, scale) in stats.items():
        df = df.withColumn(f"{c}{suffix}",
                           (F.col(c) - float(center)) / float(scale))
    return df


def winsorize(df: DataFrame, cols: list[str],
              limits: dict[str, tuple[float, float]]) -> DataFrame:
    """Clip outliers to explicit [lo, hi] bounds per column (pass
    quantile edges from `operators/sketch.exact_quantiles` or
    percentile_approx for p1/p99 winsorization).  Pure projection."""
    for c in cols:
        lo, hi = limits[c]
        df = df.withColumn(c, F.least(F.greatest(F.col(c), F.lit(float(lo))),
                                      F.lit(float(hi))))
    return df
