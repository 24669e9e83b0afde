"""Probability calibration for binary classifiers.

Boosted-margin scores are often mis-calibrated as probabilities; the
two standard fixes, as distributed fits:

- Platt scaling (`fit_platt`): sigmoid(A*margin + B) with (A, B) fit by
  Newton-Raphson on the calibration set's log-loss.  Each Newton step
  is ONE aggregation job (sums of per-row gradient terms — the data
  never leaves the executors; only the 2x2 Hessian + 2-gradient comes
  back), so the whole fit is ~10 scans regardless of scale.  Uses the
  Platt (1999) target smoothing (t+ = (N+ + 1)/(N+ + 2)) to avoid
  saturated targets.
- Isotonic regression (`fit_isotonic`): monotone step-function fit via
  Spark MLlib's distributed pool-adjacent-violators.

Both return appliers that are pure column expressions.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_platt(df: DataFrame, margin_col: str, label_col: str,
              iters: int = 10) -> tuple[float, float]:
    """Fit p(y=1|m) = sigmoid(A*m + B).  Returns (A, B)."""
    n = df.agg(F.sum(F.col(label_col).cast("double")).alias("pos"),
               F.count("*").alias("n")).first()
    n_pos, n_all = float(n["pos"]), float(n["n"])
    n_neg = n_all - n_pos
    if n_pos == 0 or n_neg == 0:
        raise ValueError("calibration set needs both classes")
    t_pos = (n_pos + 1.0) / (n_pos + 2.0)
    t_neg = 1.0 / (n_neg + 2.0)
    a, b = 1.0, 0.0
    m = F.col(margin_col).cast("double")
    t = F.when(F.col(label_col).cast("double") > 0.5, t_pos).otherwise(t_neg)
    for _ in range(iters):
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-(a * m + b)))
        d = p - t                      # dL/dz per row, z = A*m + B
        w = p * (1.0 - p)              # d2L/dz2 per row
        r = df.agg(F.sum(d * m).alias("ga"), F.sum(d).alias("gb"),
                   F.sum(w * m * m).alias("haa"), F.sum(w * m).alias("hab"),
                   F.sum(w).alias("hbb")).first()
        H = np.array([[r["haa"] + 1e-12, r["hab"]],
                      [r["hab"], r["hbb"] + 1e-12]])
        g = np.array([r["ga"], r["gb"]])
        step = np.linalg.solve(H, g)
        a, b = float(a - step[0]), float(b - step[1])
        if float(np.abs(step).max()) < 1e-10:
            break
    return a, b


def apply_platt(df: DataFrame, margin_col: str, ab: tuple[float, float],
                out_col: str = "calibrated") -> DataFrame:
    a, b = ab
    m = F.col(margin_col).cast("double")
    return df.withColumn(
        out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-(float(a) * m + float(b)))))


def fit_isotonic(df: DataFrame, score_col: str, label_col: str):
    """Monotone calibration via MLlib's distributed PAV.  Returns the
    fitted IsotonicRegressionModel; apply with
    ``model.transform(df.withColumn("features", col(score)))`` or the
    convenience :func:`apply_isotonic`."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import IsotonicRegression
    va = VectorAssembler(inputCols=[score_col], outputCol="__iso_feat")
    d = va.transform(df.select(F.col(score_col).cast("double"),
                               F.col(label_col).cast("double")))
    iso = IsotonicRegression(featuresCol="__iso_feat", labelCol=label_col,
                             predictionCol="__iso_pred")
    return iso.fit(d)


def apply_isotonic(df: DataFrame, score_col: str, model,
                   out_col: str = "calibrated") -> DataFrame:
    from pyspark.ml.feature import VectorAssembler
    va = VectorAssembler(inputCols=[score_col], outputCol="__iso_feat")
    out = model.transform(va.transform(df))
    return (out.withColumn(out_col, F.col("__iso_pred"))
            .drop("__iso_feat", "__iso_pred"))
