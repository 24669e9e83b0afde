"""Multi-alpha quantile regression (reference
`src/objective/quantile_obj.cu:272` vector-alpha QuantileRegression +
`src/common/quantile_loss_utils.h` QuantileLossParam): one model, one
output per alpha."""

import numpy as np
import pandas as pd
import pytest

from xgboost_spark.config import TrainParams
from xgboost_spark.plans.booster import SparkBooster

ALPHAS = (0.1, 0.5, 0.9)


def _pinball(y, pred, alpha):
    d = y - pred
    return float(np.mean(np.where(d >= 0, alpha * d, (alpha - 1.0) * d)))


@pytest.fixture(scope="module")
def qreg_df(spark):
    rng = np.random.default_rng(19)
    n = 4000
    x = rng.uniform(0, 4, size=n)
    y = np.sin(x) + rng.normal(0, 0.3 + 0.2 * x, size=n)
    pdf = pd.DataFrame({"x": x, "x2": x ** 2, "label": y})
    return spark.createDataFrame(pdf), pdf


def test_multi_alpha_trains_one_group_per_alpha(spark, qreg_df):
    df, pdf = qreg_df
    p = TrainParams(objective="reg:quantileerror", quantile_alpha=ALPHAS,
                    num_boost_round=8, max_depth=4, max_bin=64, eta=0.3, seed=5)
    assert p.n_groups == 3
    m = SparkBooster(p).fit(df, feature_cols=["x", "x2"])
    out = m.transform(df, feature_cols=["x", "x2"]).toPandas()
    preds = np.stack(out["prediction"].to_numpy())     # (n, 3)
    assert preds.shape[1] == 3
    y = out["label"].to_numpy()
    # each output approximately covers its alpha
    for k, a in enumerate(ALPHAS):
        cov = float((y <= preds[:, k]).mean())
        assert abs(cov - a) < 0.08, (a, cov)
    # quantiles should not cross on average
    assert (preds[:, 0] <= preds[:, 2]).mean() > 0.95


def test_multi_alpha_matches_single_alpha_pinball(spark, qreg_df):
    """Per-alpha pinball loss of the joint model is in the same class
    as a separately trained single-alpha model (the oracle parity)."""
    df, pdf = qreg_df
    kw = dict(num_boost_round=8, max_depth=4, max_bin=64, eta=0.3, seed=5)
    joint = SparkBooster(TrainParams(objective="reg:quantileerror",
                                     quantile_alpha=ALPHAS, **kw)).fit(
        df, feature_cols=["x", "x2"])
    jp = np.stack(joint.transform(df, feature_cols=["x", "x2"])
                  .toPandas()["prediction"].to_numpy())
    y_joint = pdf["label"].to_numpy()
    # transform preserves all input columns; re-read labels from output
    out = joint.transform(df, feature_cols=["x", "x2"]).toPandas()
    y = out["label"].to_numpy()
    jp = np.stack(out["prediction"].to_numpy())
    for k, a in enumerate(ALPHAS):
        single = SparkBooster(TrainParams(objective="reg:quantileerror",
                                          quantile_alpha=(a,), **kw)).fit(
            df, feature_cols=["x", "x2"])
        sout = single.transform(df, feature_cols=["x", "x2"]).toPandas()
        sl = _pinball(sout["label"].to_numpy(),
                      sout["prediction"].to_numpy(), a)
        jl = _pinball(y, jp[:, k], a)
        assert jl <= sl * 1.25 + 1e-6, (a, jl, sl)


def test_multi_alpha_eval_metric(spark, qreg_df):
    """Default eval metric for vector alpha is the MEAN pinball over
    (row, alpha) pairs (reference vector-alpha QuantileLoss), evaluated
    on the matching margin column per alpha."""
    df, pdf = qreg_df
    m = SparkBooster(TrainParams(objective="reg:quantileerror",
                                 quantile_alpha=ALPHAS, num_boost_round=3,
                                 max_depth=3, max_bin=32, seed=5)).fit(
        df, feature_cols=["x", "x2"], evals=[(df, "train")])
    hist = m.eval_history["train"]
    key = "quantile@" + ",".join(str(a) for a in ALPHAS)
    assert key in hist and len(hist[key]) == 3
    out = m.transform(df, feature_cols=["x", "x2"]).toPandas()
    preds = np.stack(out["prediction"].to_numpy())
    y = out["label"].to_numpy()
    want = np.mean([_pinball(y, preds[:, k], a)
                    for k, a in enumerate(ALPHAS)])
    assert hist[key][-1] == pytest.approx(want, rel=1e-6)


def test_multi_alpha_save_load_roundtrip(spark, qreg_df, tmp_path):
    df, _ = qreg_df
    m = SparkBooster(TrainParams(objective="reg:quantileerror",
                                 quantile_alpha=ALPHAS, num_boost_round=3,
                                 max_depth=3, max_bin=32, seed=5)).fit(
        df, feature_cols=["x", "x2"])
    path = str(tmp_path / "mq.json")
    m.save(path)
    from xgboost_spark.plans.model import GBDTModel
    m2 = GBDTModel.load(path)
    a = np.stack(m.transform(df.limit(100), feature_cols=["x", "x2"])
                 .toPandas()["prediction"].to_numpy())
    b = np.stack(m2.transform(df.limit(100), feature_cols=["x", "x2"])
                 .toPandas()["prediction"].to_numpy())
    assert np.allclose(np.sort(a, axis=0), np.sort(b, axis=0))
