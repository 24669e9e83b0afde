"""Custom objective / custom metric UDF surface (reference
`Learner::BoostOneIter` `include/xgboost/learner.h:90`,
``xgb.train(obj=..., custom_metric=...)`` `training.py:53`)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xgboost_spark.config import TrainParams
from xgboost_spark.plans.booster import SparkBooster, train


def _make_squared_error():
    # closure => cloudpickle serializes by value (test modules are not
    # importable on executors; real user modules are)
    def squared_error_fn(y, margin, w):
        g = margin - y
        h = np.ones_like(y)
        if w is not None:
            g, h = g * w, h * w
        return g, h
    return squared_error_fn


def _make_log_cosh():
    def log_cosh_fn(y, margin, w):
        d = margin - y
        # hessian floored: saturated tanh would otherwise allow huge
        # Newton steps (standard log-cosh practice)
        return np.tanh(d), np.maximum(1.0 - np.tanh(d) ** 2, 0.1)
    return log_cosh_fn


def rmse_feval(ev_df):
    r = ev_df.agg(F.sqrt(F.avg((F.col("m0") - F.col("y")) ** 2)).alias("v")).first()
    return "my-rmse", float(r["v"])


FC = [f"c{i}" for i in range(5)]


def test_custom_objective_matches_builtin(spark, reg_df):
    kw = dict(num_boost_round=3, max_depth=3, max_bin=32, seed=1)
    mc = train(TrainParams(**kw), reg_df, obj=_make_squared_error(),
               feature_cols=FC, label_col="label")
    mb = train(TrainParams(objective="reg:squarederror", **kw), reg_df,
               feature_cols=FC, label_col="label")
    assert abs(mc.base_score - mb.base_score) < 1e-6
    for ra, rb in zip(mc.trees, mb.trees):
        for ta, tb in zip(ra, rb):
            assert list(ta.feature) == list(tb.feature)
            assert list(ta.split_bin) == list(tb.split_bin)
            np.testing.assert_allclose(ta.leaf_value, tb.leaf_value, atol=1e-9)


def test_custom_objective_log_cosh_trains(spark, reg_df):
    m = train(TrainParams(num_boost_round=10, max_depth=3, max_bin=32, eta=0.3),
              reg_df, obj=_make_log_cosh(), feature_cols=FC, label_col="label")
    pred = m.transform(reg_df, feature_cols=FC)
    mae = pred.agg(F.avg(F.abs(F.col("prediction") - F.col("label")))).first()[0]
    mae0 = reg_df.agg(
        F.avg(F.abs(F.lit(m.base_score) - F.col("label")))).first()[0]
    assert mae < mae0  # improves on its own stump fit


@pytest.mark.slow
def test_custom_metric_history_and_early_stop(spark, reg_df):
    p = TrainParams(num_boost_round=12, max_depth=3, max_bin=32,
                    early_stopping_rounds=3)
    m = SparkBooster(p).fit(reg_df, feature_cols=FC, label_col="label",
                            evals=[(reg_df, "val")],
                            custom_metric=rmse_feval, maximize=False)
    hist = m.eval_history["val"]["my-rmse"]
    assert len(hist) >= 2
    assert hist[-1] <= hist[0]  # train rmse decreases on train-as-val
