"""Engine replicas of the reference's own closed-form training tests
(/root/reference/tests/python/test_tree_regularization.py and
test_intercept.py): single-row DMatrix fits whose predictions have
exact algebraic values under each objective's gradient + regularizer.
These pin the ENGINE end-to-end (base score -> gradient -> stump leaf
-> serving), not just the objective kernels."""

import numpy as np
import pytest

from xgboost_spark.config import TrainParams
from xgboost_spark.local.booster import LocalBooster

X1 = np.array([[1.0]])
Y1 = np.array([1.0])


def _pred(params: dict) -> float:
    kw = dict(num_boost_round=1, max_depth=2, eta=1.0, base_score=0.5)
    kw.update(params)
    p = TrainParams(**kw)
    lb = LocalBooster(p)
    lb.fit(X1, Y1)
    return float(lb.predict(X1)[0])


def test_alpha():
    # sum_grad = -0.5, sum_hess = 1
    # 0.9 = 0.5 - (sum_grad - alpha*sgn(sum_grad)) / sum_hess
    got = _pred(dict(objective="reg:squarederror", reg_lambda=0.0,
                     reg_alpha=0.1))
    assert got == pytest.approx(0.9)


def test_lambda():
    # 0.75 = 0.5 - sum_grad / (sum_hess + lambda)
    got = _pred(dict(objective="reg:squarederror", reg_lambda=1.0,
                     reg_alpha=0.0))
    assert got == pytest.approx(0.75)


def test_alpha_and_lambda():
    got = _pred(dict(objective="reg:squarederror", reg_lambda=1.0,
                     reg_alpha=0.1))
    assert got == pytest.approx(0.7)


def test_absolute_error_lambda():
    """Reference test_tree_regularization.py::test_absolute_error_lambda:
    residual -0.5 -> automatic scale 0.5, MM curvature 1/sqrt(2);
    unregularized stump recovers the label exactly, lambda=1 shrinks by
    c/(c+1)."""
    kw = dict(objective="reg:absoluteerror", reg_alpha=0.0,
              max_depth=1, min_child_weight=0.0)
    unreg = _pred(dict(reg_lambda=0.0, **kw))
    reg = _pred(dict(reg_lambda=1.0, **kw))
    assert unreg == pytest.approx(1.0)
    c = 1.0 / np.sqrt(2.0)
    assert reg == pytest.approx(0.5 + (0.5 * c) / (c + 1.0))


def test_quantile_error_lambda():
    """Reference test_tree_regularization.py::test_quantile_error_lambda:
    tanh-smoothed pinball at alpha=0.5 with the automatic scale."""
    kw = dict(objective="reg:quantileerror", quantile_alpha=(0.5,),
              reg_alpha=0.0, max_depth=1, min_child_weight=0.0)
    unreg = _pred(dict(reg_lambda=0.0, **kw))
    reg = _pred(dict(reg_lambda=1.0, **kw))
    residual = -0.5
    scale = abs(residual)
    x = residual / (0.04 * scale)
    grad = 0.5 * scale * np.tanh(x)
    curv = 0.5 / 0.04 * np.tanh(x) / x
    assert unreg == pytest.approx(0.5 - grad / curv)
    assert reg == pytest.approx(0.5 - grad / (curv + 1.0))


def test_mae_intercept_is_mean_plus_mm_step():
    """Reference MeanAbsoluteError::InitEstimation
    (regression_obj.cu:686-739): label mean + one unregularized
    FitStump step of the MM gradient at that mean — NOT the median."""
    rng = np.random.default_rng(5)
    y = rng.gamma(2.0, 3.0, 500)          # skewed: mean != median
    lb = LocalBooster(TrainParams(objective="reg:absoluteerror",
                                  num_boost_round=0))
    lb.fit(np.zeros((500, 1)), y)
    mean = float(y.mean())
    r = mean - y
    delta = float(np.mean(np.sqrt(np.abs(r)))) ** 2
    c = delta / np.hypot(delta, r)
    want = mean + (-(r * c).sum() / max(c.sum(), 1e-6))
    assert lb.base_score == pytest.approx(want)
    assert lb.base_score != pytest.approx(float(np.median(y)), abs=1e-3)


def test_quantile_intercept_is_r6_label_quantile():
    """Reference QuantileRegression::InitEstimation: per-alpha label
    quantile with the R-6 interpolation rule (common/stats.h:34-66:
    x = alpha*(n+1), k = floor(x)-1, interpolate) — NOT numpy's
    default R-7."""
    rng = np.random.default_rng(6)
    y = rng.normal(size=101)
    alphas = (0.25, 0.5, 0.9)
    lb = LocalBooster(TrainParams(objective="reg:quantileerror",
                                  quantile_alpha=alphas,
                                  num_boost_round=0))
    lb.fit(np.zeros((101, 1)), y)
    base = np.atleast_1d(lb.base_score)
    want = [np.quantile(y, a, method="weibull") for a in alphas]  # R-6
    assert np.allclose(base, want)
    # R-7 differs on this data for the tail alpha -> the test would
    # catch an interpolation-rule regression
    assert not np.isclose(base[2], np.quantile(y, 0.9))


def test_fit_intercept_stump_objectives():
    """FitIntercept objectives (init_estimation.cc:8-27) take ONE
    Newton stump from the gradients at margin 0 — NOT the label mean:
    squaredlogerror, pseudohuber (regression_obj.cu:279 /
    pseudohuber_obj.cc:28)."""
    from xgboost_spark.functions.objectives import get_objective
    rng = np.random.default_rng(8)
    y = rng.gamma(2.0, 2.0, 400)
    for name in ("reg:squaredlogerror", "reg:pseudohubererror"):
        obj = get_objective(name, None)
        g, h = obj.grad_hess(y, np.zeros_like(y), None)
        want = -g.sum() / max(h.sum(), 1e-6)
        assert obj.base_score(y, None) == pytest.approx(want)
        assert obj.base_score(y, None) != pytest.approx(float(y.mean()),
                                                        rel=1e-3)


def test_hinge_intercept_is_indicator():
    """HingeObj : FitIntercept + hinge's own PredTransform: the stump
    passes through the 0/1 indicator, so the intercept is exactly 0.0
    or 1.0 (hinge.cc:28, init_estimation.cc:26)."""
    from xgboost_spark.functions.objectives import get_objective
    obj = get_objective("binary:hinge", None)
    mostly_pos = np.array([1.0] * 9 + [0.0])
    mostly_neg = np.array([0.0] * 9 + [1.0])
    assert obj.base_score(mostly_pos, None) == 1.0
    assert obj.base_score(mostly_neg, None) == 0.0


def test_rank_and_aft_intercepts():
    """LambdaRank (FitIntercept over antisymmetric pair gradients) gets
    exactly 0; AFTObj does not override InitEstimation, so it gets the
    plain DefaultBaseScore 0.5 (objective.cc:34-38)."""
    from xgboost_spark.functions.objectives import get_objective
    rank = get_objective("rank:ndcg", None)
    assert rank.base_score(np.array([1.0, 0.0]), None) == 0.0
    aft = get_objective("survival:aft", None)
    assert aft.base_score_bounds(np.array([1.0, 2.0]),
                                 np.array([1.0, 2.0]), None) == 0.5


def test_cox_intercept_is_breslow_stump(spark):
    """CoxRegression : FitIntercept (regression_obj.cu:517): the
    distributed base score equals the local Breslow stump at margin 0
    (exp PredTransform and log ProbToMargin cancel)."""
    from xgboost_spark.functions.objectives import get_objective
    from xgboost_spark.plans.booster import SparkBooster
    import pandas as pd
    rng = np.random.default_rng(9)
    t = rng.gamma(2.0, 1.0, 300)
    event = rng.random(300) < 0.7
    y = np.where(event, t, -t)           # negative = censored
    obj = get_objective("survival:cox", None)
    want = obj.base_score(y, None)
    pdf = pd.DataFrame({"x": rng.normal(size=300), "label": y})
    df = spark.createDataFrame(pdf).repartition(5)
    sb = SparkBooster(TrainParams(objective="survival:cox",
                                  num_boost_round=1, max_depth=2))
    from xgboost_spark.sources.tables import assemble_features
    raw, _ = assemble_features(df, feature_cols=["x"], label_col="label")
    got = sb._base_score(raw)
    assert got == pytest.approx(want, rel=1e-9)
