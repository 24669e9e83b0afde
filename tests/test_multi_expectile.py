"""Multi-alpha expectile regression: the reference's SoftPlus-stacked
monotone composition (regression_obj.cu:340-500 ExpectileRegression) —
gradient kernel, InitEstimation/ProbToMargin intercepts, PredTransform,
and end-to-end vector training."""

import numpy as np
import pandas as pd
import pytest

from xgboost_spark.config import TrainParams
from xgboost_spark.functions.objectives import (
    Expectile, _RT_EPS, _softplus, _softplus_inv, get_objective)

ALPHAS = (0.1, 0.5, 0.9)


def _loss(y, margin, alphas, w=None):
    """Total half-loss of the stacked composition, for finite diffs."""
    obj = Expectile(alphas)
    pred = obj._stack_preds(margin)
    d = pred - y[:, None]
    al = np.asarray(alphas)[None, :]
    ws = np.where(d >= 0, 1.0 - al, al)
    per = 0.5 * ws * d * d
    if w is not None:
        per = per * w[:, None]
    return per.sum(axis=1)


def test_stacked_preds_monotone_by_construction():
    rng = np.random.default_rng(0)
    m = rng.normal(0, 3, size=(500, len(ALPHAS)))
    pred = Expectile(ALPHAS)._stack_preds(m)
    assert (np.diff(pred, axis=1) > 0).all()


def test_softplus_inv_roundtrip():
    # exact only where softplus(x) >= kRtEps: SoftPlusInv clamps its
    # input at kRtEps (common/math.h:99), flooring x at ~-13.8
    x = np.linspace(-13, 20, 331)
    assert np.allclose(_softplus_inv(_softplus(x)), x, atol=1e-8)
    assert _softplus_inv(np.array([1e-9]))[0] == pytest.approx(
        _softplus_inv(np.array([_RT_EPS]))[0])


def test_vector_grad_finite_diff():
    """Each target j's gradient = d/dm_j of the summed stacked loss
    (reference GetGradient kernel, regression_obj.cu:381-405)."""
    rng = np.random.default_rng(1)
    n, K = 300, len(ALPHAS)
    y = rng.normal(size=n)
    m = rng.normal(0, 0.5, size=(n, K))
    w = rng.uniform(0.5, 2.0, n)
    obj = Expectile(ALPHAS)
    g, h = obj.grad_hess(y, m, w)
    assert g.shape == h.shape == (n, K)
    eps = 1e-6
    for j in range(K):
        mp, mm = m.copy(), m.copy()
        mp[:, j] += eps
        mm[:, j] -= eps
        g_fd = (_loss(y, mp, ALPHAS, w) - _loss(y, mm, ALPHAS, w)) / (2 * eps)
        mask = np.abs(g_fd) > 1e-8
        assert np.allclose(g[mask, j], g_fd[mask], rtol=1e-3, atol=1e-5), j
    # hessian is the reference's diagonal Gauss-Newton surrogate
    # (scale^2 * sum ws), not the exact second derivative: check
    # positivity and the scale structure instead
    assert (h > 0).all()
    sig = 1.0 / (1.0 + np.exp(-m))
    al = np.asarray(ALPHAS)[None, :]
    d = obj._stack_preds(m) - y[:, None]
    ws = np.where(d >= 0, 1.0 - al, al) * w[:, None]
    hs = np.cumsum(ws[:, ::-1], axis=1)[:, ::-1]
    expect = sig * sig * hs
    expect[:, 0] = hs[:, 0]
    assert np.allclose(h, expect, rtol=1e-12)


def test_scalar_path_unchanged():
    rng = np.random.default_rng(2)
    y = rng.normal(size=100)
    m = rng.normal(size=100)
    g, h = Expectile(0.8).grad_hess(y, m, None)
    k = np.where(m - y >= 0, 0.2, 0.8)
    assert np.allclose(g, k * (m - y)) and np.allclose(h, k)


def test_init_estimation_numpy():
    """base_score = mean + unregularized Newton step, clamped monotone
    (regression_obj.cu:409-455); scalar hook on the objective."""
    rng = np.random.default_rng(3)
    y = rng.normal(2.0, 1.5, 4000)
    w = rng.uniform(0.5, 2.0, 4000)
    for a in (0.2, 0.5, 0.9):
        bs = Expectile(a).base_score(y, w)
        mean = (y * w).sum() / w.sum()
        d = mean - y
        ws = np.where(d >= 0, 1 - a, a) * w
        expect = mean - (ws * d).sum() / max(ws.sum(), _RT_EPS)
        assert bs == pytest.approx(expect, rel=1e-12)
    # ordering: higher alpha -> higher intercept
    b = [Expectile(a).base_score(y, w) for a in (0.1, 0.5, 0.9)]
    assert b[0] < b[1] < b[2]


def test_spark_base_score_vector(spark):
    """SparkBooster._base_score for the vector objective returns the
    ProbToMargin raw-space intercepts; stacking them back reproduces the
    clamped expectile-space values (regression_obj.cu:478-485)."""
    from xgboost_spark.plans.booster import SparkBooster
    rng = np.random.default_rng(4)
    y = rng.gamma(2.0, 1.5, 3000)
    df = spark.createDataFrame(pd.DataFrame({"label": y, "c0": rng.normal(size=3000)}))
    p = TrainParams(objective="reg:expectileerror", expectile_alpha=ALPHAS)
    bs = SparkBooster(p)._base_score(df.select("label"))
    assert isinstance(bs, np.ndarray) and bs.shape == (3,)
    # NumPy replica of InitEstimation
    mean = y.mean()
    d = mean - y
    out = np.array([mean - (np.where(d >= 0, 1 - a, a) * d).sum()
                    / max(np.where(d >= 0, 1 - a, a).sum(), _RT_EPS)
                    for a in ALPHAS])
    np.maximum.accumulate(out, out=out)
    stacked = bs.copy()
    stacked[1:] = _RT_EPS + _softplus(bs[1:])
    stacked = np.cumsum(stacked)
    assert np.allclose(stacked, out, atol=1e-9)


@pytest.fixture(scope="module")
def het_df(spark):
    """Heteroscedastic y | x: spread grows with x, so expectile bands
    must fan out — a real signal for all three alphas."""
    rng = np.random.default_rng(5)
    n = 6000
    x = rng.uniform(0, 4, n)
    y = 2.0 * x + rng.normal(0, 0.5 + 0.5 * x, n)
    pdf = pd.DataFrame({"x": x, "x2": rng.normal(size=n), "label": y})
    return spark.createDataFrame(pdf), pdf


@pytest.mark.slow
@pytest.mark.parametrize("exec_mode", ["barrier", "dataframe"])
def test_multi_expectile_end_to_end(spark, het_df, exec_mode):
    from xgboost_spark.plans.booster import train
    df, pdf = het_df
    model = train({"objective": "reg:expectileerror",
                   "expectile_alpha": ALPHAS, "num_boost_round": 8,
                   "max_depth": 3, "eta": 0.3, "exec_mode": exec_mode},
                  df, feature_cols=["x", "x2"],
                  evals=[(df, "train")])
    assert model.params.n_groups == 3
    assert model.base_score_vec is not None
    out = model.transform(df, feature_cols=["x", "x2"]).toPandas()
    P = np.stack(out["prediction"].to_numpy())
    assert P.shape == (len(pdf), 3)
    # monotone by construction, strictly fanning out on this data
    assert (np.diff(P, axis=1) > 0).all()
    # each column approximates ITS expectile: the empirical expectile
    # identity  E[ws * (y - pred)] = 0  with ws = alpha on
    # under-prediction, (1-alpha) on over -- check the normalized
    # imbalance is small per alpha
    yv = out["label"].to_numpy()
    for j, a in enumerate(ALPHAS):
        d = yv - P[:, j]
        ws = np.where(d >= 0, a, 1 - a)
        imbalance = (ws * d).mean() / np.abs(d).mean()
        assert abs(imbalance) < 0.08, (a, imbalance)
    # training reduced the vector expectile loss
    hist = model.eval_history["train"]
    key = "expectile@" + ",".join(str(a) for a in ALPHAS)
    assert key in hist
    assert hist[key][-1] < hist[key][0]


def test_vector_serving_paths_agree(spark, het_df):
    """UDF transform and the Catalyst transform_expr must produce the
    same stacked expectile vectors."""
    from xgboost_spark.plans.booster import train
    df, pdf = het_df
    model = train({"objective": "reg:expectileerror",
                   "expectile_alpha": (0.25, 0.75), "num_boost_round": 4,
                   "max_depth": 2}, df, feature_cols=["x", "x2"])
    a = np.stack(model.transform(df, feature_cols=["x", "x2"])
                 .toPandas()["prediction"].to_numpy())
    b = np.stack(model.transform_expr(df, feature_cols=["x", "x2"])
                 .toPandas()["prediction"].to_numpy())
    assert np.allclose(a, b, atol=1e-9)


def test_legacy_quantile_alpha_borrow():
    """Configs predating expectile_alpha keep working: quantile_alpha
    feeds the expectile levels when expectile_alpha is unset."""
    p = TrainParams(objective="reg:expectileerror", quantile_alpha=(0.8,))
    obj = get_objective("reg:expectileerror", p)
    assert obj.alphas == (0.8,)
    assert p.n_groups == 1
    p2 = TrainParams(objective="reg:expectileerror",
                     expectile_alpha=(0.1, 0.9))
    assert p2.n_groups == 2
    assert get_objective("reg:expectileerror", p2).alphas == (0.1, 0.9)


def test_vector_expectile_save_load_roundtrip(spark, het_df, tmp_path):
    """A vector-expectile model must survive JSON and UBJSON
    round-trips: expectile_alpha (else n_groups collapses to 1 on
    load), the raw-space base_score_vec, and identical predictions."""
    from xgboost_spark.plans.booster import train
    from xgboost_spark.plans.model import GBDTModel
    df, pdf = het_df
    model = train({"objective": "reg:expectileerror",
                   "expectile_alpha": ALPHAS, "num_boost_round": 3,
                   "max_depth": 2}, df, feature_cols=["x", "x2"])
    want = np.stack(model.transform(df, feature_cols=["x", "x2"])
                    .toPandas()["prediction"].to_numpy())
    for ext in ("json", "ubj"):
        p = str(tmp_path / f"m.{ext}")
        model.save(p)
        back = GBDTModel.load(p)
        assert back.params.n_groups == 3
        assert tuple(back.params.expectile_alphas) == ALPHAS
        assert np.allclose(back.base_score_vec, model.base_score_vec)
        got = np.stack(back.transform(df, feature_cols=["x", "x2"])
                       .toPandas()["prediction"].to_numpy())
        assert np.allclose(got, want, atol=1e-12), ext


def test_reference_dialect_output_space_intercepts(spark, het_df):
    """The reference JSON dialect stores base_score in OUTPUT space
    (stacked expectiles); loading without the engine-extension block
    must invert with the expectile ProbToMargin, not the identity
    link (regression_obj.cu:478-485)."""
    import json as _json
    from xgboost_spark.plans.booster import train
    from xgboost_spark.plans.model import GBDTModel
    df, _ = het_df
    model = train({"objective": "reg:expectileerror",
                   "expectile_alpha": ALPHAS, "num_boost_round": 2,
                   "max_depth": 2}, df, feature_cols=["x", "x2"])
    doc = _json.loads(model.to_json())
    # the written learner field is the STACKED output-space vector
    bs_out = np.array([float(x) for x in
                       doc["learner"]["learner_model_param"]["base_score"]
                       .strip("[]").split(",")])
    assert (np.diff(bs_out) > 0).all()
    stacked = model.base_score_vec.copy()
    stacked[1:] = _RT_EPS + _softplus(model.base_score_vec[1:])
    assert np.allclose(bs_out, np.cumsum(stacked), rtol=1e-12)
    # strip the engine extension -> pure reference dialect
    doc.pop("xgboost_spark")
    back = GBDTModel.from_json(_json.dumps(doc))
    # raw-space intercepts recovered through SoftPlusInv
    assert np.allclose(back.base_score_vec, model.base_score_vec,
                       atol=1e-9)
    # the objective block's expectile_loss_param (string-encoded like
    # the reference's SaveConfig) must restore the alphas — without it
    # n_groups collapses to 1, the trees regroup wrongly, and serving
    # silently sums every group into a scalar
    assert back.params.n_groups == 3
    assert tuple(back.params.expectile_alphas) == ALPHAS
    got = np.stack(back.transform(df, feature_cols=["x", "x2"])
                   .toPandas()["prediction"].to_numpy())
    want = np.stack(model.transform(df, feature_cols=["x", "x2"])
                    .toPandas()["prediction"].to_numpy())
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-9)


def test_local_booster_vector_intercepts(het_df):
    """The local (pip-parity proxy) trainer must use the vector
    InitEstimation for stacked expectiles — a scalar broadcast would
    put the first expectile's OUTPUT-space value into every GAP margin
    (wrong domain, no Newton step, no clamp)."""
    from xgboost_spark.local.booster import LocalBooster
    _, pdf = het_df
    X = pdf[["x", "x2"]].to_numpy(np.float64)
    y = pdf["label"].to_numpy(np.float64)
    p = TrainParams(objective="reg:expectileerror", expectile_alpha=ALPHAS,
                    num_boost_round=4, max_depth=3)
    b = LocalBooster(p).fit(X, y)
    assert np.asarray(b.base_score).shape == (3,)
    assert np.allclose(b.base_score,
                       Expectile(ALPHAS).base_score_vec(y, None))
    P = b.predict(X)
    assert P.shape == (len(y), 3)
    assert (np.diff(P, axis=1) > 0).all()
    # each column near its expectile: normalized identity imbalance
    for j, a in enumerate(ALPHAS):
        d = y - P[:, j]
        ws = np.where(d >= 0, a, 1 - a)
        assert abs((ws * d).mean() / np.abs(d).mean()) < 0.1, a


def test_barrier_partial_mismatch_raises():
    """metric_partial_np mirrors compute_metric's CHECK: multi-alpha
    metric + wrong margin width raises instead of silently scoring
    alphas[0] (round-9 review finding)."""
    from xgboost_spark.functions import metrics as M
    rng = np.random.default_rng(3)
    y = rng.normal(size=50)
    m = rng.normal(size=(50, 1))
    with pytest.raises(ValueError, match="alphas but margin"):
        M.metric_partial_np("expectile@0.3,0.8", y, m, None)
    with pytest.raises(ValueError, match="alphas but margin"):
        M.metric_partial_np("quantile@0.1,0.5,0.9", y, m, None)
    # and 'rmse-' must NOT be claimed barrier-computable (the minus
    # suffix is defined for rank metrics only)
    assert not M.barrier_metric_supported("rmse-", has_qid=True)
    assert M.barrier_metric_supported("map-", has_qid=True)


def test_expectile_uniform_convergence(spark):
    """Reference analog tests/python/test_eval_metrics.py:264: on
    Uniform(0,1) labels with a constant feature, boosting pure
    intercept corrections converges to the closed-form expectile
    sqrt(a) / (sqrt(a) + sqrt(1-a))."""
    from xgboost_spark.plans.booster import train
    rng = np.random.default_rng(42)
    n = 1000
    pdf = pd.DataFrame({"x": np.zeros(n), "label": rng.random(n)})
    df = spark.createDataFrame(pdf)
    for alpha in (0.1, 0.5, 0.9):
        m = train({"objective": "reg:expectileerror",
                   "expectile_alpha": (alpha,), "num_boost_round": 200,
                   "max_depth": 1, "min_child_weight": 0.0, "gamma": 0.0,
                   "reg_lambda": 0.0, "eta": 0.2}, df, feature_cols=["x"])
        pred = float(m.transform(df, feature_cols=["x"])
                     .agg({"prediction": "avg"}).first()[0])
        sa, sb = np.sqrt(alpha), np.sqrt(1.0 - alpha)
        assert pred == pytest.approx(sa / (sa + sb), abs=1e-2), alpha


def test_expectile_multi_output_tree(spark):
    """Reference analog testing/multi_target.py:175 run_expectile_loss:
    vector expectile under multi_strategy=multi_output_tree (ONE tree
    per round with vector leaves) keeps curves non-crossing and the
    vector expectile loss non-increasing."""
    from xgboost_spark.plans.booster import train
    rng = np.random.default_rng(2027)
    n = 2048
    X = rng.normal(size=(n, 4))
    y = X[:, 0] - 0.5 * X[:, 1] + rng.normal(size=n)
    pdf = pd.DataFrame(X, columns=[f"f{i}" for i in range(4)])
    pdf["label"] = y
    df = spark.createDataFrame(pdf)
    fcols = [f"f{i}" for i in range(4)]
    m = train({"objective": "reg:expectileerror",
               "expectile_alpha": (0.45, 0.5, 0.55),
               "multi_strategy": "multi_output_tree",
               "num_boost_round": 10, "max_depth": 4},
              df, feature_cols=fcols, evals=[(df, "train")])
    P = np.stack(m.transform(df, feature_cols=fcols)
                 .toPandas()["prediction"].to_numpy())
    assert P.shape == (n, 3)
    assert (np.diff(P, axis=1) > 0).all()
    hist = m.eval_history["train"]["expectile@0.45,0.5,0.55"]
    assert all(a >= b - 1e-9 for a, b in zip(hist, hist[1:]))


def test_vector_eval_metric_width_checked_upfront(spark, het_df):
    """A vector-alpha eval metric that can't match the model's output
    width fails BEFORE training starts, not mid-barrier-job."""
    from xgboost_spark.plans.booster import train
    df, _ = het_df
    with pytest.raises(ValueError, match="output group"):
        train({"objective": "reg:squarederror", "num_boost_round": 2,
               "max_depth": 2, "eval_metric": ["expectile@0.3,0.8"]},
              df, feature_cols=["x", "x2"], evals=[(df, "train")])
    with pytest.raises(ValueError, match="output group"):
        train({"objective": "reg:expectileerror",
               "expectile_alpha": (0.1, 0.5, 0.9), "num_boost_round": 2,
               "max_depth": 2, "eval_metric": ["quantile@0.25,0.75"]},
              df, feature_cols=["x", "x2"], evals=[(df, "train")])
    # matching width passes through
    m = train({"objective": "reg:expectileerror",
               "expectile_alpha": (0.2, 0.8), "num_boost_round": 2,
               "max_depth": 2, "eval_metric": ["expectile@0.2,0.8"]},
              df, feature_cols=["x", "x2"], evals=[(df, "train")])
    assert "expectile@0.2,0.8" in m.eval_history["train"]
