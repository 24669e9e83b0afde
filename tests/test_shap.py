"""TreeSHAP contributions: brute-force Shapley oracle, local accuracy,
Spark transform surface.  Reference analog: tests/python/test_shap.py
(+ src/predictor/interpretability/shap.cc as the algorithm source)."""

from itertools import combinations
from math import factorial

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from xgboost_spark import core
from xgboost_spark.config import TrainParams
from xgboost_spark.functions import shap as S
from xgboost_spark.local.booster import LocalBooster
from xgboost_spark.plans.booster import train


@pytest.fixture(scope="module")
def shap_tree():
    rng = np.random.default_rng(0)
    n, F = 500, 5
    X = rng.normal(size=(n, F))
    X[rng.random((n, F)) < 0.1] = np.nan
    y = (2 * np.nan_to_num(X[:, 0]) + np.where(np.isnan(X[:, 1]), 0.5, X[:, 1] ** 2)
         - np.nan_to_num(X[:, 2]).clip(-1, 1) + rng.normal(0, 0.1, n))
    p = TrainParams(num_boost_round=1, max_depth=4, base_score=0.0)
    lb = LocalBooster(p).fit(X, y)
    t = lb.trees[0][0]
    return t.finalize_arrays(), np.asarray(t.sum_hess), X, t


def _expvalue(a, cover, xrow, Sset, nid=0):
    """Conditional expectation E[f(x) | x_S] with cover weighting —
    the Shapley value function for trees."""
    if a["left"][nid] == -1:
        return a["leaf_value"][nid]
    f = int(a["feature"][nid])
    lid, rid = int(a["left"][nid]), int(a["right"][nid])
    if f in Sset:
        go_left = (a["default_left"][nid] if np.isnan(xrow[f])
                   else xrow[f] <= a["split_value"][nid])
        return _expvalue(a, cover, xrow, Sset, lid if go_left else rid)
    cl, cr = cover[lid], cover[rid]
    return (cl * _expvalue(a, cover, xrow, Sset, lid)
            + cr * _expvalue(a, cover, xrow, Sset, rid)) / (cl + cr)


def _brute_shap(a, cover, xrow, F):
    phi = np.zeros(F + 1)
    phi[F] = _expvalue(a, cover, xrow, frozenset())
    for i in range(F):
        rest = [f for f in range(F) if f != i]
        for k in range(F):
            for Sc in combinations(rest, k):
                w = factorial(k) * factorial(F - k - 1) / factorial(F)
                phi[i] += w * (_expvalue(a, cover, xrow, frozenset(Sc) | {i})
                               - _expvalue(a, cover, xrow, frozenset(Sc)))
    return phi


def test_tree_shap_matches_brute_force(shap_tree):
    a, cover, X, _ = shap_tree
    rows = X[:10]
    fast = S.tree_shap(a, cover, rows)
    brute = np.stack([_brute_shap(a, cover, r, 5) for r in rows])
    assert np.abs(fast - brute).max() < 1e-12


def test_vectorized_matches_scalar_kernel(shap_tree):
    a, cover, X, _ = shap_tree
    rows = X[:40]
    vec = S.tree_shap(a, cover, rows)
    sca = np.stack([S._tree_shap_row(a, cover, r, 5) for r in rows])
    assert np.abs(vec - sca).max() < 1e-13
    for cond in (1, -1):
        for cf in (0, 2):
            vec = S.tree_shap(a, cover, rows, condition=cond, condition_feature=cf)
            sca = np.stack([S._tree_shap_row(a, cover, r, 5, condition=cond,
                                             condition_feature=cf) for r in rows])
            assert np.abs(vec - sca).max() < 1e-13, (cond, cf)


def test_tree_shap_local_accuracy(shap_tree):
    a, cover, X, t = shap_tree
    phi = S.tree_shap(a, cover, X[:100])
    pred = core.tree_predict(t, X[:100], binned=False)
    assert np.abs(phi.sum(1) - pred).max() < 1e-12


def test_saabas_local_accuracy(shap_tree):
    a, cover, X, t = shap_tree
    phi = S.saabas_contribs(a, cover, X[:100])
    pred = core.tree_predict(t, X[:100], binned=False)
    assert np.abs(phi.sum(1) - pred).max() < 1e-12


def test_interactions_consistent(shap_tree):
    a, cover, X, t = shap_tree
    rows = X[:6]
    phi = S.tree_shap(a, cover, rows)
    inter = S.tree_shap_interactions(a, cover, rows)
    pred = core.tree_predict(t, rows, binned=False)
    assert np.abs(inter.sum(2) - phi).max() < 1e-12     # rows sum to phi
    assert np.abs(inter.sum((1, 2)) - pred).max() < 1e-12
    assert np.abs(inter - inter.transpose(0, 2, 1)).max() == 0.0  # symmetric


def test_spark_transform_contribs(spark, reg_df, reg_data):
    X, y = reg_data
    fcols = [f"c{i}" for i in range(5)]
    model = train({"num_boost_round": 3, "max_depth": 3}, reg_df, feature_cols=fcols)
    out = model.transform(reg_df.limit(200), feature_cols=fcols,
                          output_margin=True, pred_contribs=True).toPandas()
    contribs = np.stack(out["contribs"].to_numpy())
    margin = np.stack(out["margin"].to_numpy())[:, 0]
    assert contribs.shape[1] == 6
    assert np.abs(contribs.sum(1) - margin).max() < 1e-9   # local accuracy e2e


def test_spark_multiclass_contribs(spark, reg_df):
    """Per-class contributions for K>1 (reference multiclass
    pred_contribs, tests/python/test_shap.py): sum(contribs_k) equals
    margin_k for every class."""
    fcols = [f"c{i}" for i in range(5)]
    labels = (F.abs(F.hash(*[F.col(c) for c in fcols])) % 3).cast("double")
    df3 = reg_df.withColumn("label", labels)
    model = train({"num_boost_round": 3, "max_depth": 3,
                   "objective": "multi:softprob", "num_class": 3},
                  df3, feature_cols=fcols)
    out = model.transform(df3.limit(100), feature_cols=fcols,
                          output_margin=True, pred_contribs=True,
                          pred_interactions=True).toPandas()
    contribs = np.stack([np.stack(r) for r in out["contribs"]])   # (n,3,6)
    inter = np.stack([np.stack(r) for r in out["interactions"]]).reshape(-1, 3, 6, 6)
    margin = np.stack(out["margin"].to_numpy())                   # (n,3)
    assert contribs.shape[1:] == (3, 6)
    assert np.abs(contribs.sum(2) - margin).max() < 1e-9
    assert np.abs(inter.sum(3) - contribs).max() < 1e-9


def test_spark_transform_interactions(spark, reg_df):
    fcols = [f"c{i}" for i in range(5)]
    model = train({"num_boost_round": 2, "max_depth": 3}, reg_df, feature_cols=fcols)
    out = model.transform(reg_df.limit(50), feature_cols=fcols,
                          pred_contribs=True, pred_interactions=True).toPandas()
    inter = np.stack(out["interactions"].to_numpy()).reshape(-1, 6, 6)
    contribs = np.stack(out["contribs"].to_numpy())
    assert np.abs(inter.sum(2) - contribs).max() < 1e-9
