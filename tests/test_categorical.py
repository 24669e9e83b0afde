"""Categorical splits: one-hot and sorted set-partition.
Reference analogs: EnumerateOneHot evaluate_splits.h:64, EnumeratePart
:119-192, ordinal encoding src/encoder/ordinal.h."""

import numpy as np
import pandas as pd
import pytest

from xgboost_spark import core
from xgboost_spark.config import TrainParams
from xgboost_spark.local.booster import LocalBooster
from xgboost_spark.plans.booster import train
from xgboost_spark.plans.model import GBDTModel


@pytest.fixture(scope="module")
def cat_data():
    """y depends on category membership: cats {0,3,7} high, rest low,
    plus a numeric effect."""
    rng = np.random.default_rng(21)
    n = 4000
    c = rng.integers(0, 10, n).astype(float)
    x = rng.normal(size=n)
    y = np.where(np.isin(c, [0, 3, 7]), 5.0, -2.0) + 0.5 * x + rng.normal(0, 0.2, n)
    X = np.column_stack([c, x])
    return X, y


def test_partition_split_finds_category_set(cat_data):
    X, y = cat_data
    p = TrainParams(num_boost_round=1, max_depth=1, base_score=0.0, eta=1.0)
    lb = LocalBooster(p).fit(X, y, cat_features=np.array([True, False]))
    t = lb.trees[0][0]
    assert t.feature[0] == 0                    # split on the categorical
    assert t.categories[0] is not None
    # the learned left set must be exactly {0,3,7} or its complement
    s = set(t.categories[0])
    assert s == {0, 3, 7} or s == {1, 2, 4, 5, 6, 8, 9}


def test_max_cat_threshold_bounds_partition(cat_data):
    """max_cat_threshold (reference param.h:42): the partition scan
    considers at most thr-1 set sizes from each end of the sorted
    order, so the chosen split has a small side of <= thr-1 cats."""
    X, y = cat_data
    p = TrainParams(num_boost_round=1, max_depth=1, base_score=0.0,
                    eta=1.0, max_cat_threshold=3, max_cat_to_onehot=1)
    lb = LocalBooster(p).fit(X, y, cat_features=np.array([True, False]))
    t = lb.trees[0][0]
    if t.categories[0] is not None:
        n_left = len(t.categories[0])
        n_present = 10
        assert min(n_left, n_present - n_left) <= 2
    # default threshold (64) is unconstraining: identical to unbounded
    p2 = TrainParams(num_boost_round=1, max_depth=1, base_score=0.0, eta=1.0)
    t2 = LocalBooster(p2).fit(X, y, cat_features=np.array([True, False])).trees[0][0]
    assert set(t2.categories[0]) in ({0, 3, 7}, {1, 2, 4, 5, 6, 8, 9})


def test_onehot_gate(cat_data):
    rng = np.random.default_rng(5)
    n = 2000
    c = rng.integers(0, 3, n).astype(float)     # 3 cats < max_cat_to_onehot
    y = np.where(c == 1, 4.0, 0.0) + rng.normal(0, 0.1, n)
    X = np.column_stack([c, rng.normal(size=n)])
    p = TrainParams(num_boost_round=1, max_depth=1, base_score=0.0, eta=1.0)
    lb = LocalBooster(p).fit(X, y, cat_features=np.array([True, False]))
    t = lb.trees[0][0]
    assert t.categories[0] is not None
    assert len(t.categories[0]) == 1            # one-hot: single category side


def test_categorical_predictions_route_correctly(cat_data):
    X, y = cat_data
    p = TrainParams(num_boost_round=5, max_depth=3, base_score=0.0)
    lb = LocalBooster(p).fit(X, y, cat_features=np.array([True, False]))
    pred = lb.predict(X)
    rmse = float(np.sqrt(np.mean((pred - y) ** 2)))
    assert rmse < 1.0
    # numeric-only model must be clearly worse: codes {0,3,7} are not
    # linearly separable by <= threshold splits at depth 1
    p1 = TrainParams(num_boost_round=1, max_depth=1, base_score=0.0, eta=1.0)
    lb_cat = LocalBooster(p1).fit(X, y, cat_features=np.array([True, False]))
    lb_num = LocalBooster(p1).fit(X, y)
    r_cat = np.sqrt(np.mean((lb_cat.predict(X) - y) ** 2))
    r_num = np.sqrt(np.mean((lb_num.predict(X) - y) ** 2))
    assert r_cat < r_num * 0.7


def test_spark_categorical_parity_and_json(spark, cat_data, tmp_path):
    X, y = cat_data
    pdf = pd.DataFrame({"cat": X[:, 0], "num": X[:, 1], "label": y})
    df = spark.createDataFrame(pdf)
    model = train({"num_boost_round": 5, "max_depth": 3, "base_score": 0.0},
                  df, feature_cols=["cat", "num"], label_col="label",
                  categorical_features=["cat"])
    has_cat_split = any(
        t.categories[i] is not None
        for rnd in model.trees for t in rnd for i in range(t.n_nodes))
    assert has_cat_split
    out = model.transform(df, feature_cols=["cat", "num"]).toPandas()
    rmse = float(np.sqrt(np.mean((out["prediction"].to_numpy() - y) ** 2)))
    assert rmse < 1.0
    # JSON round trip preserves category sets and predictions
    path = str(tmp_path / "cat.json")
    model.save(path)
    loaded = GBDTModel.load(path)
    out2 = loaded.transform(df.limit(500), feature_cols=["cat", "num"]).toPandas()
    assert np.allclose(out["prediction"].to_numpy()[:500],
                       out2["prediction"].to_numpy(), atol=1e-12)


def test_spark_local_structural_parity_categorical(spark, cat_data):
    X, y = cat_data
    pdf = pd.DataFrame({"cat": X[:, 0], "num": X[:, 1], "label": y})
    df = spark.createDataFrame(pdf)
    p = TrainParams(num_boost_round=2, max_depth=3, base_score=0.0)
    sm = train(p, df, feature_cols=["cat", "num"], label_col="label",
               categorical_features=["cat"])
    lb = LocalBooster(p)
    lb.cat_features = np.array([True, False])
    lb.cuts = sm.cuts
    Xb = lb.bin(X)
    from xgboost_spark.local.booster import _NumpyHistBuilder
    builder = _NumpyHistBuilder(Xb, sm.cuts, max(len(c) for c in sm.cuts))
    margin = np.zeros(len(y))
    rng = np.random.default_rng(p.seed)
    for rnd_trees in sm.trees:
        g, h = lb.obj.grad_hess(y, margin, None)
        builder.set_grad(g, h)
        t_local = core.grow_tree(builder, p, rng, float(g.sum()), float(h.sum()),
                                 cat_features=np.array([True, False]))
        t_spark = rnd_trees[0]
        assert t_local.feature == t_spark.feature
        assert t_local.categories == t_spark.categories
        assert np.allclose(t_local.leaf_value, t_spark.leaf_value, atol=1e-9)
        margin += core.tree_predict(t_spark, Xb, binned=True)


def test_shap_with_categorical(cat_data):
    X, y = cat_data
    p = TrainParams(num_boost_round=1, max_depth=3, base_score=0.0)
    lb = LocalBooster(p).fit(X, y, cat_features=np.array([True, False]))
    t = lb.trees[0][0]
    from xgboost_spark.functions import shap as S
    a = t.finalize_arrays()
    cover = np.asarray(t.sum_hess)
    rows = X[:20]
    phi = S.tree_shap(a, cover, rows)
    pred = core.tree_predict(t, rows, binned=False)
    assert np.abs(phi.sum(1) - pred).max() < 1e-10   # local accuracy holds


def test_partition_sort_key_respects_l1_threshold():
    """The partition-categorical sort key is the per-category LEAF
    WEIGHT (reference CalcWeightCat -> tree::CalcWeight), so reg_alpha's
    L1 threshold groups small-|g| categories at weight 0 — NOT the
    unregularized g/(h+lambda) ratio (round-12 fix).  With alpha large
    enough to zero two categories' weights, their order must follow the
    stable tie rule (bin index), changing the candidate prefixes."""
    import numpy as np

    from xgboost_spark.core import calc_weight

    g = np.array([0.4, -0.3, 4.0, -5.0])
    h = np.array([1.0, 1.0, 1.0, 1.0])
    lam, alpha = 1.0, 1.0
    w = np.array([-calc_weight(float(gi), float(hi), lam, alpha, 0.0)
                  for gi, hi in zip(g, h)])
    # categories 0 and 1 threshold to exactly 0 (|g| <= alpha)
    assert w[0] == 0.0 and w[1] == 0.0
    order = np.argsort(w, kind="stable")
    # weight-ascending: strongest-negative-g category (-5.0 -> w=-2.0)
    # first, the two zeroed categories tied in bin order, then +4.0
    assert order.tolist() == [3, 0, 1, 2]
    # the unregularized ratio would instead order [3, 1, 0, 2]
    r = g / (h + lam)
    assert np.argsort(r, kind="stable").tolist() == [3, 1, 0, 2]


def test_onehot_gate_uses_total_category_count():
    """UseOneHot (categorical.h:84) tests the feature's TOTAL category
    count from the cut pointers (evaluate_splits.h:306), not the
    node-local present count: a 6-category feature stays in the
    PARTITION regime at a node where only 4 categories are present,
    even under max_cat_to_onehot=5 — so 2-element category sets remain
    reachable (one-hot can only emit singletons)."""
    import numpy as np

    from xgboost_spark.core import split_search

    B = 6
    hg = np.zeros((1, 1, B + 1))
    hh = np.zeros((1, 1, B + 1))
    hg[0, 0, :B] = [-3.0, 0.0, -2.9, 5.0, 4.8, 0.0]
    hh[0, 0, :B] = [1.0, 0.0, 1.0, 1.0, 1.0, 0.0]
    kw = dict(cat_features=np.array([True]), max_cat_to_onehot=5,
              reg_lambda=1.0, min_child_weight=0.0)
    res_total = split_search(hg, hh, n_bins_feat=np.array([B]), **kw)[0]
    assert res_total is not None and len(res_total.categories) == 2
    assert res_total.categories == [0, 2]
    # legacy fallback (no per-feature bin metadata): present-count gate
    # flips this node to one-hot — singleton sets only
    res_legacy = split_search(hg, hh, **kw)[0]
    assert res_legacy is not None and len(res_legacy.categories) == 1
