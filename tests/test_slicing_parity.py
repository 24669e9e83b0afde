"""Serving/slicing-layer parity with the reference (round-13 audit).

Covers the reference semantics the engine's slicing surface must twin:
- ``LayerToTree`` (gbtree.h:129-140): layer end == 0 means "through the
  last boosting round" in every predict path,
- ``GBTree::Slice`` (gbtree.cc:568-625): end==0 normalization, empty
  slice is an error, stride support, out-of-bound -> IndexError
  (core.py:1948), weight_drop sliced with its trees,
- ``LearnerImpl::Slice`` (learner.cc:1054-1090): the sliced learner
  keeps config (objective, missing, categorical dictionaries) and all
  attributes except best_iteration/best_score,
- ``Booster.__getitem__`` (core.py:1910): int/slice/Ellipsis forms,
- pred_leaf / pred_contribs / pred_interactions reject a non-zero layer
  begin (gbtree.h:326,347,357 CHECK_EQ(tree_begin, 0)),
- DART weighted prediction and num_parallel_tree round grouping compose
  with slicing: margins stay additive per boosting round,
- base_margin REPLACES base_score (predictor.cc:66-72) under DART and
  multi-target models alike.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from xgboost_spark.config import TrainParams
from xgboost_spark.plans.booster import SparkBooster

FC = [f"c{i}" for i in range(5)]


@pytest.fixture(scope="module")
def model(spark, reg_df):
    return SparkBooster(TrainParams(num_boost_round=5, max_depth=3,
                                    max_bin=32, seed=3)).fit(
        reg_df, feature_cols=FC, label_col="label")


@pytest.fixture(scope="module")
def dart_model(spark, reg_df):
    return SparkBooster(TrainParams(booster="dart", rate_drop=0.4,
                                    one_drop=True, num_boost_round=5,
                                    max_depth=3, max_bin=32, seed=5)).fit(
        reg_df, feature_cols=FC, label_col="label")


@pytest.fixture(scope="module")
def forest_model(spark, reg_df):
    return SparkBooster(TrainParams(num_parallel_tree=2, num_boost_round=3,
                                    subsample=0.8, colsample_bynode=0.8,
                                    max_depth=3, max_bin=32, seed=9)).fit(
        reg_df, feature_cols=FC, label_col="label")


@pytest.fixture(scope="module")
def scoring_df(spark, reg_df):
    return (reg_df.limit(200)
            .withColumn("rid", F.monotonically_increasing_id()))


def _margins(m, df, **kw):
    """(n,K) margin matrix sorted by row id."""
    pdf = (m.transform(df, feature_cols=FC, output_margin=True, **kw)
           .select("rid", "margin").toPandas().sort_values("rid"))
    return np.array([np.asarray(v, dtype=np.float64)
                     for v in pdf["margin"]])


# ---------------------------------------------------------------- end == 0

def test_iteration_range_end_zero(model, scoring_df):
    """(a, 0) scores rounds [a, n) — LayerToTree's end==0 normalization,
    NOT an empty slice."""
    a = _margins(model, scoring_df, iteration_range=(2, 0))
    b = _margins(model.slice(2, 5), scoring_df)
    np.testing.assert_array_equal(a, b)
    full = _margins(model, scoring_df, iteration_range=(0, 0))
    np.testing.assert_array_equal(full, _margins(model, scoring_df))
    assert not np.array_equal(a, full)


def test_iteration_range_end_zero_expr(model, scoring_df):
    """transform_expr twins the UDF path's end==0 semantics."""
    got = (model.transform_expr(scoring_df, feature_cols=FC,
                                output_margin=True, out_col="m",
                                iteration_range=(2, 0))
           .select("rid", "m").toPandas().sort_values("rid")["m"]
           .to_numpy(np.float64))
    want = _margins(model, scoring_df, iteration_range=(2, 0))[:, 0]
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


# ------------------------------------------------------------ slice errors

def test_slice_end_zero_and_errors(model):
    """The reference's full slice-error matrix
    (tests/python/test_basic_models.py run_slice)."""
    assert len(model.slice(1, 0).trees) == 4
    with pytest.raises(ValueError, match="Empty slice"):
        model.slice(3, 3)
    with pytest.raises(IndexError):
        model.slice(0, 99)          # end past BoostedRounds
    with pytest.raises(IndexError):
        model.slice(0, 2, step=3)   # step > end - begin
    with pytest.raises(ValueError):
        model.slice(4, 2)           # stop < start
    with pytest.raises(ValueError, match=">= 0"):
        model[-1:0]                 # negative begin
    with pytest.raises(ValueError, match="Empty slice"):
        model[1:1]
    with pytest.raises(ValueError, match="Invalid"):
        model[3:0]
    with pytest.raises(ValueError, match="Invalid"):
        model[3:-1]
    with pytest.raises(ValueError, match=">= 1"):
        model[0:2:-1]               # negative step
    with pytest.raises(ValueError, match=">= 1"):
        model[0:2:0]                # zero step
    with pytest.raises(IndexError):
        model[: len(model.trees) + 1]
    # __iter__ yields one single-round model per boosting round
    rounds = list(model)
    assert len(rounds) == 5
    assert all(len(r.trees) == 1 for r in rounds)
    assert rounds[2].trees[0][0] is model.trees[2][0]


def test_strided_merge_identity(model, scoring_df):
    """booster[1:7:2] + booster[2:8:2] - intercept == booster[1:7]
    in margin space (run_slice's strided merge check, adapted to 5
    rounds: [1:5:2]={1,3} + [2:5:2]={2,4} == [1:5])."""
    base = model._bs_row(1)[0]
    a = _margins(model[1:5:2], scoring_df)
    b = _margins(model[2:5:2], scoring_df)
    single = _margins(model[1:5], scoring_df)
    np.testing.assert_allclose(a + b - base, single, rtol=0, atol=1e-9)


def test_slice_step(model, scoring_df):
    """model[::2] keeps rounds 0, 2, 4 with per-round additivity."""
    s = model.slice(0, 5, step=2)
    assert len(s.trees) == 3
    assert s.trees[0][0] is model.trees[0][0]
    assert s.trees[1][0] is model.trees[2][0]
    assert s.trees[2][0] is model.trees[4][0]
    base = model._bs_row(1)[0]
    want = (_margins(model.slice(0, 1), scoring_df)
            + _margins(model.slice(2, 3), scoring_df)
            + _margins(model.slice(4, 5), scoring_df) - 2 * base)
    np.testing.assert_allclose(_margins(s, scoring_df), want,
                               rtol=0, atol=1e-9)


def test_getitem_forms(model, scoring_df):
    np.testing.assert_array_equal(_margins(model[1], scoring_df),
                                  _margins(model.slice(1, 2), scoring_df))
    np.testing.assert_array_equal(_margins(model[1:3], scoring_df),
                                  _margins(model.slice(1, 3), scoring_df))
    np.testing.assert_array_equal(_margins(model[...], scoring_df),
                                  _margins(model, scoring_df))
    assert len(model[::2].trees) == 3
    with pytest.raises(ValueError):
        model[3:1]
    with pytest.raises(ValueError):
        model[(1, 2)]
    with pytest.raises(TypeError):
        model["x"]


# ----------------------------------------------- leaf/contribs begin check

def test_pred_leaf_contribs_require_begin_zero(model, scoring_df):
    for kw in ({"pred_leaf": True}, {"pred_contribs": True},
               {"pred_interactions": True}):
        with pytest.raises(ValueError, match="model slicing"):
            model.transform(scoring_df, feature_cols=FC,
                            iteration_range=(1, 3), **kw)
    # begin == 0 works and equals the sliced model
    a = (model.transform(scoring_df, feature_cols=FC, pred_leaf=True,
                         iteration_range=(0, 2))
         .select("rid", "leaf").toPandas().sort_values("rid"))
    b = (model.slice(0, 2).transform(scoring_df, feature_cols=FC,
                                     pred_leaf=True)
         .select("rid", "leaf").toPandas().sort_values("rid"))
    assert [list(v) for v in a["leaf"]] == [list(v) for v in b["leaf"]]
    assert len(a["leaf"].iloc[0]) == 2


# ------------------------------------------------------------- config copy

def test_slice_preserves_learner_config(model):
    model.missing = -999.0
    model.set_attr(run_id="abc")
    model.best_iteration = 3
    model.attributes_["best_score"] = "0.1"
    try:
        s = model.slice(1, 4)
        assert s.missing == -999.0
        assert s.obj is model.obj
        assert s.attr("run_id") == "abc"
        assert s.best_iteration is None
        assert "best_iteration" not in s.attributes_
        assert "best_score" not in s.attributes_
        assert s.category_maps == model.category_maps
    finally:
        model.missing = None
        model.best_iteration = None
        model.set_attr(run_id=None, best_score=None)


def test_slice_preserves_custom_objective(spark, reg_df):
    """A sliced model keeps the fitted custom objective's pred_transform
    (learner.cc Slice copies the learner config)."""
    def sq(y, margin, w):
        d = margin - y
        return d, np.ones_like(d)

    m = SparkBooster(TrainParams(num_boost_round=3, max_depth=2,
                                 max_bin=16, seed=1), obj=sq).fit(
        reg_df, feature_cols=FC, label_col="label")
    s = m.slice(0, 2)
    assert s.obj is m.obj


# --------------------------------------------------------- DART x slicing

def test_dart_slice_weight_alignment(dart_model, scoring_df):
    """DART weight_drop slices WITH its rounds (gbtree.cc:620-625):
    margins stay additive — full = [0,k) + [k,0) - base."""
    assert dart_model.tree_weights is not None
    assert any(w != 1.0 for w in dart_model.tree_weights)
    base = dart_model._bs_row(1)[0]
    full = _margins(dart_model, scoring_df)
    for k in (1, 3):
        head = _margins(dart_model, scoring_df, iteration_range=(0, k))
        tail = _margins(dart_model, scoring_df, iteration_range=(k, 0))
        np.testing.assert_allclose(head + tail - base, full,
                                   rtol=0, atol=1e-9)
        s = dart_model.slice(k, 0)
        assert s.tree_weights == dart_model.tree_weights[k:]


def test_dart_slice_expr_matches_udf(dart_model, scoring_df):
    got = (dart_model.transform_expr(scoring_df, feature_cols=FC,
                                     output_margin=True, out_col="m",
                                     iteration_range=(1, 0))
           .select("rid", "m").toPandas().sort_values("rid")["m"]
           .to_numpy(np.float64))
    want = _margins(dart_model, scoring_df, iteration_range=(1, 0))[:, 0]
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)


# ----------------------------------------- num_parallel_tree x slicing

def test_forest_round_grouping(forest_model, scoring_df):
    """num_parallel_tree=2: each boosting round holds ONE forest of 2
    trees (iteration_indptr grouping, gbtree_model.cc:118-127); slicing
    moves whole forests and pred_leaf emits one id per TREE."""
    assert len(forest_model.trees) == 3
    assert all(len(rnd) == 2 for rnd in forest_model.trees)
    s = forest_model.slice(1, 3)
    assert len(s.trees) == 2 and all(len(r) == 2 for r in s.trees)
    base = forest_model._bs_row(1)[0]
    full = _margins(forest_model, scoring_df)
    head = _margins(forest_model, scoring_df, iteration_range=(0, 1))
    tail = _margins(forest_model, scoring_df, iteration_range=(1, 0))
    np.testing.assert_allclose(head + tail - base, full, rtol=0, atol=1e-9)
    leaf = (forest_model.transform(scoring_df, feature_cols=FC,
                                   pred_leaf=True)
            .select("leaf").first()["leaf"])
    assert len(leaf) == 6


# -------------------------------------------------- base_margin interplay

def test_base_margin_with_dart(dart_model, scoring_df):
    """base_margin REPLACES base_score (predictor.cc:66-72) and DART
    weights still apply: margin_bm = margin_default - base + bm."""
    df = scoring_df.withColumn("bm", (F.col("rid") % 7).cast("double"))
    bm = (df.select("rid", "bm").toPandas().sort_values("rid")["bm"]
          .to_numpy(np.float64))
    base = dart_model._bs_row(1)[0]
    got = _margins(dart_model, df, base_margin_col="bm")[:, 0]
    want = _margins(dart_model, df)[:, 0] - base + bm
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)


def test_base_margin_with_multi_target(spark):
    """Vector-leaf trees + per-class base_margin array: every class
    margin starts at its supplied entry (InitOutPredictions with a
    (n, K) base_margin, predictor.cc:66-72)."""
    rng = np.random.default_rng(11)
    X = rng.normal(size=(1200, 4))
    y = ((X[:, 0] + X[:, 1] > 0).astype(int)
         + (X[:, 2] > 0.5).astype(int)).astype(float)
    pdf = pd.DataFrame({f"f{i}": X[:, i] for i in range(4)})
    pdf["label"] = y
    df = (spark.createDataFrame(pdf)
          .withColumn("rid", F.monotonically_increasing_id()).cache())
    p = TrainParams(objective="multi:softprob", num_class=3,
                    multi_strategy="multi_output_tree",
                    num_boost_round=4, max_depth=3, max_bin=16, seed=2)
    m = SparkBooster(p).fit(df, feature_cols=[f"f{i}" for i in range(4)],
                            label_col="label")
    fc = [f"f{i}" for i in range(4)]
    dfb = df.withColumn(
        "bm", F.array((F.col("rid") % 3).cast("double"),
                      F.lit(0.25), -(F.col("rid") % 2).cast("double")))
    got = (m.transform(dfb, feature_cols=fc, output_margin=True,
                       base_margin_col="bm")
           .select("rid", "margin", "bm").toPandas().sort_values("rid"))
    dflt = (m.transform(dfb, feature_cols=fc, output_margin=True)
            .select("rid", "margin").toPandas().sort_values("rid"))
    base = m._bs_row(3)
    g = np.array([np.asarray(v, np.float64) for v in got["margin"]])
    d = np.array([np.asarray(v, np.float64) for v in dflt["margin"]])
    b = np.array([np.asarray(v, np.float64) for v in got["bm"]])
    np.testing.assert_allclose(g, d - base[None, :] + b, rtol=0, atol=1e-9)
    # slicing a vector-leaf model keeps additivity too
    bs = m._bs_row(3)
    full = np.array([np.asarray(v, np.float64) for v in
                     (m.transform(dfb, feature_cols=fc, output_margin=True)
                      .select("rid", "margin").toPandas()
                      .sort_values("rid"))["margin"]])
    head = np.array([np.asarray(v, np.float64) for v in
                     (m.transform(dfb, feature_cols=fc, output_margin=True,
                                  iteration_range=(0, 2))
                      .select("rid", "margin").toPandas()
                      .sort_values("rid"))["margin"]])
    tail = np.array([np.asarray(v, np.float64) for v in
                     (m.transform(dfb, feature_cols=fc, output_margin=True,
                                  iteration_range=(2, 0))
                      .select("rid", "margin").toPandas()
                      .sort_values("rid"))["margin"]])
    np.testing.assert_allclose(head + tail - bs[None, :], full,
                               rtol=0, atol=1e-9)


# ------------------------------------------------------------- gblinear

def test_gblinear_layer_checks(spark, reg_df):
    """gblinear has no layers: non-zero iteration_range begin errors
    (gblinear.cc:48-49 LinearCheckLayer), begin==0 is accepted with any
    end (layer_end is ignored), pred_leaf is unsupported
    (gblinear.cc:149-152)."""
    from xgboost_spark.plans.booster import train
    m = train({"booster": "gblinear", "num_boost_round": 3,
               "reg_lambda": 0.1, "seed": 1},
              reg_df.fillna(0.0), feature_cols=FC, label_col="label")
    df = reg_df.fillna(0.0).limit(50)
    with pytest.raises(ValueError, match="prediction range"):
        m.transform(df, feature_cols=FC, iteration_range=(1, 2))
    with pytest.raises(ValueError, match="leaf"):
        m.transform(df, feature_cols=FC, pred_leaf=True)
    a = m.transform(df, feature_cols=FC, iteration_range=(0, 2)).toPandas()
    b = m.transform(df, feature_cols=FC).toPandas()
    assert np.allclose(np.sort(a["prediction"]), np.sort(b["prediction"]))


def test_continuation_from_sliced_model(spark, reg_df, model):
    """Training continuation accepts a sliced model (reference
    xgb.train(xgb_model=booster[a:b]) — Slice returns a full Learner,
    learner.cc:1054): the continued model keeps the slice's rounds and
    appends new ones."""
    s = model.slice(0, 3)
    cont = SparkBooster(TrainParams(num_boost_round=2, max_depth=3,
                                    max_bin=32, seed=4)).fit(
        reg_df, feature_cols=FC, label_col="label", xgb_model=s)
    assert len(cont.trees) == 5
    for i in range(3):
        a, b = s.trees[i][0], cont.trees[i][0]
        assert list(a.feature) == list(b.feature)
        np.testing.assert_allclose(np.asarray(a.leaf_value, float),
                                   np.asarray(b.leaf_value, float))
