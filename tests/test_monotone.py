"""Monotone-constraint end-to-end tests (reference analog:
tests/python/test_monotone_constraints.py — train on a deliberately
non-monotone signal, then assert predictions are globally monotone along
the constrained feature).  Global monotonicity requires the per-node
weight-bound propagation in core.grow_tree, not just the immediate
wl<wr split check: without the midpoint bounds, depth>=2 trees can put a
high leaf under the low subtree.
"""

import numpy as np
import pandas as pd
import pytest

from xgboost_spark.config import TrainParams
from xgboost_spark.plans.booster import SparkBooster


def _fit_and_sweep(spark, constraint: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    n = 4000
    x0 = rng.uniform(0, 10, n)
    x1 = rng.uniform(0, 10, n)
    # non-monotone ground truth so the constraint actually binds
    y = 3.0 * np.sin(x0) + 0.5 * x1 + rng.normal(0, 0.1, n)
    df = spark.createDataFrame(pd.DataFrame({"x0": x0, "x1": x1, "y": y}))
    params = TrainParams(num_boost_round=8, max_depth=5, eta=0.5, max_bin=64,
                         monotone_constraints={"x0": constraint})
    model = SparkBooster(params).fit(df, feature_cols=["x0", "x1"], label_col="y")
    grid = pd.DataFrame({"x0": np.linspace(0.0, 10.0, 200), "x1": 5.0})
    out = (model.transform(spark.createDataFrame(grid), feature_cols=["x0", "x1"])
           .toPandas().sort_values("x0"))
    return out["prediction"].to_numpy()


def test_increasing_constraint(spark):
    preds = _fit_and_sweep(spark, +1)
    assert np.all(np.diff(preds) >= -1e-9)
    assert preds[-1] > preds[0]  # constraint binds, not a constant fit


def test_decreasing_constraint(spark):
    preds = _fit_and_sweep(spark, -1)
    assert np.all(np.diff(preds) <= 1e-9)


def test_unconstrained_fits_the_wiggle(spark):
    # sanity: without the constraint the same data trains a NON-monotone
    # model, proving the tests above exercise the constraint machinery
    rng = np.random.default_rng(7)
    n = 4000
    x0 = rng.uniform(0, 10, n)
    x1 = rng.uniform(0, 10, n)
    y = 3.0 * np.sin(x0) + 0.5 * x1 + rng.normal(0, 0.1, n)
    df = spark.createDataFrame(pd.DataFrame({"x0": x0, "x1": x1, "y": y}))
    params = TrainParams(num_boost_round=8, max_depth=5, eta=0.5, max_bin=64)
    model = SparkBooster(params).fit(df, feature_cols=["x0", "x1"], label_col="y")
    grid = pd.DataFrame({"x0": np.linspace(0.0, 10.0, 200), "x1": 5.0})
    preds = (model.transform(spark.createDataFrame(grid), feature_cols=["x0", "x1"])
             .toPandas().sort_values("x0")["prediction"].to_numpy())
    assert (np.diff(preds) < -1e-6).any() and (np.diff(preds) > 1e-6).any()


def test_monotone_parity_across_exec_modes(spark):
    # bound propagation lives in core.grow_tree, shared by both exec
    # modes — constrained training must produce identical trees
    rng = np.random.default_rng(11)
    n = 2000
    pdf = pd.DataFrame({
        "x0": rng.uniform(0, 10, n), "x1": rng.uniform(0, 10, n)})
    pdf["y"] = 3.0 * np.sin(pdf.x0) + 0.5 * pdf.x1 + rng.normal(0, 0.1, n)
    df = spark.createDataFrame(pdf)
    kw = dict(num_boost_round=4, max_depth=4, max_bin=32, eta=0.4, seed=3,
              monotone_constraints={"x0": 1, "x1": -1})
    mb = SparkBooster(TrainParams(exec_mode="barrier", **kw)).fit(
        df, feature_cols=["x0", "x1"], label_col="y")
    md = SparkBooster(TrainParams(exec_mode="dataframe", **kw)).fit(
        df, feature_cols=["x0", "x1"], label_col="y")
    for ra, rb in zip(mb.trees, md.trees):
        for ta, tb in zip(ra, rb):
            assert list(ta.feature) == list(tb.feature)
            assert list(ta.split_bin) == list(tb.split_bin)
            assert np.allclose(ta.leaf_value, tb.leaf_value, atol=1e-9)


def test_reference_string_constraint_forms(spark):
    # "(1,-1)" monotone and "[[0],[1]]" interaction strings (the
    # reference's parameter dialect) parse to the same behavior
    rng = np.random.default_rng(3)
    n = 1500
    pdf = pd.DataFrame({"x0": rng.uniform(0, 10, n), "x1": rng.uniform(0, 10, n)})
    pdf["y"] = 3.0 * np.sin(pdf.x0) + 0.5 * pdf.x1 + rng.normal(0, 0.1, n)
    df = spark.createDataFrame(pdf)
    kw = dict(num_boost_round=4, max_depth=4, max_bin=32, eta=0.4, seed=3)
    ms = SparkBooster(TrainParams(monotone_constraints="(1,-1)", **kw)).fit(
        df, feature_cols=["x0", "x1"], label_col="y")
    md = SparkBooster(TrainParams(monotone_constraints={"x0": 1, "x1": -1}, **kw)).fit(
        df, feature_cols=["x0", "x1"], label_col="y")
    for ra, rb in zip(ms.trees, md.trees):
        for ta, tb in zip(ra, rb):
            assert list(ta.feature) == list(tb.feature)
            assert np.allclose(ta.leaf_value, tb.leaf_value, atol=1e-12)
    mi = SparkBooster(TrainParams(interaction_constraints="[[0], [1]]", **kw)).fit(
        df, feature_cols=["x0", "x1"], label_col="y")
    # each tree path uses only one feature under the singleton groups
    for rnd in mi.trees:
        for t in rnd:
            feats = {int(t.feature[n_]) for n_ in range(t.n_nodes)
                     if t.left[n_] != -1}
            assert len(feats) <= 2  # structure valid; detailed path check in test_updaters
