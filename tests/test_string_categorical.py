"""End-to-end string-categorical training (reference
`src/encoder/ordinal.h` ordinal recode + `tests/python/test_with_sklearn.py`
categorical cases: strings in, categorical splits out, dictionary stored
in the model artifact)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from xgboost_spark.config import TrainParams
from xgboost_spark.plans.booster import SparkBooster
from xgboost_spark.plans.model import GBDTModel


@pytest.fixture(scope="module")
def cat_df(spark):
    rng = np.random.default_rng(7)
    n = 2000
    colors = rng.choice(["red", "green", "blue", "teal"], size=n)
    x = rng.normal(size=n)
    shift = {"red": 5.0, "green": -3.0, "blue": 0.5, "teal": 9.0}
    y = np.array([shift[c] for c in colors]) + 0.1 * x
    return spark.createDataFrame(
        pd.DataFrame({"color": colors, "x": x, "y": y}))


def test_fit_on_string_column(spark, cat_df):
    m = SparkBooster(TrainParams(num_boost_round=5, max_depth=4, max_bin=32,
                                 seed=3)).fit(
        cat_df, feature_cols=["color", "x"], label_col="y")
    assert m.category_maps == {"color": ["blue", "green", "red", "teal"]}
    # the color feature must be split categorically somewhere
    assert any(t.categories[nid] is not None
               for rnd in m.trees for t in rnd for nid in range(t.n_nodes))
    out = m.transform(cat_df, feature_cols=["color", "x"]).toPandas()
    resid = out["prediction"] - out["y"]
    assert float(np.abs(resid).mean()) < 1.5   # separates the 4 groups


def test_string_predict_roundtrip_and_unknowns(spark, cat_df, tmp_path):
    m = SparkBooster(TrainParams(num_boost_round=4, max_depth=3, max_bin=32,
                                 seed=3)).fit(
        cat_df, feature_cols=["color", "x"], label_col="y")
    path = str(tmp_path / "model.json")
    m.save(path)
    m2 = GBDTModel.load(path)
    assert m2.category_maps == m.category_maps
    probe = spark.createDataFrame(pd.DataFrame({
        "color": ["red", "teal", "mauve"],   # mauve unseen at fit
        "x": [0.0, 0.0, 0.0]}))
    a = m.transform(probe, feature_cols=["color", "x"]).toPandas()
    b = m2.transform(probe, feature_cols=["color", "x"]).toPandas()
    assert np.allclose(a["prediction"], b["prediction"])
    # unknown category routes down the missing direction, same as a
    # NULL input (reference InvalidCat path)
    null_probe = spark.createDataFrame(
        pd.DataFrame({"color": [None], "x": [0.0]}))
    nv = m.transform(null_probe, feature_cols=["color", "x"]).toPandas()
    mauve = a.loc[a["color"] == "mauve", "prediction"].iloc[0]
    assert mauve == pytest.approx(nv["prediction"].iloc[0])


def test_string_expr_path_matches_udf(spark, cat_df):
    m = SparkBooster(TrainParams(num_boost_round=3, max_depth=3, max_bin=16,
                                 seed=5)).fit(
        cat_df, feature_cols=["color", "x"], label_col="y")
    sample = cat_df.limit(200)
    udf_p = m.transform(sample, feature_cols=["color", "x"]).toPandas()
    expr_p = m.transform_expr(sample, feature_cols=["color", "x"]).toPandas()
    assert np.allclose(np.sort(udf_p["prediction"]),
                       np.sort(expr_p["prediction"]), rtol=1e-9)
