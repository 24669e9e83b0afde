"""Model-surface APIs: slicing, pred_leaf, nodes table, split
histograms, importance, libsvm source (SURVEY §2.1/§2.7 rows)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xgboost_spark.config import TrainParams
from xgboost_spark.plans.booster import SparkBooster

FC = [f"c{i}" for i in range(5)]


@pytest.fixture(scope="module")
def model(spark, reg_df):
    return SparkBooster(TrainParams(num_boost_round=5, max_depth=3,
                                    max_bin=32, seed=1)).fit(
        reg_df, feature_cols=FC, label_col="label")


def test_model_slice(spark, reg_df, model):
    """XGBoosterSlice (reference c_api.h:1028): layer slicing [1, 4)."""
    sl = model.slice(1, 4)
    assert len(sl.trees) == 3
    assert sl.trees[0][0] is model.trees[1][0]


def test_pred_leaf(spark, reg_df, model):
    """pred_leaf (reference cpu_predictor.cc:535-558): leaf id per tree."""
    out = model.transform(reg_df, feature_cols=FC, pred_leaf=True)
    row = out.select("leaf").first()
    assert len(row["leaf"]) == 5            # one id per tree
    t0 = model.trees[0][0]
    assert all(t0.left[i] == -1 for i in {row["leaf"][0]})  # ids are leaves


def test_nodes_dataframe_and_split_histogram(spark, model):
    """trees_to_dataframe (reference core.py:3103) + split value
    histogram (core.py:3327) as queries over the nodes table."""
    nd = model.to_nodes_df(spark)
    assert nd.filter(F.col("feature").isNotNull()).count() > 0
    # total_gain importance from the nodes table matches the model API
    api = model.feature_importance("total_gain")
    tbl = {r["feature"]: r["g"] for r in
           nd.filter(F.col("feature").isNotNull())
             .groupBy("feature").agg(F.sum("gain").alias("g")).collect()}
    assert set(tbl) == set(api)
    for f, v in api.items():
        assert abs(tbl[f] - v) < 1e-6 * max(1.0, abs(v))
    h = model.split_value_histogram(list(api.keys())[0], bins=5)
    assert sum(h["counts"]) > 0 and len(h["edges"]) == len(h["counts"]) + 1


def test_feature_importance_types(model):
    for kind in ("weight", "gain", "cover", "total_gain", "total_cover"):
        imp = model.feature_importance(kind)
        assert imp and all(v >= 0 for v in imp.values())


def test_libsvm_roundtrip(spark, tmp_path):
    """libsvm URI source (reference src/data/data.cc:934-952)."""
    p = tmp_path / "data.svm"
    rng = np.random.default_rng(0)
    lines = []
    for i in range(200):
        x0, x2 = rng.normal(), rng.normal()
        y = 1 if x0 + x2 > 0 else 0
        lines.append(f"{y} 1:{x0:.4f} 3:{x2:.4f}")
    p.write_text("\n".join(lines))
    from xgboost_spark.sources.tables import load_libsvm
    df = load_libsvm(spark, str(p), num_features=4)
    assert df.count() == 200
    m = SparkBooster(TrainParams(objective="binary:logistic",
                                 num_boost_round=3, max_depth=3, max_bin=16)
                     ).fit(df, array_col="features", label_col="label")
    pred = m.transform(df, array_col="features")
    acc = pred.withColumn("hit", ((F.col("prediction") > 0.5).cast("int")
                                  == F.col("label")).cast("double")) \
              .agg(F.avg("hit")).first()[0]
    assert acc > 0.9
