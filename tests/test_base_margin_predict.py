"""base_margin at predict time: a supplied base_margin REPLACES the
intercept (reference Predictor::InitOutPredictions, predictor.cc:66-72
copies base_margin into the initial predictions and returns WITHOUT
adding base_score), matching the training-side column semantics."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xgboost_spark.config import TrainParams
from xgboost_spark.plans.booster import SparkBooster


@pytest.fixture(scope="module")
def bm_model(reg_df):
    fc = [f"c{i}" for i in range(5)]
    m = SparkBooster(TrainParams(num_boost_round=3, max_depth=3, max_bin=32,
                                 seed=11)).fit(reg_df, feature_cols=fc)
    return m, fc


def test_predict_base_margin_offsets_margin(spark, reg_df, bm_model):
    m, fc = bm_model
    df = reg_df.limit(300).withColumn("bm", F.lit(1.25))
    base = m.transform(df, feature_cols=fc, output_margin=True).toPandas()
    off = m.transform(df, feature_cols=fc, output_margin=True,
                      base_margin_col="bm").toPandas()
    a = np.stack(base["margin"].to_numpy())[:, 0]
    b = np.stack(off["margin"].to_numpy())[:, 0]
    # REPLACE semantics: bm swaps out base_score, so the shift is
    # (bm - base_score), not +bm
    assert np.allclose(b, a + (1.25 - m.base_score), rtol=1e-12)


def test_predict_base_margin_fast_and_expr_paths_agree(spark, reg_df, bm_model):
    m, fc = bm_model
    df = (reg_df.limit(300)
          .withColumn("bm", F.coalesce(F.nanvl(F.col("c0"), F.lit(0.0)),
                                       F.lit(0.0)) * 0.1))
    udf_p = m.transform(df, feature_cols=fc,
                        base_margin_col="bm").toPandas()["prediction"]
    expr_p = m.transform_expr(df, feature_cols=fc,
                              base_margin_col="bm").toPandas()["prediction"]
    assert np.allclose(np.sort(udf_p), np.sort(expr_p), rtol=1e-9)


def test_predict_base_margin_matches_training_continuation(spark, reg_df, bm_model):
    """Predicting with base_margin equals the margin a continued
    training would start from: bm + trees (bm REPLACES bs)."""
    m, fc = bm_model
    df = reg_df.limit(200).withColumn("bm", F.lit(0.5).cast("double"))
    contribs = m.transform(df, feature_cols=fc, output_margin=True,
                           pred_contribs=True, base_margin_col="bm").toPandas()
    phi = np.stack(contribs["contribs"].to_numpy())
    margin = np.stack(contribs["margin"].to_numpy())[:, 0]
    # local accuracy with the offset folded into the bias term
    assert np.abs(phi.sum(1) - margin).max() < 1e-9


def test_predict_base_margin_multiclass_array(spark, reg_df):
    fc = [f"c{i}" for i in range(5)]
    df3 = reg_df.withColumn("label", (F.abs(F.hash("c0")) % 3).cast("double"))
    m = SparkBooster(TrainParams(objective="multi:softprob", num_class=3,
                                 num_boost_round=2, max_depth=3,
                                 max_bin=16, seed=2)).fit(
        df3, feature_cols=fc)
    df = df3.limit(100).withColumn(
        "bm", F.array(F.lit(0.2), F.lit(-0.1), F.lit(0.7)))
    base = m.transform(df, feature_cols=fc, output_margin=True).toPandas()
    off = m.transform(df, feature_cols=fc, output_margin=True,
                      base_margin_col="bm").toPandas()
    a = np.stack(base["margin"].to_numpy())
    b = np.stack(off["margin"].to_numpy())
    bs = np.asarray(m._bs_row(3))
    assert np.allclose(b, a + (np.array([0.2, -0.1, 0.7]) - bs),
                       rtol=1e-12)
