"""Distributed-trainer correctness: structural parity with the local
NumPy booster (same cuts => identical trees), model round-trip, serving.
Reference analog: tests/test_distributed/test_with_spark/test_spark.py
(fit-predict equivalence vs single-node)."""

import numpy as np
import pandas as pd
import pytest

from xgboost_spark import core
from xgboost_spark.config import TrainParams
from xgboost_spark.local.booster import LocalBooster, _NumpyHistBuilder
from xgboost_spark.plans.booster import SparkBooster
from xgboost_spark.plans.model import GBDTModel


def fit_local_with_cuts(params, X, y, cuts, w=None):
    lb = LocalBooster(params)
    lb.cuts = cuts
    Xb = lb.bin(X)
    n = len(y)
    K = params.n_groups
    builder = _NumpyHistBuilder(Xb, cuts, max(len(c) for c in cuts))
    lb.base_score = params.base_score
    margin = np.full((n, K) if K > 1 else n, lb.base_score, dtype=np.float64)
    rng = np.random.default_rng(params.seed)
    for _ in range(params.num_boost_round):
        g, h = lb.obj.grad_hess(y, margin, w)
        rnd = []
        for k in range(K):
            gk = g[:, k] if K > 1 else g
            hk = h[:, k] if K > 1 else h
            builder.set_grad(gk, hk)
            t = core.grow_tree(builder, params, rng, float(gk.sum()), float(hk.sum()))
            d = core.tree_predict(t, Xb, binned=True)
            if K > 1:
                margin[:, k] += d
            else:
                margin += d
            rnd.append(t)
        lb.trees.append(rnd)
    return lb


def trees_equal(a: core.Tree, b: core.Tree):
    return (a.feature == b.feature and a.split_bin == b.split_bin
            and np.allclose(a.leaf_value, b.leaf_value, rtol=1e-9, atol=1e-12))


@pytest.mark.parametrize("objective,depth", [
    ("reg:squarederror", 3),
    ("binary:logistic", 3),
])
def test_structural_parity(spark, reg_data, reg_df, objective, depth):
    X, y = reg_data
    if objective == "binary:logistic":
        y = (y > np.median(y)).astype(float)
        pdf = pd.DataFrame(X, columns=[f"c{i}" for i in range(X.shape[1])])
        pdf["label"] = y
        df = spark.createDataFrame(pdf)
    else:
        df = reg_df
    p = TrainParams(objective=objective, num_boost_round=3, max_depth=depth,
                    base_score=0.0 if objective == "reg:squarederror" else 0.0)
    model = SparkBooster(p).fit(df, feature_cols=[f"c{i}" for i in range(X.shape[1])])
    lb = fit_local_with_cuts(p, X, y, model.cuts)
    for r in range(p.num_boost_round):
        assert trees_equal(model.trees[r][0], lb.trees[r][0]), f"round {r} differs"


def test_multiclass_parity(spark, reg_data):
    X, y = reg_data
    ym = np.digitize(y, np.quantile(y, [0.4, 0.8])).astype(float)
    pdf = pd.DataFrame(X, columns=[f"c{i}" for i in range(X.shape[1])])
    pdf["label"] = ym
    sdf = spark.createDataFrame(pdf)
    p = TrainParams(objective="multi:softprob", num_class=3, num_boost_round=2,
                    max_depth=3, base_score=0.5)
    model = SparkBooster(p).fit(sdf, feature_cols=[f"c{i}" for i in range(X.shape[1])])
    lb = fit_local_with_cuts(p, X, ym, model.cuts)
    for r in range(2):
        for k in range(3):
            assert trees_equal(model.trees[r][k], lb.trees[r][k])


def test_transform_matches_local_predict(spark, reg_data, reg_df):
    X, y = reg_data
    p = TrainParams(num_boost_round=3, max_depth=3, base_score=0.0)
    fc = [f"c{i}" for i in range(X.shape[1])]
    model = SparkBooster(p).fit(reg_df, feature_cols=fc)
    lb = fit_local_with_cuts(p, X, y, model.cuts)
    lb.params.base_score = 0.0
    out = model.transform(reg_df, feature_cols=fc).toPandas()
    Xout = out[fc].to_numpy()
    expected = lb.predict(Xout)
    assert np.allclose(out["prediction"].to_numpy(), expected, rtol=1e-9)


def test_weights_and_margin(spark, reg_data):
    X, y = reg_data
    rng = np.random.default_rng(0)
    w = rng.uniform(0.5, 2.0, len(y))
    bm = rng.normal(0, 0.3, len(y))
    pdf = pd.DataFrame(X, columns=[f"c{i}" for i in range(X.shape[1])])
    pdf["label"], pdf["wt"], pdf["bm"] = y, w, bm
    df = spark.createDataFrame(pdf)
    p = TrainParams(num_boost_round=2, max_depth=3, base_score=0.0)
    model = SparkBooster(p).fit(df, feature_cols=[f"c{i}" for i in range(X.shape[1])],
                                weight_col="wt", base_margin_col="bm")
    # weighted local run with margin init
    lb = LocalBooster(p)
    lb.cuts = model.cuts
    Xb = lb.bin(X)
    builder = _NumpyHistBuilder(Xb, lb.cuts, max(len(c) for c in lb.cuts))
    margin = bm.copy()
    rng2 = np.random.default_rng(p.seed)
    trees = []
    for _ in range(2):
        g, h = lb.obj.grad_hess(y, margin, w)
        builder.set_grad(g, h)
        t = core.grow_tree(builder, p, rng2, float(g.sum()), float(h.sum()))
        margin += core.tree_predict(t, Xb, binned=True)
        trees.append(t)
    for r in range(2):
        assert trees_equal(model.trees[r][0], trees[r])


def test_model_json_roundtrip(spark, reg_df, reg_data):
    X, y = reg_data
    fc = [f"c{i}" for i in range(X.shape[1])]
    p = TrainParams(num_boost_round=2, max_depth=3)
    model = SparkBooster(p).fit(reg_df, feature_cols=fc)
    m2 = GBDTModel.from_json(model.to_json())
    a = model.transform(reg_df, feature_cols=fc).select("prediction").toPandas()
    b = m2.transform(reg_df, feature_cols=fc).select("prediction").toPandas()
    assert np.allclose(a["prediction"], b["prediction"], rtol=1e-12)


def test_early_stopping_and_history(spark, reg_df):
    p = TrainParams(num_boost_round=10, max_depth=2, early_stopping_rounds=2,
                    eval_metric=["rmse"])
    fc = [c for c in reg_df.columns if c != "label"]
    model = SparkBooster(p).fit(reg_df, feature_cols=fc,
                                evals=[(reg_df, "train")])
    hist = model.eval_history["train"]["rmse"]
    assert len(hist) >= 2
    assert hist[-1] <= hist[0]  # training loss decreases on train set


def test_loss_decreases_sf(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = TrainParams(num_boost_round=3, max_depth=4, eval_metric=["rmse"])
    model = SparkBooster(p).fit(
        li, feature_cols=["l_quantity", "l_discount", "l_tax", "l_partkey"],
        label_col="l_extendedprice", evals=[(li, "train")])
    h = model.eval_history["train"]["rmse"]
    assert h[-1] < h[0]


def test_subsample_colsample_run(spark, reg_df):
    p = TrainParams(num_boost_round=2, max_depth=3, subsample=0.7,
                    colsample_bytree=0.8, colsample_bylevel=0.8)
    fc = [c for c in reg_df.columns if c != "label"]
    model = SparkBooster(p).fit(reg_df, feature_cols=fc)
    assert len(model.trees) == 2


def test_lossguide_spark(spark, reg_df):
    p = TrainParams(num_boost_round=2, max_depth=0, grow_policy="lossguide", max_leaves=8)
    fc = [c for c in reg_df.columns if c != "label"]
    model = SparkBooster(p).fit(reg_df, feature_cols=fc)
    n_leaves = sum(1 for nid in range(model.trees[0][0].n_nodes)
                   if model.trees[0][0].left[nid] == -1)
    assert n_leaves <= 8


def test_vector_udt_ingestion(spark):
    """MLlib sparse/dense vector features (reference CSR ingestion
    surface, `c_api.h:221`) densify JVM-side via vector_to_array."""
    from pyspark.ml.linalg import Vectors

    from xgboost_spark.config import TrainParams
    from xgboost_spark.plans.booster import SparkBooster
    rows = [(Vectors.sparse(4, {0: float(i % 3), 2: float(i % 5)}),
             float(i % 3) * 2 + float(i % 5)) for i in range(500)]
    df = spark.createDataFrame(rows, ["features", "label"])
    m = SparkBooster(TrainParams(num_boost_round=3, max_depth=3, max_bin=16)
                     ).fit(df, array_col="features", label_col="label")
    pred = m.transform(df, array_col="features")
    import pyspark.sql.functions as F
    rmse = pred.agg(
        F.sqrt(F.avg((F.col("prediction") - F.col("label")) ** 2))).first()[0]
    assert rmse < 1.5


@pytest.mark.slow
def test_training_with_empty_partitions(spark):
    # reference test_spark.py:731 trains with empty input partitions; a
    # skewed filter over many partitions must not break either exec mode
    import numpy as np
    import pandas as pd
    rng = np.random.default_rng(0)
    pdf = pd.DataFrame(rng.normal(size=(200, 3)), columns=list("abc"))
    pdf["y"] = pdf.a * 2 + rng.normal(size=200) * 0.1
    df = spark.createDataFrame(pdf).repartition(64).filter("a > 1.0")
    n = df.count()
    assert 0 < n < 64  # more partitions than surviving rows
    preds = {}
    for mode in ("barrier", "dataframe"):
        m = SparkBooster(TrainParams(num_boost_round=3, max_depth=3,
                                     exec_mode=mode, seed=5)).fit(
            df, feature_cols=["a", "b", "c"], label_col="y")
        assert len(m.trees) == 3
        preds[mode] = (m.transform(df, feature_cols=["a", "b", "c"])
                       .toPandas()["prediction"].to_numpy())
    # the two exec modes grow identical trees regardless of partitioning
    assert np.allclose(np.sort(preds["barrier"]), np.sort(preds["dataframe"]))


def test_missing_sentinel_value(spark):
    # reference DMatrix(missing=0.0): sentinel values route down default
    # directions exactly like NaN does
    rng = np.random.default_rng(11)
    X = rng.normal(size=(2000, 3)) + 5.0          # keep natural zeros out
    mask = rng.random((2000, 3)) < 0.25
    y = 2.0 * np.where(mask[:, 0], 1.0, X[:, 0]) + rng.normal(0, 0.1, 2000)
    Xnan = X.copy(); Xnan[mask] = np.nan          # ground truth: NaN-missing
    Xzero = X.copy(); Xzero[mask] = 0.0           # same data, 0-as-missing
    cols = ["a", "b", "c"]
    df_nan = spark.createDataFrame(pd.DataFrame(Xnan, columns=cols).assign(label=y))
    df_zero = spark.createDataFrame(pd.DataFrame(Xzero, columns=cols).assign(label=y))
    p = TrainParams(num_boost_round=4, max_depth=3, seed=3, base_score=0.0)
    m_nan = SparkBooster(p).fit(df_nan, feature_cols=cols, label_col="label")
    m_zero = SparkBooster(p).fit(df_zero, feature_cols=cols, label_col="label",
                                 missing=0.0)
    # identical trees: same splits, same leaf values
    for rn, rz in zip(m_nan.trees, m_zero.trees):
        for tn, tz in zip(rn, rz):
            assert tn.feature == tz.feature
            assert np.allclose(tn.leaf_value, tz.leaf_value)
    # transform reapplies the fit-time sentinel automatically
    a = (m_nan.transform(df_nan, feature_cols=cols)
         .toPandas()["prediction"].to_numpy())
    b = (m_zero.transform(df_zero, feature_cols=cols)
         .toPandas()["prediction"].to_numpy())
    assert np.allclose(np.sort(a), np.sort(b))


def test_degenerate_inputs(spark):
    # single row, constant features, an all-missing column: all train;
    # an empty frame raises a clear error (not an obscure TypeError)
    p = TrainParams(num_boost_round=2, max_depth=2)
    one = spark.createDataFrame([(1.0, 2.0, 3.0)], "a double, b double, y double")
    m = SparkBooster(p).fit(one, feature_cols=["a", "b"], label_col="y")
    assert m.transform(one, feature_cols=["a", "b"]).count() == 1
    const = spark.createDataFrame(
        [(1.0, 2.0, float(i)) for i in range(40)], "a double, b double, y double")
    m2 = SparkBooster(p).fit(const, feature_cols=["a", "b"], label_col="y")
    # nothing to split on -> stump predictions = base score
    pred = m2.transform(const, feature_cols=["a", "b"]).toPandas()["prediction"]
    assert pred.nunique() == 1
    empty = spark.createDataFrame([], "a double, b double, y double")
    with pytest.raises(ValueError, match="empty"):
        SparkBooster(p).fit(empty, feature_cols=["a", "b"], label_col="y")


def test_transform_parallelizes_narrow_scans(spark, sf_dir, tmp_path):
    """A single-row-group parquet scans as ONE unsplittable partition
    (parquet splits only at row-group boundaries); batch predict must
    not serialize its per-row traversal onto one core.  transform()
    round-robins such inputs across the session's slots — a no-op at
    production scale where the scan already yields >= slot-count splits
    — and per-row predictions are unchanged (verified keyed, since
    repartition does not preserve row order)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(5000)
    one = str(tmp_path / "one_rg")
    li.coalesce(1).write.parquet(one)
    src = spark.read.parquet(one)
    assert src.rdd.getNumPartitions() == 1
    fc = ["l_quantity", "l_discount", "l_tax"]
    m = SparkBooster(TrainParams(num_boost_round=2, max_depth=3)).fit(
        src, feature_cols=fc, label_col="l_extendedprice")
    import pyspark.sql.functions as F
    out = m.transform(src, feature_cols=fc)
    n = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() >= max(2, n // 2)
    # keyed equivalence against the same model served without the
    # repartition (array input path on a pre-parallel frame)
    import pandas as pd
    got = (out.groupBy("l_orderkey")
           .agg(F.round(F.sum("prediction"), 6).alias("p"),
                F.count("*").alias("c")).toPandas()
           .sort_values("l_orderkey").reset_index(drop=True))
    ref = (m.transform(src.repartition(8), feature_cols=fc)
           .groupBy("l_orderkey")
           .agg(F.round(F.sum("prediction"), 6).alias("p"),
                F.count("*").alias("c")).toPandas()
           .sort_values("l_orderkey").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, ref)
    # streaming frames must bypass the repartition probe (no .rdd)
    from xgboost_spark.streaming.scoring import score_stream
    sch = src.schema
    stream = (spark.readStream.schema(sch).parquet(one))
    scored = score_stream(m, stream, feature_cols=fc)
    assert scored.isStreaming
