"""plans/cv._fold_column: stratified fold assignment must stay exactly
balanced per label WITHOUT a per-label global sort window — for a
binary label at 100 TB, `row_number() OVER (PARTITION BY label)` puts
half the corpus into one sorting task.  The salted two-level rank has
to reproduce the same round-robin balance from bounded sorts."""

import contextlib
import io
import re

import pytest
from pyspark.sql import functions as F

from xgboost_spark.plans.cv import _fold_column


def plan_of(df, mode="formatted"):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def skewed_labels(spark):
    """Hot binary label: 9,000 rows of label 0.0, 47 of label 1.0."""
    d0 = spark.range(9000).select(
        F.col("id").alias("x"), F.lit(0.0).alias("label"))
    d1 = spark.range(47).select(
        (F.col("id") + 100_000).alias("x"), F.lit(1.0).alias("label"))
    return d0.unionByName(d1).repartition(8)


def test_stratified_folds_exactly_balanced_per_label(spark, skewed_labels):
    nfold = 5
    out = _fold_column(skewed_labels, nfold, seed=3, stratified=True,
                       label_col="label", qid_col=None)
    counts = (out.groupBy("label", "__fold__").count()
              .toPandas().pivot(index="label", columns="__fold__",
                                values="count").fillna(0))
    assert out.count() == 9047  # no rows dropped by the offsets join
    for lbl, row in counts.iterrows():
        # exact round-robin: fold sizes within a label differ by <= 1
        assert row.max() - row.min() <= 1, (lbl, dict(row))
    assert set(counts.columns) == set(range(nfold))


def test_stratified_folds_deterministic(spark, skewed_labels):
    a = _fold_column(skewed_labels, 4, 11, True, "label", None) \
        .orderBy("x").toPandas()
    b = _fold_column(skewed_labels, 4, 11, True, "label", None) \
        .orderBy("x").toPandas()
    assert (a["__fold__"] == b["__fold__"]).all()
    c = _fold_column(skewed_labels, 4, 12, True, "label", None) \
        .orderBy("x").toPandas()
    assert (a["__fold__"] != c["__fold__"]).any()  # seed actually used


def test_stratified_rank_window_is_salted(spark, skewed_labels):
    """The row_number that ranks the CORPUS must be partitioned by
    (label, salt) — S-way parallel, sort bounded by ~1/S of a label —
    never by the label alone.  (The offsets window partitioned by label
    alone is fine: it runs over the (n_labels x S)-row aggregate.)"""
    p = plan_of(_fold_column(skewed_labels, 5, 3, True, "label", None))
    m = re.search(r"row_number\(\) windowspecdefinition\(([^)]*)\)", p)
    assert m, p
    assert "_cv_s" in m.group(1), m.group(1)
    assert "SinglePartition" not in p
    # offsets side joins back as a broadcast of the tiny aggregate
    assert "BroadcastHashJoin" in p


def test_stratified_handles_null_labels(spark):
    rows = [(i, None) for i in range(20)] + [(100 + i, 1.0) for i in range(20)]
    df = spark.createDataFrame(rows, "x long, label double")
    out = _fold_column(df, 4, 0, True, "label", None)
    assert out.count() == 40  # null-label rows survive the offsets join
    pdf = out.toPandas()
    nulls = pdf[pdf["label"].isna()]["__fold__"].value_counts()
    assert nulls.max() - nulls.min() <= 1


def test_unstratified_and_grouped_unchanged(spark, skewed_labels):
    out = _fold_column(skewed_labels.withColumn("qid", F.col("x") % 7),
                       3, 5, False, "label", "qid").toPandas()
    per_qid = out.groupby("qid")["__fold__"].nunique()
    assert (per_qid == 1).all()  # whole query group in one fold
    out2 = _fold_column(skewed_labels, 3, 5, False, "label", None)
    assert out2.select("__fold__").distinct().count() == 3


def test_cv_early_stopping_truncates_to_best(spark, reg_df):
    """cv(early_stopping_rounds=N) watches the AGGREGATED cross-fold
    test mean and truncates the returned history to best_iteration + 1
    (reference training.py cv + EarlyStopping over CVPack aggregates)."""
    from xgboost_spark.plans.cv import cv
    full = cv({"num_boost_round": 20, "max_depth": 2, "eta": 0.9,
               "base_score": 0.0}, reg_df, nfold=3, seed=3,
              label_col="label", feature_cols=[f"c{i}" for i in range(5)],
              as_pandas=False)
    es = cv({"num_boost_round": 20, "max_depth": 2, "eta": 0.9,
             "base_score": 0.0}, reg_df, nfold=3, seed=3,
            label_col="label", feature_cols=[f"c{i}" for i in range(5)], early_stopping_rounds=2,
            as_pandas=False)
    key = [k for k in es if k.startswith("test-") and k.endswith("-mean")][-1]
    n = len(es[key])
    assert n <= len(full[key])
    # the truncation point is the aggregated-series best
    assert es[key][-1] == min(full[key][:n + 2])
    assert all(len(v) == n for v in es.values())


def test_cv_custom_objective(spark, reg_df):
    """cv(obj=...) forwards a custom objective to every fold
    (reference cv obj param)."""
    import numpy as np
    from xgboost_spark.plans.cv import cv

    def sq(y, margin, w):
        d = margin - y
        return d, np.ones_like(d)

    res = cv({"num_boost_round": 3, "max_depth": 2, "base_score": 0.0},
             reg_df, nfold=2, seed=1, label_col="label", feature_cols=[f"c{i}" for i in range(5)], obj=sq, as_pandas=False)
    ref = cv({"num_boost_round": 3, "max_depth": 2, "base_score": 0.0},
             reg_df, nfold=2, seed=1, label_col="label", feature_cols=[f"c{i}" for i in range(5)], as_pandas=False)
    key = [k for k in res if k.endswith("-mean")][-1]
    np.testing.assert_allclose(res[key], ref[key], rtol=0, atol=1e-9)


def test_cv_reference_surface(spark, reg_df):
    """Reference cv() surface (training.py:437-455): as_pandas=True is
    the DEFAULT and returns a pandas DataFrame (one row per round,
    mean/std columns); nfold defaults to 3; fpreproc preprocesses each
    fold; folds= / shuffle=False raise (index-based splitters and
    contiguous-block folds need addressable row order a distributed
    frame doesn't have)."""
    import pandas as pd
    from xgboost_spark.plans.cv import cv
    fc = [f"c{i}" for i in range(5)]
    res = cv({"num_boost_round": 2, "max_depth": 2, "base_score": 0.0},
             reg_df, seed=1, label_col="label", feature_cols=fc)
    assert isinstance(res, pd.DataFrame)
    assert list(res.columns) == ["test-rmse-mean", "test-rmse-std"]
    assert len(res) == 2

    seen = []

    def prep(tr, va, pdict):
        seen.append(pdict["max_depth"])
        pdict = dict(pdict, max_depth=1)
        return tr, va, pdict

    shallow = cv({"num_boost_round": 2, "max_depth": 5, "base_score": 0.0},
                 reg_df, nfold=2, seed=1, label_col="label",
                 feature_cols=fc, fpreproc=prep, as_pandas=False)
    assert seen == [5, 5]            # called once per fold, sees max_depth=5
    deep = cv({"num_boost_round": 2, "max_depth": 5, "base_score": 0.0},
              reg_df, nfold=2, seed=1, label_col="label",
              feature_cols=fc, as_pandas=False)
    # the hook actually changed training (depth-1 stumps fit worse)
    assert shallow["test-rmse-mean"][-1] > deep["test-rmse-mean"][-1]
    with pytest.raises(NotImplementedError, match="row indices"):
        cv({"num_boost_round": 1}, reg_df, folds=object(),
           feature_cols=fc)
    with pytest.raises(NotImplementedError, match="row order"):
        cv({"num_boost_round": 1}, reg_df, shuffle=False,
           feature_cols=fc)
