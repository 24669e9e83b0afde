"""Training continuation (xgb_model), callbacks, cross-validation.
Reference analogs: training.py:183 (continuation), callback.py, cv
training.py:435."""

import glob
import os

import numpy as np
import pytest

from xgboost_spark.functions.callbacks import (EarlyStopping, EvaluationMonitor,
                                               LearningRateScheduler,
                                               TrainingCheckPoint)
from xgboost_spark.plans.booster import train
from xgboost_spark.plans.cv import cv
from xgboost_spark.plans.model import GBDTModel

FCOLS = [f"c{i}" for i in range(5)]


def test_training_continuation_matches_single_run(spark, reg_df):
    base = {"max_depth": 3, "base_score": 0.0, "seed": 2}
    full = train({**base, "num_boost_round": 6}, reg_df, feature_cols=FCOLS)
    first = train({**base, "num_boost_round": 3}, reg_df, feature_cols=FCOLS)
    cont = train({**base, "num_boost_round": 3}, reg_df, feature_cols=FCOLS,
                 xgb_model=first)
    assert sum(len(r) for r in cont.trees) == 6
    # continuation must reproduce the single 6-round run exactly: same
    # cuts, same margins at handoff => identical trees
    for ra, rb in zip(full.trees, cont.trees):
        for ta, tb in zip(ra, rb):
            assert ta.feature == tb.feature
            assert np.allclose(ta.leaf_value, tb.leaf_value, atol=1e-12)


def test_learning_rate_scheduler(spark, reg_df):
    """Reference ONE-ROUND-LATE semantics (callback.py:305-307 applies
    the rate in after_iteration, before the NEXT boost; pinned by the
    reference's own run_eta_decay: eval_errors_3[0]==eval_errors_2[0]
    holds only if round 0 ignores the scheduler): round 0 trains with
    the configured eta, rates(i) governs round i+1."""
    rates = [0.5, 0.25, 0.1]
    model = train({"num_boost_round": 3, "max_depth": 2, "base_score": 0.0,
                   "eta": 0.9}, reg_df, feature_cols=FCOLS,
                  callbacks=[LearningRateScheduler(rates)])
    fixed = train({"num_boost_round": 1, "max_depth": 2, "base_score": 0.0,
                   "eta": 0.9}, reg_df, feature_cols=FCOLS)
    a = model.trees[0][0]
    b = fixed.trees[0][0]
    assert a.feature == b.feature
    assert np.allclose(a.leaf_value, b.leaf_value, atol=1e-12)
    # rates(0)=0 freezes round 1: its leaves are exactly zero, round 0's
    # are not (leaf values scale with the round's eta)
    frozen = train({"num_boost_round": 2, "max_depth": 2, "base_score": 0.0,
                    "eta": 0.9}, reg_df, feature_cols=FCOLS,
                   callbacks=[LearningRateScheduler([0.0, 0.0])])
    leaves0 = [v for v in frozen.trees[0][0].leaf_value]
    leaves1 = [v for v in frozen.trees[1][0].leaf_value]
    assert any(abs(float(v)) > 0 for v in leaves0)
    assert all(float(v) == 0.0 for v in leaves1)
    with pytest.raises(TypeError, match="callable or sequence"):
        LearningRateScheduler(0.3)


@pytest.mark.slow
def test_early_stopping_callback(spark, reg_df):
    model = train({"num_boost_round": 30, "max_depth": 2, "base_score": 0.0,
                   "eta": 0.8}, reg_df, feature_cols=FCOLS,
                  evals=[(reg_df, "train")],
                  callbacks=[EarlyStopping(rounds=2)])
    n_rounds = len(model.trees)
    assert n_rounds < 30 or len(model.eval_history["train"]["rmse"]) == 30
    # reference Booster.best_score: metric value at best_iteration
    if model.best_iteration is not None:
        assert model.best_score == pytest.approx(
            model.eval_history["train"]["rmse"][model.best_iteration])


def test_checkpoint_callback(spark, reg_df, tmp_path):
    """Reference TrainingCheckPoint semantics (callback.py:586-653):
    the counter reaches `interval` BEFORE the save check, so the first
    snapshot lands `interval` epochs in (epoch index = interval), files
    are `{name}_{epoch+start}.ubj` (2.1.0+ default format), and a
    continued fit offsets the index by the prior model's rounds."""
    import json as _json
    from xgboost_spark.sources import ubjson
    d = str(tmp_path / "ckpt")
    base = train({"num_boost_round": 4, "max_depth": 2, "base_score": 0.0},
                 reg_df, feature_cols=FCOLS,
                 callbacks=[TrainingCheckPoint(d, interval=2)])
    files = sorted(glob.glob(os.path.join(d, "model_*.ubj")))
    assert [os.path.basename(f) for f in files] == ["model_2.ubj"]
    snap = GBDTModel.from_doc(ubjson.loads(open(files[0], "rb").read()))
    assert sum(len(r) for r in snap.trees) == 3      # rounds 0..2 done
    # continuation offsets the filename index by the prior rounds
    d2 = str(tmp_path / "ckpt2")
    train({"num_boost_round": 3, "max_depth": 2, "base_score": 0.0},
          reg_df, feature_cols=FCOLS, xgb_model=base,
          callbacks=[TrainingCheckPoint(d2, interval=2)])
    f2 = sorted(glob.glob(os.path.join(d2, "model_*.ubj")))
    assert [os.path.basename(f) for f in f2] == ["model_6.ubj"]
    # as_pickle saves the model object itself
    import pickle
    d3 = str(tmp_path / "ckpt3")
    train({"num_boost_round": 3, "max_depth": 2, "base_score": 0.0},
          reg_df, feature_cols=FCOLS,
          callbacks=[TrainingCheckPoint(d3, as_pickle=True, interval=2)])
    with open(os.path.join(d3, "model_2.pkl"), "rb") as fd:
        mp = pickle.load(fd)
    assert sum(len(r) for r in mp.trees) == 3


def test_cv_returns_fold_aggregates(spark, reg_df):
    res = cv({"num_boost_round": 3, "max_depth": 2, "base_score": 0.0},
             reg_df, nfold=3, feature_cols=FCOLS, as_pandas=False)
    assert "test-rmse-mean" in res and "test-rmse-std" in res
    assert len(res["test-rmse-mean"]) == 3
    # rmse should improve over rounds on average
    assert res["test-rmse-mean"][-1] < res["test-rmse-mean"][0]


def test_cv_stratified_classification(spark, reg_df):
    from pyspark.sql import functions as F
    df = reg_df.withColumn("label", (F.col("label") > 0).cast("double"))
    res = cv({"objective": "binary:logistic", "num_boost_round": 2,
              "max_depth": 2}, df, nfold=3, stratified=True,
             metrics=["logloss"], feature_cols=FCOLS, as_pandas=False)
    assert len(res["test-logloss-mean"]) == 2


def test_invalid_labels_fail_fast(spark, reg_df):
    # reference MetaInfo::Validate / CheckLabel parity: NaN labels,
    # out-of-range logistic labels, negative weights all raise before
    # any tree is grown (a NaN label would silently poison every leaf)
    from pyspark.sql import functions as F
    fc = [f"c{i}" for i in range(5)]
    kw = dict(num_boost_round=1, max_depth=2, max_bin=8)
    bad = reg_df.withColumn(
        "label", F.when(F.rand(1) < 0.01, float("nan")).otherwise(F.col("label")))
    with pytest.raises(ValueError, match="label contains"):
        train(kw, bad, feature_cols=fc, label_col="label")
    with pytest.raises(ValueError, match="label contains"):
        train({**kw, "objective": "binary:logistic"}, reg_df,
              feature_cols=fc, label_col="label")
    wdf = reg_df.withColumn(
        "w", F.lit(1.0) - F.lit(2.0) * (F.rand(2) < 0.01).cast("double"))
    with pytest.raises(ValueError, match="weights must be"):
        train(kw, wdf, feature_cols=fc, label_col="label", weight_col="w")


def test_reference_params_tolerated():
    # migrating configs carry environment params (nthread, verbosity,
    # device=cpu, ...) — accepted and ignored, but asking for behavior
    # we don't implement (GPU, gradient_based sampling, missing != NaN)
    # still raises
    from xgboost_spark.config import TrainParams
    p = TrainParams.from_dict({"nthread": 8, "verbosity": 2, "device": "cpu",
                               "missing": float("nan"),
                               "learning_rate": 0.2, "max_depth": 3})
    assert p.eta == 0.2 and p.max_depth == 3
    with pytest.raises(ValueError, match="unsupported"):
        TrainParams.from_dict({"device": "cuda"})
    with pytest.raises(ValueError, match="unknown parameter"):
        TrainParams.from_dict({"bogus": 1})


def test_process_type_update(spark, reg_df):
    fc = [f"c{i}" for i in range(5)]
    base = train({"num_boost_round": 3, "max_depth": 3, "max_bin": 16,
                  "gamma": 0.0}, reg_df, feature_cols=fc, label_col="label")
    # refresh on the same data keeps structure; leaves stay finite
    upd = train({"num_boost_round": 3, "max_depth": 3, "max_bin": 16,
                 "process_type": "update", "updater": "refresh"},
                reg_df, feature_cols=fc, label_col="label", xgb_model=base)
    for ra, rb in zip(base.trees, upd.trees):
        for ta, tb in zip(ra, rb):
            assert list(ta.feature) == list(tb.feature)
    # prune with a huge gamma collapses every tree to a stump/leaf
    pruned = train({"process_type": "update", "updater": "prune",
                    "gamma": 1e12}, reg_df,
                   feature_cols=fc, label_col="label", xgb_model=base)
    assert all(t.is_leaf(0) for rnd in pruned.trees for t in rnd)
    # original model untouched
    assert any(not t.is_leaf(0) for rnd in base.trees for t in rnd)
    with pytest.raises(ValueError, match="requires xgb_model"):
        train({"process_type": "update"}, reg_df,
              feature_cols=fc, label_col="label")


@pytest.mark.slow
def test_early_stopping_save_best_and_selection(spark, reg_df):
    """Reference EarlyStopping surface (callback.py): save_best returns
    only the rounds up to the best iteration with best_iteration/
    best_score restored on the slice; metric_name/data_name select the
    watched series; unknown names raise."""
    es = EarlyStopping(rounds=2, save_best=True, metric_name="rmse",
                       data_name="train")
    model = train({"num_boost_round": 30, "max_depth": 2,
                   "base_score": 0.0, "eta": 0.9},
                  reg_df, feature_cols=FCOLS, evals=[(reg_df, "train")],
                  callbacks=[es])
    assert es.best_iteration is not None
    assert len(model.trees) == es.best_iteration + 1
    assert model.best_iteration == es.best_iteration
    assert model.attr("best_score") == str(es.best)
    with pytest.raises(ValueError, match="No dataset named"):
        train({"num_boost_round": 2, "max_depth": 2, "base_score": 0.0},
              reg_df, feature_cols=FCOLS, evals=[(reg_df, "train")],
              callbacks=[EarlyStopping(rounds=1, data_name="nope")])
    with pytest.raises(ValueError, match="No metric named"):
        train({"num_boost_round": 2, "max_depth": 2, "base_score": 0.0},
              reg_df, feature_cols=FCOLS, evals=[(reg_df, "train")],
              callbacks=[EarlyStopping(rounds=1, metric_name="nope")])
    with pytest.raises(ValueError, match="min_delta"):
        EarlyStopping(rounds=1, min_delta=-0.5)


def test_early_stopping_maximize_inference():
    """The reference's auto-maximize list is startswith-based with mape
    excluded (callback.py _update_rounds maximize_metrics)."""
    for metric, want in (("auc", True), ("aucpr@3", True),
                         ("ndcg@5-", True), ("map", True),
                         ("mape", False), ("rmse", False),
                         ("mlogloss", False), ("pre@4", True)):
        es = EarlyStopping(rounds=1)
        log = {"eval": {metric: [0.5]}}
        es.after_iteration(None, 0, log)
        assert es.maximize is want, metric


@pytest.mark.slow
def test_early_stopping_continuation_offset(spark, reg_df):
    """Continuation + early stopping: best_iteration counts from the
    merged model's round 0 (reference epoch += starting_round) — the
    built-in early_stopping_rounds path offsets too."""
    base = train({"num_boost_round": 3, "max_depth": 2,
                  "base_score": 0.0}, reg_df, feature_cols=FCOLS)
    es = EarlyStopping(rounds=2)
    cont = train({"num_boost_round": 20, "max_depth": 2,
                  "base_score": 0.0, "eta": 0.9},
                 reg_df, feature_cols=FCOLS, evals=[(reg_df, "train")],
                 callbacks=[es], xgb_model=base)
    if es.best_iteration is not None:
        assert cont.best_iteration == es.best_iteration + 3
        assert cont.best_iteration >= 3
    cont2 = train({"num_boost_round": 20, "max_depth": 2,
                   "base_score": 0.0, "eta": 0.9,
                   "early_stopping_rounds": 2},
                  reg_df, feature_cols=FCOLS, evals=[(reg_df, "train")],
                  xgb_model=base)
    if cont2.best_iteration is not None:
        assert cont2.best_iteration >= 3
        # used_trees() truncates in the MERGED model's index space
        assert len(cont2.used_trees()) == cont2.best_iteration + 1


def test_eval_one_iter_parity_surface(spark, reg_df, capsys):
    """EvalOneIter parity (learner.cc:1164-1194 + CallbackContainer
    callback.py:263):
    - a '-' in an eval-set name raises (history keys split on '-');
    - disable_default_eval_metric + empty eval_metric = no built-in
      history entries (learner.cc:1173);
    - verbose line is the EvaluationMonitor byte format
      '[epoch]\\tdata-metric:v(.5f)' over history insertion order."""
    with pytest.raises(ValueError, match="should not contain"):
        train({"num_boost_round": 1, "max_depth": 2, "base_score": 0.0},
              reg_df, feature_cols=FCOLS, evals=[(reg_df, "my-set")])
    m = train({"num_boost_round": 2, "max_depth": 2, "base_score": 0.0,
               "disable_default_eval_metric": True},
              reg_df, feature_cols=FCOLS, evals=[(reg_df, "train")])
    assert m.eval_history in ({}, {"train": {}})
    # custom_metric still appends when the default is disabled
    # (reference: the Python feval loop runs regardless of metrics_)
    def cm(ev):
        return "const", 1.0
    m2 = train({"num_boost_round": 2, "max_depth": 2, "base_score": 0.0,
                "disable_default_eval_metric": True},
               reg_df, feature_cols=FCOLS, evals=[(reg_df, "train")],
               custom_metric=cm)
    assert list(m2.eval_history["train"]) == ["const"]
    assert m2.eval_history["train"]["const"] == [1.0, 1.0]
    # verbose byte format (composed path: custom_metric forces it)
    capsys.readouterr()
    m3 = train({"num_boost_round": 1, "max_depth": 2, "base_score": 0.0},
               reg_df, feature_cols=FCOLS, evals=[(reg_df, "train")],
               custom_metric=cm, verbose=True)
    line = [l for l in capsys.readouterr().out.splitlines()
            if l.startswith("[0]")][0]
    rm = m3.eval_history["train"]["rmse"][0]
    assert line == f"[0]\ttrain-rmse:{rm:.5f}\ttrain-const:1.00000"


def test_inline_maximize_is_reference_startswith():
    """_maximize (inline early_stopping_rounds path) twins the reference
    EarlyStopping inference (callback.py:411-426): startswith over the
    maximize list, mape excluded — and like the reference, 'ams@k'
    MINIMIZES (ams is absent from the list)."""
    from xgboost_spark.plans.booster import _maximize
    assert _maximize("auc") and _maximize("aucpr@3") and _maximize("pre@4")
    assert _maximize("ndcg@5-") and _maximize("map-")
    assert _maximize("ndcg-custom")          # startswith, not exact-name
    assert not _maximize("mape")
    assert not _maximize("ams@0.15")         # not in the reference list
    assert not _maximize("rmse") and not _maximize("mlogloss")


def test_evaluation_monitor_latest_replay(spark, reg_df, capsys):
    """period-skipped epochs replay their last message at
    after_training (reference callback.py:542/_latest + 580-583), so
    the final round's result always prints."""
    from xgboost_spark.config import get_config, set_config
    prev = get_config()["verbosity"]
    set_config(verbosity=1)
    try:
        capsys.readouterr()
        train({"num_boost_round": 4, "max_depth": 2, "base_score": 0.0},
              reg_df, feature_cols=FCOLS, evals=[(reg_df, "train")],
              callbacks=[EvaluationMonitor(period=3)])
        out = [l for l in capsys.readouterr().out.splitlines()
               if l.startswith("[")]
        # epochs 0 and 3 print on-period; epoch 3 is final -> no replay
        # left pending; a 4-round run with period 3 prints [0] and [3]
        assert out[0].startswith("[0]\ttrain-rmse:")
        assert out[-1].startswith("[3]\ttrain-rmse:")
    finally:
        set_config(verbosity=prev)


def test_train_verbose_eval_period(spark, reg_df, capsys):
    """train(verbose_eval=N) appends EvaluationMonitor(period=N) like
    the reference (training.py:186-188); verbose_eval=True maps to the
    engine's verbose fast path (same byte format, barrier-eligible)."""
    from xgboost_spark.config import get_config, set_config
    prev = get_config()["verbosity"]
    set_config(verbosity=1)
    try:
        capsys.readouterr()
        train({"num_boost_round": 5, "max_depth": 2, "base_score": 0.0},
              reg_df, feature_cols=FCOLS, evals=[(reg_df, "train")],
              verbose_eval=2)
        out = [l for l in capsys.readouterr().out.splitlines()
               if l.startswith("[")]
        assert [l.split("\t")[0] for l in out] == ["[0]", "[2]", "[4]"]
        assert all("train-rmse:" in l for l in out)
        capsys.readouterr()
        train({"num_boost_round": 2, "max_depth": 2, "base_score": 0.0},
              reg_df, feature_cols=FCOLS, evals=[(reg_df, "train")],
              verbose_eval=True)
        out = [l for l in capsys.readouterr().out.splitlines()
               if l.startswith("[")]
        assert [l.split("\t")[0] for l in out] == ["[0]", "[1]"]
    finally:
        set_config(verbosity=prev)


def test_cv_verbose_eval_stdv_format(spark, reg_df, capsys):
    """cv(verbose_eval=...) prints the reference monitor's cv format
    (training.py:582-584 + callback.py _fmt_metric):
    '[i]\\ttest-rmse:{mean:.5f}+{std:.5f}', std dropped when
    show_stdv=False, period skipping with the final round always
    printed."""
    import re
    capsys.readouterr()
    res = cv({"num_boost_round": 3, "max_depth": 2, "base_score": 0.0},
             reg_df, nfold=2, feature_cols=FCOLS, seed=7,
             verbose_eval=2)
    out = [l for l in capsys.readouterr().out.splitlines()
           if l.startswith("[")]
    assert [l.split("\t")[0] for l in out] == ["[0]", "[2]"]
    m = re.fullmatch(r"\[0\]\ttest-rmse:(\d+\.\d{5})\+(\d+\.\d{5})", out[0])
    assert m, out[0]
    assert float(m.group(1)) == pytest.approx(res["test-rmse-mean"][0],
                                              abs=1e-5)
    assert float(m.group(2)) == pytest.approx(res["test-rmse-std"][0],
                                              abs=1e-5)
    capsys.readouterr()
    cv({"num_boost_round": 2, "max_depth": 2, "base_score": 0.0},
       reg_df, nfold=2, feature_cols=FCOLS, seed=7,
       verbose_eval=True, show_stdv=False)
    out = [l for l in capsys.readouterr().out.splitlines()
           if l.startswith("[")]
    assert len(out) == 2 and "+" not in out[0].split(":", 1)[1]


def test_train_explicit_args_and_evals_result(spark, reg_df):
    """Reference train() signature (training.py:56-66): num_boost_round
    / early_stopping_rounds live OUTSIDE the params dict and win over
    it; evals_result= fills the caller's dict with the watchlist
    history."""
    res = {}
    m = train({"num_boost_round": 99, "max_depth": 2, "base_score": 0.0},
              reg_df, feature_cols=FCOLS, num_boost_round=3,
              evals=[(reg_df, "train")], evals_result=res)
    assert len(m.trees) == 3
    assert list(res) == ["train"]
    assert len(res["train"]["rmse"]) == 3
    assert res["train"]["rmse"] == m.eval_history["train"]["rmse"]
    m2 = train({"num_boost_round": 30, "max_depth": 2, "base_score": 0.0,
                "eta": 0.9}, reg_df, feature_cols=FCOLS,
               evals=[(reg_df, "train")], early_stopping_rounds=2)
    assert m2.best_iteration is not None


def test_booster_update_custom_loop(spark, reg_df):
    """Reference custom training loop (core.py:2195-2290
    Booster.update/boost): N update() calls on a persistent model ==
    one N-round train; fobj forwards to boost with the engine's
    custom-objective signature."""
    base = {"max_depth": 3, "base_score": 0.0, "seed": 2}
    full = train({**base, "num_boost_round": 3}, reg_df, feature_cols=FCOLS)
    m = train({**base, "num_boost_round": 1}, reg_df, feature_cols=FCOLS)
    for i in range(1, 3):
        m.update(reg_df, i)
    assert sum(len(r) for r in m.trees) == 3
    for ra, rb in zip(full.trees, m.trees):
        for ta, tb in zip(ra, rb):
            assert ta.feature == tb.feature
            assert np.allclose(ta.leaf_value, tb.leaf_value, atol=1e-12)
    # fobj: squared-error gradients reproduce the built-in objective
    def sq(y, margin, w):
        return margin - y, np.ones_like(y)
    m2 = train({**base, "num_boost_round": 1}, reg_df, feature_cols=FCOLS)
    m2.update(reg_df, 1, fobj=sq)
    assert sum(len(r) for r in m2.trees) == 2
    assert m2.trees[1][0].feature == m.trees[1][0].feature
    a = (m2.transform(reg_df.limit(100), feature_cols=FCOLS)
         .toPandas()["prediction"])
    b = (train({**base, "num_boost_round": 2}, reg_df, feature_cols=FCOLS)
         .transform(reg_df.limit(100), feature_cols=FCOLS)
         .toPandas()["prediction"])
    np.testing.assert_allclose(np.sort(a), np.sort(b), atol=1e-9)
