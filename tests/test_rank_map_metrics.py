"""rank:map objective + aucpr / ams metrics.
Reference analogs: lambdarank_obj.cc MAP variant, auc.cc:513 BinaryPRAUC,
rank_metric.cc:200 EvalAMS."""

import numpy as np
import pandas as pd
import pytest

from xgboost_spark.functions import metrics as M
from xgboost_spark.functions.objectives import LambdaRankMAP
from xgboost_spark.plans.booster import train


def _ap(rel_sorted):
    R = rel_sorted.sum()
    if R == 0:
        return 0.0
    cum = np.cumsum(rel_sorted)
    ranks = np.arange(1, len(rel_sorted) + 1)
    return float((rel_sorted * cum / ranks).sum() / R)


def test_delta_ap_matches_brute_swap():
    rng = np.random.default_rng(4)
    n = 25
    y = (rng.random(n) < 0.4).astype(float)
    margin = rng.normal(0, 1, n)
    obj = LambdaRankMAP()
    g, h = obj.grad_hess_group(y, margin, None, seed=1)
    assert np.isfinite(g).all() and (h > 0).all()
    # gradients push relevant docs up: sum of g over relevant is <= 0
    assert g[y > 0].sum() <= 0


def test_rank_map_training_improves_map(spark):
    rng = np.random.default_rng(6)
    n = 2000
    q = rng.integers(0, 50, n)
    f0 = rng.normal(0, 1, n)
    f1 = rng.normal(0, 1, n)
    rel = ((f0 + 0.5 * rng.normal(0, 1, n)) > 0.5).astype(float)
    pdf = pd.DataFrame({"q": q, "f0": f0, "f1": f1, "label": rel})
    df = spark.createDataFrame(pdf)
    model = train({"objective": "rank:map", "num_boost_round": 5, "max_depth": 3,
                   "base_score": 0.0, "eval_metric": ["map"]},
                  df, feature_cols=["f0", "f1"], qid_col="q",
                  evals=[(df, "train")])
    hist = model.eval_history["train"]["map"]
    # untrained (all-tied) ranking gives ~0.45 AP on this data; any round
    # should sit far above it (round-over-round deltas are noisy once
    # saturated, so compare against the baseline, not adjacent rounds)
    assert hist[-1] > 0.75


def test_aucpr_matches_numpy_oracle(spark):
    rng = np.random.default_rng(3)
    n = 3000
    score = rng.normal(0, 1, n)
    y = (rng.random(n) < 1 / (1 + np.exp(-score))).astype(float)
    df = spark.createDataFrame(pd.DataFrame({"y": y, "m0": score}))
    got = M.aucpr_binary(df)
    # numpy oracle: independent row-sequential replica of the C++ sweep
    # (BinaryAUC auc.cc:36-71) with the EXACT interpolated segment area
    # (detail::CalcDeltaPRAUC auc.h:71-95) — round 12 replaced the
    # trapezoid-in-(recall, precision) approximation with this form
    import math

    def delta(fp_prev, fp, tp, tp_prev, P):
        pr, pr_prev = tp / P, tp_prev / P
        if tp == tp_prev:
            return 0.0
        h = (fp - fp_prev) / (tp - tp_prev)
        a, b = h + 1.0, (fp_prev - h * tp_prev) / P
        if b != 0.0:
            return (pr - pr_prev
                    - b / a * (math.log(a * pr + b)
                               - math.log(a * pr_prev + b))) / a
        return (pr - pr_prev) / a

    order = np.argsort(-score, kind="stable")
    ys, ss = y[order], score[order]
    P = float(y.sum())
    fp, tp = 1.0 - ys[0], ys[0]
    fp_prev = tp_prev = 0.0
    area = 0.0
    for i in range(1, n):
        if ss[i] != ss[i - 1]:
            area += delta(fp_prev, fp, tp, tp_prev, P)
            fp_prev, tp_prev = fp, tp
        fp += 1.0 - ys[i]
        tp += ys[i]
    area += delta(fp_prev, fp, tp, tp_prev, P)
    assert got == pytest.approx(area, abs=1e-9)


def test_ams_sane_and_orders_models(spark):
    rng = np.random.default_rng(5)
    n = 4000
    sig = rng.normal(1, 1, n // 4)
    bkg = rng.normal(0, 1, 3 * n // 4)
    score = np.concatenate([sig, bkg])
    y = np.concatenate([np.ones(n // 4), np.zeros(3 * n // 4)])
    df = spark.createDataFrame(pd.DataFrame({"y": y, "m0": score}))
    good = M.ams_at_k(df, 0.15)
    dfr = spark.createDataFrame(pd.DataFrame({"y": y, "m0": rng.normal(0, 1, n)}))
    rand = M.ams_at_k(dfr, 0.15)
    assert good > rand > 0


def test_compute_metric_dispatch(spark):
    pdf = pd.DataFrame({"y": [1.0, 0.0, 1.0, 0.0], "m0": [2.0, -1.0, 1.0, 0.5]})
    df = spark.createDataFrame(pdf)
    assert 0.0 <= M.compute_metric(df, "aucpr") <= 1.0
    assert M.compute_metric(df, "ams@0.5") >= 0.0


def test_rank_metrics_group_weighted_mean(spark):
    """The reference's rank-metric scalars are GROUP-WEIGHT-weighted
    means (rank_metric.cc:395-401 ndcg*w[g]/sum w; :449-454 map;
    :316-330 precision).  Engine twins on both eval paths: the barrier
    partial (metric_partial_np) and the per-query DataFrame kernels
    with weight= must equal a manual weighted mean; uniform weights
    must equal the plain mean exactly."""
    from pyspark.sql import functions as F

    rng = np.random.default_rng(13)
    n_q, per_q = 6, 8
    y = rng.integers(0, 3, n_q * per_q).astype(float)
    s = rng.normal(size=n_q * per_q)
    qid = np.repeat(np.arange(n_q), per_q)
    w_g = np.array([1.0, 3.0, 0.5, 2.0, 1.5, 4.0])
    w = np.repeat(w_g, per_q)

    # manual per-query values via the shared kernel
    vals = {m: [] for m in ("ndcg", "map", "pre")}
    for g in range(n_q):
        rows = qid == g
        for m in vals:
            vals[m].append(M._query_rank_metric(m, 5, y[rows], s[rows],
                                                exp_gain=True))
    for mname, col in (("ndcg@5", None), ("map@5", None), ("pre@5", None)):
        base = mname.partition("@")[0]
        want = float(np.dot(vals[base], w_g) / w_g.sum())
        num, den = M.metric_partial_np(mname, y, s[:, None], w=w, qid=qid)
        got = M.metric_finalize(mname, num, den)
        assert got == pytest.approx(want, abs=1e-12), mname
        # uniform weights == plain mean, bit-for-bit
        nu, du = M.metric_partial_np(mname, y, s[:, None],
                                     w=np.full(len(y), 7.0), qid=qid)
        assert M.metric_finalize(mname, nu, du) == pytest.approx(
            float(np.mean(vals[base])), abs=1e-12), mname

    # DataFrame kernels: weight= emits gw from the SAME aggregation
    pdf = pd.DataFrame({"q": qid, "y": y, "m0": s, "w": w})
    df = spark.createDataFrame(pdf)
    d = M.ndcg_at_k(df, 5, weight="w")
    r = d.agg((F.sum(F.col("ndcg") * F.col("gw"))
               / F.sum("gw")).alias("v")).first()
    assert float(r["v"]) == pytest.approx(
        float(np.dot(vals["ndcg"], w_g) / w_g.sum()), abs=1e-9)
    d2 = M.map_at_k(df, 5, weight="w")
    r2 = d2.agg((F.sum(F.col("ap") * F.col("gw"))
                 / F.sum("gw")).alias("v")).first()
    assert float(r2["v"]) == pytest.approx(
        float(np.dot(vals["map"], w_g) / w_g.sum()), abs=1e-9)
    d3 = M.precision_at_k(df, 5, weight="w")
    r3 = d3.agg((F.sum(F.col("prec") * F.col("gw"))
                 / F.sum("gw")).alias("v")).first()
    assert float(r3["v"]) == pytest.approx(
        float(np.dot(vals["pre"], w_g) / w_g.sum()), abs=1e-9)


def test_ams_exact_reference_semantics(spark):
    """EvalAMS engine twin (rank_metric.cc:48-99): NumPy replica of the
    C++ loop — score-desc sort, EXACTLY int(ratio*n) rows accumulated
    (i < ndata-1 bound), labels > 0.5, weighted s/b — must equal
    ams_at_k on distinct scores; ratio=1.0 exercises the best-prefix
    mode (max AMS at distinct-score boundaries, full prefix excluded)."""
    rng = np.random.default_rng(17)
    n = 500
    s = rng.normal(size=n)                 # distinct w.p. 1
    y = (rng.random(n) < 0.3).astype(float)
    w = rng.uniform(0.5, 2.0, n)
    df = spark.createDataFrame(pd.DataFrame({"y": y, "m0": s, "w": w}))

    def ams(stp, bfp, br=10.0):
        return np.sqrt(max(2 * ((stp + bfp + br) * np.log(1 + stp / (bfp + br)) - stp), 0.0))

    order = np.argsort(-s, kind="stable")
    for ratio in (0.15, 0.5):
        ntop = int(ratio * n)
        sel = min(ntop, n - 1)
        stp = float(w[order[:sel]][y[order[:sel]] > 0.5].sum())
        bfp = float(w[order[:sel]][y[order[:sel]] <= 0.5].sum())
        got = M.ams_at_k(df, ratio, weight="w")
        assert got == pytest.approx(ams(stp, bfp), abs=1e-9), ratio
    # best-prefix mode (ntop == n): replica of the boundary sweep
    stp = bfp = 0.0
    best = 0.0
    for i in range(n - 1):                 # i < ndata-1
        ridx = order[i]
        if y[ridx] > 0.5:
            stp += w[ridx]
        else:
            bfp += w[ridx]
        if s[order[i]] != s[order[i + 1]]:
            best = max(best, ams(stp, bfp))
    assert M.ams_at_k(df, 1.0, weight="w") == pytest.approx(best, abs=1e-9)
