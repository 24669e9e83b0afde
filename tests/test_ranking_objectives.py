"""Reference-parity tests for the LambdaRank family (round-11 rewrite
against a line-read of src/objective/lambdarank_obj.{h,cc} +
src/common/ranking_utils.h): top-k deterministic pairing, the
(sig-1)*delta / 2*sig*(1-sig)*delta gradient pair, score normalization,
the log2(1+sum_lambda)/sum_lambda group normalization, truncated IDCG,
and the cumulative position-bias update."""

import numpy as np
import pytest

from xgboost_spark.config import TrainParams
from xgboost_spark.functions.objectives import (LambdaRankMAP,
                                                LambdaRankNDCG,
                                                LambdaRankPairwise,
                                                get_objective)


def test_defaults_match_reference():
    o = get_objective("rank:ndcg", TrainParams(objective="rank:ndcg"))
    assert o.pair_method == "topk"          # ranking_utils.h default
    assert o.num_pairs() == 32              # DefaultK()
    assert o.normalization and o.score_normalization
    assert o.bias_norm == 1.0
    m = get_objective("rank:ndcg", TrainParams(
        objective="rank:ndcg", lambdarank_pair_method="mean"))
    assert m.num_pairs() == 1               # DefaultSamplePairs()


def test_topk_pairs_are_deterministic():
    o = LambdaRankNDCG(pair_method="topk")
    rng = np.random.default_rng(0)
    y = rng.integers(0, 4, 40).astype(float)
    m = rng.normal(size=40)
    g1, h1 = o.grad_hess_group(y, m, None, seed=1)
    g2, h2 = o.grad_hess_group(y, m, None, seed=999)   # seed is unused
    assert np.array_equal(g1, g2) and np.array_equal(h1, h2)


def test_pairwise_round1_closed_form():
    """At equal margins: sig = 0.5, delta = 1 (score normalization
    skips the all-equal group), lambda = -0.5 into the higher doc,
    hessian = 0.25 * 1 * 2 = 0.5; with normalization off the all-pairs
    sums collapse to rank counts — the q_train_ranker closed form."""
    y = np.array([2.0, 1.0, 1.0, 0.0])
    m = np.zeros(4)
    o = LambdaRankPairwise(num_pair=100, pair_method="topk",
                           normalization=False)
    g, h = o.grad_hess_group(y, m, None)
    n_more = np.array([0, 1, 1, 3])
    n_less = np.array([3, 1, 1, 0])
    assert np.allclose(g, 0.5 * (n_more - n_less))
    assert np.allclose(h, 0.5 * (n_more + n_less))
    # normalization on (the default): top-k scales by log2(1+S)/S with
    # S = sum of -2*lambda = number of discordant pairs (5 here)
    o2 = LambdaRankPairwise(num_pair=100, pair_method="topk")
    g2, h2 = o2.grad_hess_group(y, m, None)
    S = 5.0
    assert np.allclose(g2, g * np.log2(1.0 + S) / S)
    assert np.allclose(h2, h * np.log2(1.0 + S) / S)


def test_score_normalization_divides_delta():
    """lambdarank_score_normalization (default true): delta is divided
    by (|s_high - s_low| + 0.01) when the group's scores are not all
    equal (lambdarank_obj.h:124-126)."""
    y = np.array([1.0, 0.0])
    m = np.array([1.0, 0.0])
    on = LambdaRankPairwise(num_pair=10, normalization=False)
    off = LambdaRankPairwise(num_pair=10, normalization=False,
                             score_normalization=False)
    g_on, _ = on.grad_hess_group(y, m, None)
    g_off, _ = off.grad_hess_group(y, m, None)
    assert np.allclose(g_on, g_off / (1.0 + 0.01))


def test_ndcg_delta_and_truncated_idcg():
    """DeltaNDCG uses MODEL-rank discounts and the inverse IDCG
    truncated at the top-k level (ranking_utils.cc:88-109)."""
    y = np.array([3.0, 0.0])
    m = np.array([0.0, 1.0])          # model ranks the irrelevant doc first
    o = LambdaRankNDCG(num_pair=2, pair_method="topk",
                       normalization=False, score_normalization=False)
    g, h = o.grad_hess_group(y, m, None)
    # one pair: rank0 = doc1 (y=0), rank1 = doc0 (y=3) -> swap: high=doc0
    gain_h, gain_l = 2.0 ** 3 - 1, 0.0
    d0, d1 = 1.0 / np.log2(2.0), 1.0 / np.log2(3.0)
    idcg = gain_h * d0                # top-2 ideal: relevant first
    delta = abs(((gain_l * d0 + gain_h * d1)
                 - (gain_h * d0 + gain_l * d1)) / idcg)
    sig = 1.0 / (1.0 + np.exp(-(m[0] - m[1])))
    lam = (sig - 1.0) * delta
    assert g[0] == pytest.approx(lam)
    assert g[1] == pytest.approx(-lam)
    assert h[0] == pytest.approx(sig * (1 - sig) * delta * 2.0)
    # truncation: with num_pair=1 (topk), IDCG truncates at 1 -> same
    # IDCG here (single relevant doc), but a 2-relevant group truncates
    y2 = np.array([3.0, 3.0, 0.0])
    m2 = np.array([0.0, -1.0, 1.0])
    o_k1 = LambdaRankNDCG(num_pair=1, pair_method="topk",
                          normalization=False, score_normalization=False)
    d_full = o_k1._make_delta(y2, np.argsort(-m2, kind="stable"), 3)
    o_k3 = LambdaRankNDCG(num_pair=3, pair_method="topk",
                          normalization=False, score_normalization=False)
    d_k3 = o_k3._make_delta(y2, np.argsort(-m2, kind="stable"), 3)
    assert abs(d_full(0, 1)) > abs(d_k3(0, 1))   # smaller IDCG => larger delta


def test_mean_sampling_sums_to_zero_and_respects_num_pair():
    rng = np.random.default_rng(5)
    y = rng.integers(0, 3, 60).astype(float)
    m = rng.normal(size=60)
    o = LambdaRankNDCG(num_pair=3, pair_method="mean")
    g, h = o.grad_hess_group(y, m, None, seed=11)
    assert abs(g.sum()) < 1e-10       # every pair is antisymmetric
    assert (h >= 0).all()
    # mean normalization = 1/num_pair: doubling pairs roughly doubles
    # raw magnitude but the normalized gradients stay the same scale
    o1 = LambdaRankNDCG(num_pair=1, pair_method="mean")
    g1, _ = o1.grad_hess_group(y, m, None, seed=11)
    assert np.abs(g).sum() == pytest.approx(np.abs(g1).sum(), rel=1.0)


def test_map_delta_matches_brute_force_ap_swap():
    rng = np.random.default_rng(7)
    n = 12
    y = (rng.random(n) > 0.5).astype(float)
    if y.sum() in (0, n):
        y[0] = 1.0 - y[0]
    m = rng.normal(size=n)
    o = LambdaRankMAP(num_pair=n, pair_method="topk",
                      normalization=False, score_normalization=False)
    order = np.argsort(-m, kind="stable")
    delta = o._make_delta(y, order, n)

    def ap(rel_ranked):
        rel_ranked = np.asarray(rel_ranked, dtype=float)
        cum = np.cumsum(rel_ranked)
        prec = cum / np.arange(1, len(rel_ranked) + 1)
        return float((prec * rel_ranked).sum() / max(rel_ranked.sum(), 1))

    rel_ranked = y[order]
    base = ap(rel_ranked)
    for ri in range(n):
        for rj in range(ri + 1, n):
            if rel_ranked[ri] == rel_ranked[rj]:
                continue
            sw = rel_ranked.copy()
            sw[ri], sw[rj] = sw[rj], sw[ri]
            # delta(rank_high, rank_low): high = higher LABEL
            rh, rl = (ri, rj) if rel_ranked[ri] > rel_ranked[rj] else (rj, ri)
            assert abs(delta(rh, rl)) == pytest.approx(
                abs(ap(sw) - base), abs=1e-12), (ri, rj)


def test_position_bias_update_is_cumulative_power_law():
    o = LambdaRankNDCG(unbiased=True, bias_norm=1.0, pair_method="mean")
    T = o.bias_table_size()
    c1 = np.zeros(2 * T)
    c1[:T] = np.linspace(4.0, 0.5, T)      # li
    c1[T:] = np.linspace(2.0, 0.25, T)     # lj
    o.apply_position_bias(c1)
    reg = 1.0 / (1.0 + 1.0)
    assert np.allclose(o.t_plus, (c1[:T] / c1[0]) ** reg)
    # SECOND round accumulates (lambdarank_obj.cc:65-68 li(i) += g_li)
    o.apply_position_bias(c1)
    assert np.allclose(o.t_plus, (2 * c1[:T] / (2 * c1[0])) ** reg)


def test_group_weight_norm_closed_form():
    """The reference multiplies each group's gradients by
    w_group * (n_groups / sum w_group) (lambdarank_obj.cc:376-387
    ``w = h_weight[g]`` applied at :245-249 as ``gpair * w * w_norm``;
    ranking_utils.cc:37-44 ``weight_norm_ = n_groups / sum_weights``).
    Engine twin: grad_hess_group with per-row weights + the trainer's
    weight_norm must equal the unweighted output scaled by exactly
    w_g * n_groups / sum(w)."""
    y = np.array([2.0, 1.0, 0.0, 1.0])
    m = np.array([0.3, -0.2, 0.1, 0.0])
    o0 = LambdaRankNDCG(num_pair=10)
    g0, h0 = o0.grad_hess_group(y, m, None)
    # two groups with weights 3 and 1: w_norm = 2 / 4 = 0.5
    w_g, n_groups, sum_w = 3.0, 2, 4.0
    ow = LambdaRankNDCG(num_pair=10)
    ow.weight_norm = n_groups / sum_w
    gw, hw = ow.grad_hess_group(y, m, np.full(4, w_g))
    f = w_g * n_groups / sum_w
    assert np.allclose(gw, g0 * f)
    # hessian scales too, up to the post-scale floor
    assert np.allclose(hw, np.maximum(h0 * f, 1e-16))


def test_group_weight_norm_unit_weights_noop():
    """Unit weights: sum w_group == n_groups so w * w_norm == 1 — the
    weighted path must be bit-identical to the unweighted one."""
    rng = np.random.default_rng(3)
    y = rng.integers(0, 3, 12).astype(float)
    m = rng.normal(size=12)
    o0 = LambdaRankPairwise(num_pair=50)
    ow = LambdaRankPairwise(num_pair=50)
    ow.weight_norm = 1.0     # n_groups / n_groups
    g0, h0 = o0.grad_hess_group(y, m, None)
    gw, hw = ow.grad_hess_group(y, m, np.ones(12))
    assert np.array_equal(g0, gw) and np.array_equal(h0, hw)


def test_local_booster_sets_weight_norm_from_qid_weights():
    """LocalBooster.fit computes weight_norm = n_groups / sum of one
    representative weight per group (ranking_utils.cc:37-44)."""
    from xgboost_spark.local.booster import LocalBooster

    rng = np.random.default_rng(7)
    X = rng.normal(size=(30, 3))
    y = rng.integers(0, 3, 30).astype(float)
    qid = np.repeat(np.arange(3), 10)
    w = np.repeat([2.0, 1.0, 5.0], 10)     # constant within group
    b = LocalBooster(TrainParams(objective="rank:ndcg",
                                 num_boost_round=1, max_depth=2))
    b.fit(X, y, sample_weight=w, qid=qid)
    assert b.obj.weight_norm == pytest.approx(3.0 / 8.0)
    # unweighted fit leaves the factor at exactly 1.0
    b2 = LocalBooster(TrainParams(objective="rank:ndcg",
                                  num_boost_round=1, max_depth=2))
    b2.fit(X, y, qid=qid)
    assert b2.obj.weight_norm == 1.0


def test_spark_train_applies_group_weight_norm(spark):
    """Distributed parity: uniform group weight 2.0 means
    w * (n_groups / sum w) == 1 exactly, so the weighted fit must equal
    the unweighted fit leaf-for-leaf (without the w_norm factor the
    doubled gradients shift every leaf through lambda=1 shrinkage)."""
    import pandas as pd

    from xgboost_spark.plans.booster import train

    rng = np.random.default_rng(11)
    n = 80
    pdf = pd.DataFrame({
        "f0": rng.normal(size=n), "f1": rng.normal(size=n),
        "label": rng.integers(0, 3, n).astype(float),
        "q": np.repeat(np.arange(8), 10),
        "w": np.full(n, 2.0),
    })
    df = spark.createDataFrame(pdf)
    common = {"objective": "rank:ndcg", "num_boost_round": 3,
              "max_depth": 3, "base_score": 0.0, "seed": 5}
    m0 = train(dict(common), df, feature_cols=["f0", "f1"], qid_col="q")
    mw = train(dict(common), df, feature_cols=["f0", "f1"], qid_col="q",
               weight_col="w")
    assert m0.to_json() == mw.to_json()


def test_spark_train_rejects_within_group_weight_variation(spark):
    """Ranking weights are per-GROUP in the reference (info.weights_
    sized n_groups, rank_metric.cc:295 CHECK_EQ); a weight column that
    varies inside a qid group must fail fast, not silently train with
    an ill-defined group weight."""
    import pandas as pd

    from xgboost_spark.plans.booster import train

    rng = np.random.default_rng(2)
    n = 40
    pdf = pd.DataFrame({
        "f0": rng.normal(size=n),
        "label": rng.integers(0, 3, n).astype(float),
        "q": np.repeat(np.arange(4), 10),
        "w": rng.uniform(0.5, 2.0, n),     # varies within groups
    })
    df = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="per-GROUP"):
        train({"objective": "rank:ndcg", "num_boost_round": 1,
               "base_score": 0.0}, df, feature_cols=["f0"],
              qid_col="q", weight_col="w")
