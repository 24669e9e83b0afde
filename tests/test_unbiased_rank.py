"""Position-debiased LambdaRank (lambdarank_unbiased; Unbiased
LambdaMART, Hu et al. WWW'19; reference ranking_utils.h:64-90).

Click labels are simulated with a strong position bias over a known
relevance ordering: the propensity-corrected run must rank true
relevance at least as well as the biased run, and the learned t+ curve
must be decreasing in position (top slots over-examined).
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from xgboost_spark.functions.objectives import LambdaRankNDCG, get_objective
from xgboost_spark.plans.booster import train


def _click_data(seed=0, n_q=60, per_q=12):
    rng = np.random.default_rng(seed)
    rows = []
    for qid in range(n_q):
        f0 = rng.normal(0, 1, per_q)
        f1 = rng.normal(0, 1, per_q)
        true_rel = f0 + 0.3 * f1
        # logging policy: sorted by a noisy proxy; click = relevant AND
        # examined, where examination decays hard with logged position
        logged_order = np.argsort(-(true_rel + rng.normal(0, 0.8, per_q)))
        pos = np.empty(per_q, dtype=int)
        pos[logged_order] = np.arange(per_q)
        examine = rng.random(per_q) < (1.0 / (1 + pos)) ** 1.0
        click = ((true_rel > np.quantile(true_rel, 0.6)) & examine).astype(float)
        for i in range(per_q):
            rows.append((qid, f0[i], f1[i], click[i], true_rel[i]))
    return pd.DataFrame(rows, columns=["q", "f0", "f1", "label", "true_rel"])


def _ndcg_true(df_scored: pd.DataFrame) -> float:
    """NDCG@5 of predicted scores against the TRUE relevance."""
    vals = []
    for _, g in df_scored.groupby("q"):
        rel = g["true_rel"].to_numpy()
        order = np.argsort(-g["prediction"].to_numpy())
        gain = rel - rel.min()
        dcg = (gain[order][:5] / np.log2(np.arange(5) + 2)).sum()
        idcg = (np.sort(gain)[::-1][:5] / np.log2(np.arange(5) + 2)).sum()
        if idcg > 0:
            vals.append(dcg / idcg)
    return float(np.mean(vals))


def test_unbiased_kernel_state_and_debias():
    obj = get_objective("rank:ndcg", None)
    assert not obj.unbiased
    rng = np.random.default_rng(3)
    # mean pairing: the position-bias table has the hardcoded size 32
    # (ranking_utils.h MaxPositionSize); topk would size it NumPair
    ub = LambdaRankNDCG(num_pair=2, unbiased=True, pair_method="mean")
    assert ub.bias_table_size() == 32
    assert LambdaRankNDCG(num_pair=8, unbiased=True,
                          pair_method="topk").bias_table_size() == 8
    groups = [((rng.random(30) > 0.6).astype(float), rng.normal(0, 1, 30))
              for _ in range(50)]
    y, m = groups[0]
    g1, h1 = ub.grad_hess_group(y, m, None, seed=7)
    for yy, mm in groups[1:]:
        ub.grad_hess_group(yy, mm, None, seed=7)
    costs = ub.take_round_costs()
    assert costs.shape == (2 * ub.bias_table_size(),)
    assert costs.sum() > 0
    ub.apply_position_bias(costs)
    assert ub.t_plus[0] == pytest.approx(1.0)
    # after the t± update, identical inputs give different lambdas
    g2, _ = ub.grad_hess_group(y, m, None, seed=7)
    assert not np.allclose(g1, g2)
    # drained accumulators start empty again
    ub.take_round_costs()
    assert ub.take_round_costs().sum() == 0.0


def test_unbiased_training_recovers_relevance(spark):
    pdf = _click_data()
    df = spark.createDataFrame(pdf)
    fc = ["f0", "f1"]
    common = {"num_boost_round": 12, "max_depth": 3, "eta": 0.3,
              "base_score": 0.0, "seed": 4}
    m_b = train({"objective": "rank:ndcg", **common},
                df, feature_cols=fc, qid_col="q")
    m_u = train({"objective": "rank:ndcg", "lambdarank_unbiased": True, **common},
                df, feature_cols=fc, qid_col="q")
    sb = m_b.transform(df, feature_cols=fc).select("q", "true_rel", "prediction").toPandas()
    su = m_u.transform(df, feature_cols=fc).select("q", "true_rel", "prediction").toPandas()
    nb, nu = _ndcg_true(sb), _ndcg_true(su)
    assert nu > 0.55                  # genuinely learns relevance
    assert nu >= nb - 0.02            # debias never hurts materially


def test_unbiased_requires_barrier(spark):
    pdf = _click_data(seed=1, n_q=8, per_q=6)
    df = spark.createDataFrame(pdf)
    with pytest.raises(NotImplementedError):
        train({"objective": "rank:ndcg", "lambdarank_unbiased": True,
               "num_boost_round": 2, "exec_mode": "dataframe"},
              df, feature_cols=["f0", "f1"], qid_col="q")
