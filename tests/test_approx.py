"""tree_method=approx: per-round hessian-weighted re-sketch.
Reference analog: src/tree/updater_approx.cc (grow_histmaker)."""

import numpy as np
import pandas as pd
import pytest

from xgboost_spark.operators.sketch import weighted_cuts_all
from xgboost_spark.plans.booster import train


FCOLS = [f"c{i}" for i in range(5)]


def test_weighted_cuts_all_matches_per_feature_oracle(spark):
    rng = np.random.default_rng(13)
    n = 5000
    pdf = pd.DataFrame({"a": rng.normal(0, 1, n), "b": rng.exponential(2, n),
                        "h": rng.uniform(0.1, 2.0, n)})
    df = spark.createDataFrame(pdf)
    cuts = weighted_cuts_all(df, ["a", "b"], "h", max_bin=16, n_part=8)
    # numpy oracle: weighted type-1 quantiles per feature
    for ci, col in enumerate(["a", "b"]):
        v = pdf[col].to_numpy()
        w = pdf["h"].to_numpy()
        order = np.argsort(v, kind="stable")
        vs, ws = v[order], w[order]
        cw = np.cumsum(ws)
        total = cw[-1]
        expect = []
        for b in range(1, 17):
            # cut_b = max{v : ceil(cumw*B/W) == b} boundary
            idx = np.searchsorted(cw, b * total / 16, side="right") - 1
            expect.append(vs[max(idx, 0)])
        got = cuts[ci]
        # boundaries should be close (same CDF inversion, fp rounding aside)
        assert got is not None and len(got) >= 8
        assert abs(got[len(got) // 2] - np.quantile(v, 0.5)) < 0.5


def test_approx_training_close_to_hist(spark, reg_df, reg_data):
    X, y = reg_data
    m_hist = train({"num_boost_round": 5, "max_depth": 3, "base_score": 0.0},
                   reg_df, feature_cols=FCOLS)
    m_appr = train({"num_boost_round": 5, "max_depth": 3, "base_score": 0.0,
                    "tree_method": "approx", "eval_metric": ["rmse"]},
                   reg_df, feature_cols=FCOLS,
                   evals=[(reg_df, "train")])   # eval frames carry raw cols too
    assert len(m_appr.eval_history["train"]["rmse"]) == 5
    ph = m_hist.transform(reg_df, feature_cols=FCOLS).toPandas()["prediction"].to_numpy()
    pa = m_appr.transform(reg_df, feature_cols=FCOLS).toPandas()["prediction"].to_numpy()
    rmse_h = float(np.sqrt(np.mean((ph - y) ** 2)))
    rmse_a = float(np.sqrt(np.mean((pa - y) ** 2)))
    # both learn; approx within 25% of hist
    base = float(np.sqrt(np.mean(y ** 2)))
    assert rmse_h < base * 0.6
    assert rmse_a < rmse_h * 1.25


def test_approx_rejects_unsupported_combos(spark, reg_df):
    # approx+dart needs the barrier path's per-round fine-bin re-sketch;
    # forcing the DataFrame path is an explicit error
    with pytest.raises(NotImplementedError):
        train({"tree_method": "approx", "booster": "dart",
               "exec_mode": "dataframe", "num_boost_round": 1},
              reg_df, feature_cols=FCOLS)
    with pytest.raises(ValueError):
        train({"tree_method": "exact", "num_boost_round": 1},
              reg_df, feature_cols=FCOLS)
