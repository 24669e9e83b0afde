"""End-to-end tabular ML pipeline on the synthetic events/customer
tables — the serving-side counterpart of pipeline_demo.py's corpus
curation:

    events -> rolling-window + lag features -> enrich with customer dim
    -> target-encode the market segment -> train a binary GBDT
    -> Platt-calibrate the scores -> PSI drift check between time halves

Run:  python examples/feature_pipeline_demo.py [sf_dir]   (default sf0.01)

Everything is library operators; at 100 TB only the input path changes
(the windows shuffle on user_id; the dims broadcast; the drift check
reduces to bin-sized histograms).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from xgboost_spark.session import get_session  # noqa: E402
from xgboost_spark.config import TrainParams  # noqa: E402
from xgboost_spark.plans.booster import SparkBooster  # noqa: E402
from xgboost_spark.functions.calibration import apply_platt, fit_platt  # noqa: E402
from xgboost_spark.operators.features import (lag_features,  # noqa: E402
                                              population_stability,
                                              profile_columns, rolling_agg,
                                              target_encode)
from xgboost_spark.sources.tables import load_table  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.01"):
    spark = get_session("feature-demo", cpus=8)
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")

    # 1. behavioral features: activity in the trailing hour + last values
    d = rolling_agg(ev, "user_id", "ts", "value", 3600)
    d = lag_features(d, "user_id", "ts", "value", lags=(1, 2),
                     tiebreak_col="event_id")

    # 2. enrich with the customer dim (broadcast) + target-encode segment
    d = d.join(F.broadcast(cust.select(F.col("c_custkey").alias("user_id"),
                                       "c_mktsegment", "c_acctbal")), "user_id")
    label = (F.col("event_type") == "purchase").cast("double")
    d = d.withColumn("y", label).fillna(0.0, ["value_lag_1", "value_lag_2"])
    d = target_encode(d, "c_mktsegment", "y", smoothing=20.0)

    # 3. audit the matrix, then train
    fc = ["value", "value_roll_sum", "value_roll_avg", "value_roll_count",
          "value_lag_1", "value_lag_2", "c_acctbal", "c_mktsegment_te"]
    prof = profile_columns(d, fc)
    n_bad = prof.filter(F.col("null_frac") > 0.5).count()
    model = SparkBooster(TrainParams(objective="binary:logistic",
                                     num_boost_round=20, max_depth=4,
                                     max_bin=64)).fit(d, feature_cols=fc,
                                                      label_col="y")
    scored = model.transform(d, feature_cols=fc, output_margin=True)

    # 4. calibrate the margins on held-out-ish data (demo: same frame)
    cal_in = scored.withColumn("margin0", F.col("margin").getItem(0))
    a, b = fit_platt(cal_in, "margin0", "y")
    cal = apply_platt(cal_in, "margin0", (a, b))
    ll = cal.agg(F.avg(-F.col("y") * F.log(F.col("calibrated") + 1e-12)
                       - (1 - F.col("y")) * F.log(1 - F.col("calibrated") + 1e-12))
                 ).first()[0]

    # 5. drift: first half vs second half of the event stream
    mid = ev.agg(F.percentile_approx("ts", 0.5)).first()[0]
    psi_df = population_stability(ev.filter(F.col("ts") <= mid),
                                  ev.filter(F.col("ts") > mid), "value")
    psi = psi_df.agg(F.sum("psi_term")).first()[0]

    print(f"rows={d.count()} features={len(fc)} degenerate_cols={n_bad} "
          f"platt=({a:.3f},{b:.3f}) cal_logloss={ll:.4f} psi={psi:.4f}")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
