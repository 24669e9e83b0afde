"""Operator-inventory scale sweep: time a representative slice of
`queries()` entries at sf0.1 and sf1 (10x) and record ratios.

Extends SCALE_r10.json's bench-query evidence to the wider operator
inventory — relational kit, dedup family, sketches, text stats,
embedding ops, feature kit, and multi-table TPC-H join shapes — so the
"scale-safe by code audit" claims are backed by measurement across the
surface, not just the 10 bench headliners.

Each entry is timed best-of-2 (.collect()) after a warm-up run of the
whole list at sf0.001 (plan compilation + JIT), one SparkSession per
SF-pair run so both SFs see identical JVM state.

Usage: python tools/scale_sweep.py [out.json]
       (requires /tmp/xgbspark_scale/sf1 from tools/gen_scale_data.py)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ENTRIES = [
    # relational kit
    "sessionize", "asof_join", "topk_orders", "range_join", "prefix_scan",
    # TPC-H multi-table join shapes (join scaling under 10x facts)
    "product_profit", "market_share", "custdist", "retention",
    # dedup family
    "dedup_exact", "dedup_components", "simhash_pairs", "ngram_jaccard",
    "dedup_incremental",
    # sketches
    "hll_distinct", "cms_topk", "bloom_contains",
    # text stats / tokenization
    "tfidf", "token_counts", "text_quality", "gopher_rules", "vocab",
    # embeddings
    "knn_ivf", "semantic_dedup", "embedding_cov",
    # feature kit
    "rolling_window", "target_encode", "salted_join", "zorder",
]

LO = "/root/testdata/sf0.1"
HI = "/tmp/xgbspark_scale/sf1"


def main():
    out_p = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sweep.json"
    import __spark_entry__ as E
    from xgboost_spark.session import get_session
    spark = get_session("scale_sweep", cpus=32)
    q = E.queries()
    for name in ENTRIES:          # warm-up: compile plans, start pools
        q[name](spark, "/root/testdata/sf0.001").collect()

    def timed(name, sf_dir, n=2):
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            q[name](spark, sf_dir).collect()
            best = min(best, time.time() - t0)
        return round(best, 3)

    res = {}
    for name in ENTRIES:
        lo = timed(name, LO)
        hi = timed(name, HI)
        res[name] = {"sf0.1_sec": lo, "sf1_sec": hi,
                     "ratio": round(hi / lo, 2),
                     "load": round(os.getloadavg()[0], 2)}
        print(name, res[name], flush=True)

    # semantic_dedup's gate entry pins n_clusters=8 + exact pairs (the
    # oracle-replayable config) — quadratic by construction at 10x.
    # ALSO measure the scale-aware public usage: n_clusters="auto"
    # (constant ~256-row clusters) + the default bounded pair stage.
    from xgboost_spark.operators.similarity import semantic_dedup
    from xgboost_spark.operators.util import ensure_parallelism
    from xgboost_spark.sources.tables import load_table

    def sd_auto(sf_dir):
        # ensure_parallelism like the gate entry — a single-partition
        # small parquet otherwise serializes the matmul stage and
        # measures partitioning, not the operator
        emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
        return semantic_dedup(emb, n_clusters="auto", threshold=0.5)

    sd_auto("/root/testdata/sf0.001").collect()      # warm
    ts = {}
    for tag, d in (("sf0.1_sec", LO), ("sf1_sec", HI)):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            sd_auto(d).collect()
            best = min(best, time.time() - t0)
        ts[tag] = round(best, 3)
    res["semantic_dedup_auto"] = {**ts,
                                  "ratio": round(ts["sf1_sec"]
                                                 / ts["sf0.1_sec"], 2),
                                  "load": round(os.getloadavg()[0], 2)}
    print("semantic_dedup_auto", res["semantic_dedup_auto"], flush=True)
    json.dump({"metric": "operator_scale_ratio_sf1_over_sf0.1",
               "data_factor": 10.0, "operators": res}, open(out_p, "w"),
              indent=1)
    worst = max(res.items(), key=lambda kv: kv[1]["ratio"])
    print("worst:", worst)
    spark.stop()


if __name__ == "__main__":
    main()
