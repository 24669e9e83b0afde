"""One-command scale-regression gate: rerun the 10 bench queries plus
the worst-N operator-sweep entries at sf0.1 AND sf1 (10x data), compute
per-query scale ratios, and diff them against a committed baseline
(default SCALE_r11.json) — so a superlinear regression (a plan that
quietly picked up a global window, an unbroadcast join, a driver
collect) is caught MECHANICALLY instead of by re-reading plans.

What it does:
1. ensures the 10x corpus exists (tools/gen_scale_data.py ->
   /tmp/xgbspark_scale/sf1; generated once, reused);
2. runs bench.py twice (SPARK_GRAFT_SF_DIR=sf0.1, then sf1) and takes
   each query's best-of-N seconds from the JSON line;
3. times the worst-N baseline sweep operators (default 5 — the entries
   MOST LIKELY to regress superlinearly) through the queries() registry
   in one session, best-of-2 after an sf0.001 warm-up (the
   tools/scale_sweep.py protocol);
4. writes ONE JSON with per-query {sf0.1_sec, sf1_sec, ratio,
   baseline_ratio, load} and a `flagged` list; exits 1 if any query's
   ratio exceeds max(1.5 x baseline_ratio + 1.0, abs_threshold) — the
   slack absorbs this box's documented co-tenant steal (load recorded
   per row so an elevated number carries its own evidence).

Queries with no baseline ratio (first run after adding an entry) are
recorded but flagged only past `abs_threshold` (default 15x at 10x
data — superlinear-by-surprise).  Point --baseline at this tool's own
previous output in later rounds; it reads both that layout and the
SCALE_r{N}.json operator-sweep layout.

Usage: python tools/scale_regression.py \
           [--baseline SCALE_r11.json] [--out /tmp/scale_regression.json] \
           [--worst N] [--abs-threshold 15]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LO = "/root/testdata/sf0.1"
HI = "/tmp/xgbspark_scale/sf1"
WARM = "/root/testdata/sf0.001"


def baseline_raw_secs(path: str) -> dict[str, dict]:
    """Extract {query: {sf0.1_sec, sf1_sec}} where the baseline artifact
    carries raw per-SF seconds.  Ratio baselines inherit DENOMINATOR
    noise (the r12 ngram_jaccard forensic: a load-inflated sf0.1 run
    halved the recorded ratio) — raw per-SF seconds are the primary
    cross-round comparison, ratios the derived one."""
    d = json.load(open(path))
    src = (d.get("queries") if d.get("metric") == "scale_regression"
           else d.get("operators", {}))
    if isinstance(src, dict) and isinstance(src.get("operators"), dict):
        src = src["operators"]
    out: dict[str, dict] = {}
    for k, v in (src or {}).items():
        if isinstance(v, dict) and "sf1_sec" in v:
            out[k] = {"sf0.1_sec": v.get("sf0.1_sec"),
                      "sf1_sec": float(v["sf1_sec"])}
    return out


def baseline_ratios(path: str) -> dict[str, float]:
    """Extract {query: sf1/sf0.1 ratio} from either this tool's own
    output or a SCALE_r{N}.json operator-sweep artifact."""
    d = json.load(open(path))
    out: dict[str, float] = {}
    if d.get("metric") == "scale_regression":         # our own layout
        for k, v in d["queries"].items():
            if v.get("ratio") is not None:
                out[k] = float(v["ratio"])
        return out
    ops = d.get("operators", {})
    if isinstance(ops.get("operators"), dict):        # SCALE_r11 layout
        ops = ops["operators"]
    for k, v in ops.items():
        if isinstance(v, dict) and "ratio" in v:
            out[k] = float(v["ratio"])
    return out


def run_bench(sf_dir: str) -> dict[str, float]:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    p = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, env=env, cwd=REPO)
    if p.returncode != 0:
        sys.stderr.write(p.stderr[-4000:])
        raise RuntimeError(f"bench.py failed at {sf_dir}")
    line = [ln for ln in p.stdout.strip().splitlines()
            if ln.startswith("{")][-1]
    return json.loads(line)["queries"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline",
                    default=os.path.join(REPO, "SCALE_r11.json"))
    ap.add_argument("--out", default="/tmp/scale_regression.json")
    ap.add_argument("--worst", type=int, default=5)
    ap.add_argument("--abs-threshold", type=float, default=15.0)
    ap.add_argument("--sf10-fit", action="store_true",
                    help="also run ONE fit100 at sf10 (60M-row lineitem; "
                         "corpus generated once to /tmp/xgbspark_scale/"
                         "sf10) and diff its loop seconds against the "
                         "recorded anchor — every-other-round cadence so "
                         "the decade-scale anchor can't silently rot")
    ap.add_argument("--sf10-anchor", type=float, default=254.6,
                    help="committed sf10 fit100 loop anchor seconds "
                         "(BASELINE.md round-12 measurement)")
    args = ap.parse_args()

    if not os.path.isdir(HI):
        print(f"generating 10x corpus at {HI} (one-time) ...", flush=True)
        subprocess.run([sys.executable,
                        os.path.join(REPO, "tools", "gen_scale_data.py")],
                       check=True, cwd=REPO)

    base = baseline_ratios(args.baseline)
    res: dict[str, dict] = {}

    # 1) the 10 bench queries, straight from bench.py at both SFs
    print("bench @ sf0.1 ...", flush=True)
    lo_b = run_bench(LO)
    print("bench @ sf1 ...", flush=True)
    hi_b = run_bench(HI)
    for k in lo_b:
        if k in hi_b and lo_b[k] > 0:
            res[k] = {"sf0.1_sec": lo_b[k], "sf1_sec": hi_b[k],
                      "ratio": round(hi_b[k] / lo_b[k], 2),
                      "baseline_ratio": base.get(k),
                      "load": round(os.getloadavg()[0], 2)}

    # 2) the worst-N baseline sweep operators through the registry
    import __spark_entry__ as E
    from xgboost_spark.session import get_session
    q = E.queries()
    worst = [k for k, _ in sorted(base.items(), key=lambda kv: -kv[1])
             if k in q and k not in res][:args.worst]
    print(f"worst-{args.worst} sweep operators: {worst}", flush=True)
    spark = get_session("scale_regression", cpus=32)
    try:
        for name in worst:                       # warm: plans + pools
            q[name](spark, WARM).collect()

        def timed(name, sf_dir, n=2):
            best = float("inf")
            for _ in range(n):
                t0 = time.time()
                q[name](spark, sf_dir).collect()
                best = min(best, time.time() - t0)
            return round(best, 3)

        for name in worst:
            lo = timed(name, LO)
            hi = timed(name, HI)
            res[name] = {"sf0.1_sec": lo, "sf1_sec": hi,
                         "ratio": round(hi / lo, 2),
                         "baseline_ratio": base.get(name),
                         "load": round(os.getloadavg()[0], 2)}
            print(name, res[name], flush=True)

        # 3) engine-free HOST CALIBRATION rows (r14: the dedup_components
        # flag turned out to be host-level IO drift, diagnosed only by
        # fingerprint — CPU-bound fits faster, shuffle-bound ops slower.
        # These two fixed probes make that drift directly observable:
        # shuffle_probe = pure repartition+groupBy over sf1 events (the
        # box's shuffle/IO throughput, no engine code), cpu_probe =
        # driver-side NumPy matmul (the box's CPU).  Neither feeds the
        # flag rule; they decompose any future drift at a glance.
        import numpy as _np
        ev = spark.read.parquet(os.path.join(HI, "events.parquet"))
        for _ in range(2):                                   # warm once
            t0 = time.time()
            ev.repartition(64, "user_id").groupBy("user_id").count() \
              .groupBy().count().collect()
            sh = round(time.time() - t0, 3)
        rng = _np.random.default_rng(0)
        a = rng.normal(size=(2048, 2048))
        for _ in range(2):
            t0 = time.time()
            for _i in range(8):
                a = a @ a * 1e-3
            cpu = round(time.time() - t0, 3)
        res["_calibration"] = {"shuffle_probe_sec": sh,
                               "cpu_probe_sec": cpu,
                               "load": round(os.getloadavg()[0], 2)}
        print("calibration", res["_calibration"], flush=True)
    finally:
        spark.stop()

    raw_base = baseline_raw_secs(args.baseline)
    flagged = []
    for k, v in res.items():
        if k.startswith("_"):          # calibration rows never flag
            continue
        b = v["baseline_ratio"]
        limit = (max(1.5 * b + 1.0, args.abs_threshold)
                 if b is not None else args.abs_threshold)
        v["limit"] = round(limit, 2)
        if v["ratio"] > limit:
            flagged.append(k)
        # raw per-SF seconds diff (r13 verdict + the ngram_jaccard
        # forensic: ratios inherit denominator noise — diff RAW seconds
        # too).  Flag only on a QUIET box (load < 5): an elevated load
        # sample is its own steal evidence, not a regression signal.
        rb = raw_base.get(k)
        if rb and rb.get("sf1_sec"):
            v["baseline_sf1_sec"] = rb["sf1_sec"]
            v["raw_drift"] = round(v["sf1_sec"] / rb["sf1_sec"], 2)
            if v["raw_drift"] > 2.0 and v["load"] < 5.0:
                flagged.append(f"{k}:raw")

    sf10 = None
    if args.sf10_fit:
        SF10 = "/tmp/xgbspark_scale/sf10"
        if not os.path.isdir(SF10):
            print(f"generating 100x corpus at {SF10} (one-time) ...",
                  flush=True)
            subprocess.run([sys.executable,
                            os.path.join(REPO, "tools", "gen_scale_data.py"),
                            "100", LO, SF10], check=True, cwd=REPO)
        from xgboost_spark.config import TrainParams
        from xgboost_spark.plans import booster as _B
        from xgboost_spark.plans.booster import SparkBooster
        from xgboost_spark.session import get_session
        from xgboost_spark.sources.tables import load_table
        print("sf10 fit100 (single attempt; decade anchor) ...", flush=True)
        spark = get_session("sf10_fit", cpus=32)
        try:
            li = load_table(spark, SF10, "lineitem")
            li.count()
            fc = ["l_quantity", "l_discount", "l_tax", "l_partkey",
                  "l_suppkey", "l_linenumber", "l_orderkey"]
            # short warm fit compiles the barrier plan at real partition
            # sizes so the anchor measures steady-state loop throughput
            SparkBooster(TrainParams(num_boost_round=2, max_depth=6,
                                     max_bin=256, eta=0.3)).fit(
                li, feature_cols=fc, label_col="l_extendedprice")
            SparkBooster(TrainParams(num_boost_round=100, max_depth=6,
                                     max_bin=256, eta=0.3)).fit(
                li, feature_cols=fc, label_col="l_extendedprice")
            loop = round(float(_B.FIT_STAGE_TIMES.get("loop", 0.0)), 1)
        finally:
            spark.stop()
        sf10 = {"fit100_loop_sec": loop, "anchor_sec": args.sf10_anchor,
                "ratio_vs_anchor": round(loop / args.sf10_anchor, 2),
                "load": round(os.getloadavg()[0], 2)}
        # same slack rule as the 10x ratios: 1.5x + additive headroom
        # absorbs this box's documented co-tenant steal
        if loop > 1.5 * args.sf10_anchor + 30.0:
            flagged.append("sf10_fit100_loop")
        print("sf10:", sf10, flush=True)

    out = {"metric": "scale_regression", "data_factor": 10.0,
           "baseline": os.path.basename(args.baseline),
           "queries": res, "flagged": flagged,
           **({"sf10_fit": sf10} if sf10 else {})}
    json.dump(out, open(args.out, "w"), indent=1)
    print(json.dumps({"flagged": flagged, "out": args.out}))
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
