"""Barrier-mode trainer: the whole boosting loop in ONE Spark job.

This is the fast path, mirroring the architecture of the reference's own
PySpark integration (`python-package/xgboost/spark/core.py:1128`
``dataset.mapInPandas(_train_booster, barrier=True)`` with per-worker
ring-allreduce sync): each barrier task materializes its partition once,
quantizes it against the broadcast global cuts, and runs the identical
deterministic tree-growth loop; per-level gradient histograms are summed
across tasks with a ring allreduce (`xgboost_spark/collective.py`,
reference `src/collective/allreduce.cc:21-129`).  Because the reduced
histograms are bit-identical on every rank and all random draws come
from the same seeded generator, every task grows the same trees; task 0
returns the model.

Why it exists alongside the per-level DataFrame path
(`plans/booster.py`): a depth-6, 100-round training is ~700 level
aggregations.  As DataFrame jobs those cost a scheduler round-trip each
(~0.3-1 s fixed, regardless of data size); inside one barrier job the
same sync is a millisecond-scale allreduce.  The DataFrame path remains
the declarative, oracle-checkable form and the fallback for operators
that need global relational context (Cox partial likelihood, adaptive
leaves, per-round re-sketch, eval-set metrics).

Scale: per-task memory = its partition's quantized matrix (int16) —
size partitions so each fits (same contract as the reference Spark
wrapper's per-worker DMatrix).  Allreduce payloads are nodes x features
x (bins+1) x 2 float64, independent of row count.
"""

from __future__ import annotations

import pickle
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from xgboost_spark import core
from xgboost_spark.collective import RingComm
from xgboost_spark.config import TrainParams
from xgboost_spark.local.booster import (_NumpyHistBuilder,
                                          _NumpyMultiHistBuilder)


class _AllreduceHistBuilder(_NumpyHistBuilder):
    """Local partial histogram + ring allreduce = global histogram
    (reference `SyncHistogram`, `src/tree/hist/histogram.h:177-188`)."""

    def __init__(self, Xb, cuts, n_bins, comm):
        super().__init__(Xb, cuts, n_bins)
        self.comm = comm

    def build(self, tree: core.Tree, nids: list[int]):
        hg, hh = super().build(tree, nids)
        red = self.comm.allreduce_sum(np.stack([hg, hh]))
        return red[0], red[1]


class _AllreduceMultiHistBuilder(_NumpyMultiHistBuilder):
    """K-target stacked histograms + one allreduce (multi_output_tree)."""

    def __init__(self, Xb, cuts, n_bins, K, comm):
        super().__init__(Xb, cuts, n_bins, K)
        self.comm = comm

    def build(self, tree: core.Tree, nids: list[int]):
        hg, hh = super().build(tree, nids)
        red = self.comm.allreduce_sum(np.stack([hg, hh]))
        return red[0], red[1]


def supports_barrier(p: TrainParams, obj, evals, callbacks, xgb_model) -> tuple[bool, str]:
    if p.tree_method != "hist":
        return False, "tree_method=approx re-sketches per round (DataFrame path)"
    if p.booster != "gbtree":
        return False, f"booster={p.booster} uses the DataFrame path"
    if obj.needs_global_sort:
        return False, "survival:cox needs a global sort (DataFrame path)"
    if obj.adaptive_alpha is not None:
        return False, "adaptive-leaf objectives need global quantiles (DataFrame path)"
    if evals or callbacks or p.early_stopping_rounds:
        return False, "eval sets / callbacks run on the DataFrame path"
    if xgb_model is not None:
        return False, "training continuation runs on the DataFrame path"
    return True, ""


def fit_barrier(params: TrainParams, obj, raw: DataFrame, fnames: list[str],
                cuts: list[np.ndarray], cat_mask, base_score: float,
                mono, isets, n_part: int) -> list[list[core.Tree]]:
    """Run the boosting loop in one barrier job; returns trees per round."""
    p = params
    K = p.n_groups
    spark = raw.sparkSession
    sc = spark.sparkContext
    n_part = max(1, min(n_part, sc.defaultParallelism))  # barrier needs a slot per task
    has_w = "weight" in raw.columns
    has_bm = "base_margin" in raw.columns
    has_q = "qid" in raw.columns
    has_b = obj.needs_bounds
    has_y = "label" in raw.columns

    need = list(fnames)
    for c, flag in (("label", has_y), ("weight", has_w), ("base_margin", has_bm),
                    ("qid", has_q), ("label_lower", has_b), ("label_upper", has_b)):
        if flag:
            need.append(c)
    sel = raw.select(*need)
    sel = sel.repartition(n_part, "qid") if has_q else sel.repartition(n_part)

    bc_cuts = sc.broadcast([np.asarray(c, dtype=np.float64) for c in cuts])
    bc_cat = sc.broadcast(cat_mask)
    seed = p.seed

    from xgboost_spark.plans.booster import _compute_grads

    def train_fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import BarrierTaskContext
        ctx = BarrierTaskContext.get()
        comm = RingComm.create(ctx)
        try:
            cuts_l = bc_cuts.value
            cm = bc_cat.value
            parts = [pdf for pdf in it if len(pdf)]
            if parts:
                pdf = pd.concat(parts, ignore_index=True)
            else:
                pdf = pd.DataFrame({c: pd.Series([], dtype="float64") for c in need})
            n = len(pdf)
            Fn = len(fnames)
            Xb = np.empty((n, Fn), dtype=np.int16)
            for i, c in enumerate(fnames):
                x = pdf[c].to_numpy(dtype=np.float64, na_value=np.nan)
                Xb[:, i] = (core.bin_categorical(x, len(cuts_l[i]))
                            if cm is not None and cm[i]
                            else core.bin_values(x, cuts_l[i]))
            bounds = None
            if has_b:
                yl = pdf["label_lower"].to_numpy(dtype=np.float64)
                yu = pdf["label_upper"].to_numpy(dtype=np.float64, na_value=np.inf)
                bounds = (yl, yu)
                y = (pdf["label"].to_numpy(dtype=np.float64) if has_y else yl)
            else:
                y = pdf["label"].to_numpy(dtype=np.float64)
            w = pdf["weight"].to_numpy(dtype=np.float64) if has_w else None
            q = pdf["qid"].to_numpy(dtype=np.int64) if has_q else None
            margin = np.full((n, K), base_score, dtype=np.float64)
            if has_bm:
                margin += pdf["base_margin"].to_numpy(dtype=np.float64)[:, None]

            n_bins = max(len(c) for c in cuts_l)
            is_multi = K > 1 and p.multi_strategy == "multi_output_tree"
            builder = (_AllreduceMultiHistBuilder(Xb, cuts_l, n_bins, K, comm)
                       if is_multi
                       else _AllreduceHistBuilder(Xb, cuts_l, n_bins, comm))
            rng = np.random.default_rng(p.seed)
            n_forest = max(p.num_parallel_tree, 1)
            trees: list[list[core.Tree]] = []
            for it_round in range(p.num_boost_round):
                g, h = _compute_grads(obj, y, margin, w, q, seed + it_round,
                                      p.subsample, K, bounds=bounds)
                fmask = None
                if p.colsample_bytree < 1.0:
                    fmask = core._rng_mask(rng, Fn, p.colsample_bytree)
                if is_multi:
                    builder.set_grad(g, h)
                    tree = core.grow_tree_multi(builder, p, rng,
                                                feature_mask_tree=fmask)
                    margin += core.tree_predict(tree, Xb, binned=True)
                    trees.append([tree])
                    continue
                round_trees: list[core.Tree] = []
                for k in range(K):
                    builder.set_grad(g[:, k], h[:, k])
                    forest = []
                    for _ in range(n_forest):
                        # root stats derive from the allreduced root histogram,
                        # matching the DataFrame path bit-for-bit
                        tree = core.grow_tree(
                            builder, p, rng,
                            feature_mask_tree=fmask, monotone=mono,
                            interaction_sets=isets, cat_features=cm)
                        forest.append(tree)
                    if n_forest > 1:
                        for t in forest:
                            t.leaf_value = [v / n_forest for v in t.leaf_value]
                    for t in forest:
                        margin[:, k] += core.tree_predict(t, Xb, binned=True)
                    round_trees.extend(forest)
                trees.append(round_trees)
            if comm.rank == 0:
                yield pd.DataFrame({"model": [pickle.dumps(trees)]})
        finally:
            comm.close()

    rows = sel.mapInPandas(train_fn, schema="model binary", barrier=True).collect()
    if not rows:
        raise RuntimeError("barrier training returned no model")
    return pickle.loads(bytes(rows[0]["model"]))
