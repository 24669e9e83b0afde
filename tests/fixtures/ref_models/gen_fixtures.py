"""Golden reference-dialect model fixtures.

Byte-stable, hand-constructed documents in EXACTLY the shape the
reference's own save path emits — mirroring the model families of
`/root/reference/tests/python/generate_models.py` (kRounds=4, kCols=4,
kForests=2, kMaxDepth<=3, kClasses=3) and the serializers it exercises:

- learner.cc SaveModel: version + learner{learner_model_param(base_score/
  num_feature/num_class/num_target/boost_from_average as STRINGS),
  gradient_booster, objective(SaveConfig name + param block), attributes,
  feature_names, feature_types}
- gbtree_model.cc SaveModel: gbtree_model_param, per-tree docs with "id",
  tree_info, iteration_indptr, weight_drop-in-model when non-empty
- tree_model.cc SaveModel/SaveCategoricalSplit: tree_param{num_nodes/
  num_deleted/num_feature/size_leaf_vector}, float32 split_conditions /
  loss_changes / sum_hessian / base_weights, int32 children/parents/
  split_indices, u8 default_left/split_type, flat categories arrays
  (in-set routes RIGHT)
- gbtree.cc LoadModel dialects: modern DART (name "gbtree", weight_drop
  inside model) AND legacy DART (name "dart", model nested under
  ["gbtree"], booster-level weight_drop)
- gblinear_model.cc: flat (num_feature+1)*num_output_group weights,
  interleaved by group, bias block last

All float payloads are float32-exact (the reference stores F32Array),
so predictions are bit-reproducible.  Run this file to (re)write the
*.json fixtures next to it; tests/test_golden_fixtures.py pins that the
committed bytes equal a fresh generation (dialect drift breaks a test,
not a user).
"""
from __future__ import annotations

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))

K_ROUNDS, K_COLS, K_FORESTS, K_CLASSES = 4, 4, 2, 3
VERSION = [3, 0, 2]


def f32(v: float) -> float:
    import numpy as np
    return float(np.float32(v))


def _stump(fid: int, cond: float, lo: float, hi: float, *, gain=1.5,
           hess=(20.0, 12.0, 8.0), tree_id=0, num_feature=K_COLS):
    """Depth-1 numeric tree in the reference save shape."""
    return {
        "base_weights": [f32((lo + hi) / 2), f32(lo), f32(hi)],
        "categories": [], "categories_nodes": [],
        "categories_segments": [], "categories_sizes": [],
        "default_left": [1, 0, 0],
        "id": tree_id,
        "left_children": [1, -1, -1],
        "loss_changes": [f32(gain), 0.0, 0.0],
        "parents": [2147483647, 0, 0],
        "right_children": [2, -1, -1],
        "split_conditions": [f32(cond), f32(lo), f32(hi)],
        "split_indices": [fid, 0, 0],
        "split_type": [0, 0, 0],
        "sum_hessian": [f32(hess[0]), f32(hess[1]), f32(hess[2])],
        "tree_param": {"num_deleted": "0", "num_feature": str(num_feature),
                       "num_nodes": "3", "size_leaf_vector": "1"},
    }


def _depth2(fid0: int, c0: float, fid1: int, c1: float, leaves, *,
            tree_id=0, num_feature=K_COLS):
    """Depth-2: root splits fid0@c0; left child splits fid1@c1;
    right child is a leaf.  leaves = (ll, lr, r)."""
    ll, lr, r = leaves
    return {
        "base_weights": [0.0, f32((ll + lr) / 2), f32(r),
                         f32(ll), f32(lr)],
        "categories": [], "categories_nodes": [],
        "categories_segments": [], "categories_sizes": [],
        "default_left": [1, 1, 0, 0, 0],
        "id": tree_id,
        "left_children": [1, 3, -1, -1, -1],
        "loss_changes": [f32(2.5), f32(1.25), 0.0, 0.0, 0.0],
        "parents": [2147483647, 0, 0, 1, 1],
        "right_children": [2, 4, -1, -1, -1],
        "split_conditions": [f32(c0), f32(c1), f32(r), f32(ll), f32(lr)],
        "split_indices": [fid0, fid1, 0, 0, 0],
        "split_type": [0, 0, 0, 0, 0],
        "sum_hessian": [f32(40.0), f32(24.0), f32(16.0), f32(14.0),
                        f32(10.0)],
        "tree_param": {"num_deleted": "0", "num_feature": str(num_feature),
                       "num_nodes": "5", "size_leaf_vector": "1"},
    }


def _cat_stump(fid: int, cats: list[int], lo: float, hi: float, *,
               tree_id=0, num_feature=K_COLS):
    """Categorical root: category IN ``cats`` routes RIGHT (reference
    categorical.h:50 Decision), so ``hi`` is the in-set leaf."""
    return {
        "base_weights": [0.0, f32(lo), f32(hi)],
        "categories": list(cats), "categories_nodes": [0],
        "categories_segments": [0], "categories_sizes": [len(cats)],
        "default_left": [0, 0, 0],
        "id": tree_id,
        "left_children": [1, -1, -1],
        "loss_changes": [f32(3.0), 0.0, 0.0],
        "parents": [2147483647, 0, 0],
        "right_children": [2, -1, -1],
        "split_conditions": [0.0, f32(lo), f32(hi)],
        "split_indices": [fid, 0, 0],
        "split_type": [1, 0, 0],
        "sum_hessian": [f32(30.0), f32(18.0), f32(12.0)],
        "tree_param": {"num_deleted": "0", "num_feature": str(num_feature),
                       "num_nodes": "3", "size_leaf_vector": "1"},
    }


def _learner(objective: dict, booster: dict, *, base_score="5E-1",
             num_class=0, feature_names=None, feature_types=None,
             attributes=None):
    return {
        "learner": {
            "attributes": attributes or {},
            "feature_names": feature_names or [],
            "feature_types": feature_types or [],
            "gradient_booster": booster,
            "learner_model_param": {
                "base_score": base_score,
                "boost_from_average": "1",
                "num_class": str(num_class),
                "num_feature": str(K_COLS),
                "num_target": "1",
            },
            "objective": objective,
        },
        "version": VERSION,
    }


def _gbtree(trees: list[dict], groups_per_iter: int, *, name="gbtree",
            npt=K_FORESTS, weight_drop=None, legacy_dart=False):
    for i, t in enumerate(trees):
        t["id"] = i
    # tree_info: class id per tree; for K classes with forests the
    # reference emits blocks of npt trees per class per iteration
    if groups_per_iter > 1:
        ti: list[int] = []
        for _ in range(len(trees) // (groups_per_iter * npt)):
            for k in range(groups_per_iter):
                ti.extend([k] * npt)
    else:
        ti = [0] * len(trees)
    model = {
        "gbtree_model_param": {"num_parallel_tree": str(npt),
                               "num_trees": str(len(trees))},
        "iteration_indptr": list(range(0, len(trees) + 1,
                                       groups_per_iter * npt)),
        "tree_info": ti,
        "trees": trees,
    }
    if weight_drop is not None and not legacy_dart:
        model["weight_drop"] = [f32(w) for w in weight_drop]
    if legacy_dart:
        return {"gbtree": {"model": model}, "name": "dart",
                "weight_drop": [f32(w) for w in weight_drop or []]}
    return {"model": model, "name": name}


def fixtures() -> dict[str, dict]:
    out: dict[str, dict] = {}

    # --- reg: squarederror, 2-tree forest x 4 rounds, one categorical
    # tree per round (generate_models.py uses cat_ratio=0.5)
    reg_trees = []
    for r in range(K_ROUNDS):
        reg_trees.append(_stump(0, 0.625 + r * 0.25, -0.25 - r * 0.0625,
                                0.375 + r * 0.0625))
        reg_trees.append(_cat_stump(2, [1, 3, 5 + r], -0.125, 0.28125))
    out["reg"] = _learner(
        {"name": "reg:squarederror", "reg_loss_param":
            {"scale_pos_weight": "1"}},
        _gbtree(reg_trees, 1),
        feature_names=[f"f{i}" for i in range(K_COLS)],
        feature_types=["float", "float", "c", "float"])

    # --- logit / logitraw: binary objectives, numeric depth-2 trees
    for name, obj in (("logit", "binary:logistic"),
                      ("logitraw", "binary:logitraw")):
        trees = []
        for r in range(K_ROUNDS):
            trees.append(_depth2(1, 0.5 + 0.125 * r, 3, -0.75,
                                 (-0.1875, 0.3125, -0.0625 - 0.03125 * r)))
            trees.append(_stump(0, 1.5, -0.125, 0.25))
        out[name] = _learner(
            {"name": obj, "reg_loss_param": {"scale_pos_weight": "1"}},
            _gbtree(trees, 1))

    # --- cls: 3 classes x 2-forest x 4 rounds = 24 trees,
    # iteration_indptr stride 6
    cls_trees = []
    for r in range(K_ROUNDS):
        for k in range(K_CLASSES):
            for p in range(K_FORESTS):
                cls_trees.append(_stump(
                    (k + p) % K_COLS, 0.25 * (k + 1) + 0.0625 * r,
                    -0.125 * (k + 1), 0.0625 * (p + 1)))
    out["cls"] = _learner(
        {"name": "multi:softprob",
         "softmax_multiclass_param": {"num_class": str(K_CLASSES)}},
        _gbtree(cls_trees, K_CLASSES), num_class=K_CLASSES,
        base_score="5E-1")

    # --- ltr: rank:ndcg
    ltr_trees = []
    for r in range(K_ROUNDS):
        ltr_trees.append(_stump(r % K_COLS, 0.5, -0.25, 0.25))
        ltr_trees.append(_stump((r + 1) % K_COLS, 1.25, -0.0625, 0.125))
    out["ltr"] = _learner(
        {"name": "rank:ndcg",
         "lambdarank_param": {
             "lambdarank_bias_norm": "2", "lambdarank_normalization": "1",
             "lambdarank_num_pair_per_sample": "1",
             "lambdarank_pair_method": "topk",
             "lambdarank_unbiased": "0", "ndcg_exp_gain": "1"}},
        _gbtree(ltr_trees, 1))

    # --- aft: survival:aft, normal dist
    aft_trees = [_stump(i % K_COLS, 2.0 + 0.5 * i, 0.125, 0.375,
                        tree_id=i) for i in range(K_ROUNDS * K_FORESTS)]
    out["aft"] = _learner(
        {"name": "survival:aft",
         "aft_loss_param": {"aft_loss_distribution": "normal",
                            "aft_loss_distribution_scale": "1"}},
        _gbtree(aft_trees, 1), base_score="5E-1")

    # --- dart, both dialects (same trees/weights)
    dart_trees = lambda: [_stump(i % K_COLS, 0.75 + 0.25 * i,
                                 -0.1875, 0.3125, tree_id=i)
                          for i in range(K_ROUNDS)]
    wd = [1.0, 0.5, 0.25, 0.75]
    out["dart_modern"] = _learner(
        {"name": "reg:squarederror", "reg_loss_param":
            {"scale_pos_weight": "1"}},
        _gbtree(dart_trees(), 1, npt=1, weight_drop=wd))
    out["dart_legacy"] = _learner(
        {"name": "reg:squarederror", "reg_loss_param":
            {"scale_pos_weight": "1"}},
        _gbtree(dart_trees(), 1, npt=1, weight_drop=wd, legacy_dart=True))

    # --- cat: categorical-split family — depth-2 trees with TWO
    # categorical nodes each (root + left child), exercising the flat
    # categories/segments/sizes offsets (SaveCategoricalSplit,
    # tree_model.cc) beyond the single-node case the reg family covers
    def _cat_depth2(fid0, cats0, fid1, cats1, leaves, *, tree_id=0):
        ll, lr, r = leaves
        return {
            "base_weights": [0.0, f32((ll + lr) / 2), f32(r),
                             f32(ll), f32(lr)],
            "categories": list(cats0) + list(cats1),
            "categories_nodes": [0, 1],
            "categories_segments": [0, len(cats0)],
            "categories_sizes": [len(cats0), len(cats1)],
            "default_left": [0, 1, 0, 0, 0],
            "id": tree_id,
            "left_children": [1, 3, -1, -1, -1],
            "loss_changes": [f32(2.0), f32(1.0), 0.0, 0.0, 0.0],
            "parents": [2147483647, 0, 0, 1, 1],
            "right_children": [2, 4, -1, -1, -1],
            "split_conditions": [0.0, 0.0, f32(r), f32(ll), f32(lr)],
            "split_indices": [fid0, fid1, 0, 0, 0],
            "split_type": [1, 1, 0, 0, 0],
            "sum_hessian": [f32(36.0), f32(20.0), f32(16.0), f32(12.0),
                            f32(8.0)],
            "tree_param": {"num_deleted": "0",
                           "num_feature": str(K_COLS),
                           "num_nodes": "5", "size_leaf_vector": "1"},
        }
    cat_trees = [
        _cat_depth2(2, [0, 2, 5], 3, [1, 4], (-0.1875, 0.3125, 0.0625)),
        _cat_depth2(3, [1, 3], 2, [0, 6, 7], (0.25, -0.125, -0.03125)),
        _cat_stump(2, [2, 4, 6], -0.25, 0.5),
        _cat_depth2(2, [1, 5], 3, [2], (-0.0625, 0.125, 0.375)),
    ]
    out["cat"] = _learner(
        {"name": "reg:squarederror", "reg_loss_param":
            {"scale_pos_weight": "1"}},
        _gbtree(cat_trees, 1, npt=1),
        feature_names=[f"f{i}" for i in range(K_COLS)],
        feature_types=["float", "float", "c", "c"])

    # --- multi_target: multi_strategy=multi_output_tree — ONE tree per
    # round with vector leaves in the MultiTargetTree save shape
    # (multi_target_tree_model.cc SaveModel: scalar split_conditions,
    # per-node weight vectors flattened into base_weights, leaf_weights
    # = n_leaves x n_targets in ascending leaf-node-id order)
    def _mt_stump(fid, cond, lo_vec, hi_vec, *, tree_id=0):
        assert len(lo_vec) == len(hi_vec) == K_CLASSES
        return {
            "base_weights": [0.0] * K_CLASSES
                            + [f32(v) for v in lo_vec]
                            + [f32(v) for v in hi_vec],
            "categories": [], "categories_nodes": [],
            "categories_segments": [], "categories_sizes": [],
            "default_left": [1, 0, 0],
            "id": tree_id,
            "leaf_weights": [f32(v) for v in lo_vec]
                            + [f32(v) for v in hi_vec],
            "left_children": [1, -1, -1],
            "loss_changes": [f32(1.75), 0.0, 0.0],
            "parents": [2147483647, 0, 0],
            "right_children": [2, -1, -1],
            "split_conditions": [f32(cond), 0.0, 0.0],
            "split_indices": [fid, 0, 0],
            "split_type": [0, 0, 0],
            "sum_hessian": [f32(24.0), f32(15.0), f32(9.0)],
            "tree_param": {"num_deleted": "0",
                           "num_feature": str(K_COLS),
                           "num_nodes": "3",
                           "size_leaf_vector": str(K_CLASSES)},
        }
    mt_trees = [
        _mt_stump(0, 0.75, (-0.25, 0.125, 0.0625), (0.375, -0.125, -0.25)),
        _mt_stump(1, 1.25, (0.0625, -0.1875, 0.125), (-0.3125, 0.25, 0.0625)),
        _mt_stump(2, 0.5, (0.125, 0.0625, -0.1875), (-0.0625, -0.125, 0.1875)),
    ]
    out["multi_target"] = _learner(
        {"name": "multi:softprob",
         "softmax_multiclass_param": {"num_class": str(K_CLASSES)}},
        _gbtree(mt_trees, 1, npt=1), num_class=K_CLASSES,
        base_score="5E-1")

    # --- dart_forest: DART x num_parallel_tree=2 — weight_drop is
    # per-TREE (CHECK_LE'd to tree count, gbtree.cc:463) with both
    # forest members of a round sharing the round's normalization
    # factor (NormalizeTrees applies one factor per commit)
    df_trees = [_stump(i % K_COLS, 0.5 + 0.25 * i, -0.125 - 0.0625 * (i % 2),
                       0.25, tree_id=i) for i in range(6)]
    out["dart_forest"] = _learner(
        {"name": "reg:squarederror", "reg_loss_param":
            {"scale_pos_weight": "1"}},
        _gbtree(df_trees, 1, npt=2,
                weight_drop=[1.0, 1.0, 0.5, 0.5, 0.25, 0.25]))

    # --- cat_dart_forest: interaction of the cat and dart_forest
    # families — DART (modern dialect) x num_parallel_tree=2 where the
    # trees carry categorical splits, so one document exercises
    # SaveCategoricalSplit offsets, per-tree weight_drop (forest pairs
    # share their round's NormalizeTrees factor) AND the weight_drop-
    # inside-model placement at once
    cdf_trees = [
        _cat_depth2(2, [0, 3], 3, [1, 2, 5], (-0.125, 0.25, 0.0625)),
        _cat_stump(3, [2, 4], -0.1875, 0.3125),
        _cat_stump(2, [1, 6], -0.25, 0.125),
        _cat_depth2(3, [0, 5], 2, [3], (0.1875, -0.0625, -0.25)),
        _cat_stump(2, [0, 2, 7], 0.0625, -0.1875),
        _cat_stump(3, [1, 3, 4], 0.375, -0.125),
    ]
    out["cat_dart_forest"] = _learner(
        {"name": "reg:squarederror", "reg_loss_param":
            {"scale_pos_weight": "1"}},
        _gbtree(cdf_trees, 1, npt=2,
                weight_drop=[1.0, 1.0, 0.5, 0.5, 0.75, 0.75]),
        feature_names=[f"f{i}" for i in range(K_COLS)],
        feature_types=["float", "float", "c", "c"])

    # --- gblinear: scalar + multi-group (interleaved w[fid*K + gid])
    out["gblinear"] = _learner(
        {"name": "binary:logistic", "reg_loss_param":
            {"scale_pos_weight": "1"}},
        {"model": {"boosted_rounds": K_ROUNDS,
                   "weights": [0.5, -0.25, 0.125, -0.0625, 2.0]},
         "name": "gblinear"},
        base_score="[5E-1]")
    W = [[0.5, 0.25, -0.5], [1.0, -0.25, 0.75],
         [-0.125, 0.0625, 0.5], [0.375, -0.75, 0.125]]
    bias = [1.0, 2.0, 3.0]
    wb = [W[f][k] for f in range(K_COLS) for k in range(K_CLASSES)] + bias
    out["gblinear_multi"] = _learner(
        {"name": "multi:softprob",
         "softmax_multiclass_param": {"num_class": str(K_CLASSES)}},
        {"model": {"boosted_rounds": K_ROUNDS, "weights": wb},
         "name": "gblinear"},
        num_class=K_CLASSES, base_score="5E-1")
    return out


# Families whose PRIMARY committed artifact is the UBJSON binary (the
# reference's .ubj save path): the .ubj bytes are the fixture, the .json
# twin is derived from the same document.  Pins the binary writer's
# byte stability the way the .json fixtures pin the text dialect.
UBJ_PRIMARY = ["cat_dart_forest"]


def write_all() -> list[str]:
    import sys
    sys.path.insert(0, os.path.join(HERE, "..", "..", ".."))
    from xgboost_spark.sources import ubjson
    paths = []
    for name, doc in fixtures().items():
        if name in UBJ_PRIMARY:
            p = os.path.join(HERE, f"xgboost-{'.'.join(map(str, VERSION))}"
                                   f".{name}.ubj")
            with open(p, "wb") as fh:
                fh.write(ubjson.dumps(doc))
            paths.append(p)
        p = os.path.join(HERE, f"xgboost-{'.'.join(map(str, VERSION))}"
                               f".{name}.json")
        with open(p, "w") as fh:
            json.dump(doc, fh, sort_keys=True, separators=(",", ":"))
        paths.append(p)
    return paths


if __name__ == "__main__":
    for p in write_all():
        print(p)
