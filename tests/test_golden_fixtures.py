"""Golden reference-dialect fixtures (tests/fixtures/ref_models/*.json).

Pins the engine's genuine-dialect import against byte-stable documents
in EXACTLY the reference's save shape (mirroring the model families of
/root/reference/tests/python/generate_models.py — see
fixtures/ref_models/gen_fixtures.py for the serializer-by-serializer
field mapping), so dialect drift breaks a test instead of a user:

1. every fixture loads through the real from_json paths;
2. tree-model margins match an INDEPENDENT NumPy replay of the
   reference's published traversal rules (strict float32 ``x < cond``,
   predict_fn.h:22; in-set category routes RIGHT, categorical.h:50;
   NaN -> default_left; DART weight_drop scaling; output-space
   base_score through the objective link);
3. re-saves stay reference-readable (the loader's strict obj.at /
   CHECK_EQ requirements, gbtree_model.cc:108-109, tree_model.cc:674);
4. the committed bytes equal a fresh generation (byte-stability);
5. the UBJSON surface round-trips the same documents.
"""
from __future__ import annotations

import glob
import json
import math
import os

import numpy as np
import pandas as pd
import pytest

from xgboost_spark.plans.linear import LinearModel
from xgboost_spark.plans.model import GBDTModel

FIX_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "ref_models")
TREE_FIXTURES = ["reg", "logit", "logitraw", "cls", "ltr", "aft",
                 "dart_modern", "dart_legacy",
                 "cat", "multi_target", "dart_forest", "cat_dart_forest"]
ALL_FIXTURES = TREE_FIXTURES + ["gblinear", "gblinear_multi"]


def _path(name: str) -> str:
    p = glob.glob(os.path.join(FIX_DIR, f"*.{name}.json"))
    assert len(p) == 1, (name, p)
    return p[0]


def _doc(name: str) -> dict:
    with open(_path(name)) as fh:
        return json.load(fh)


# --------------------------------------------------------------- replay
# Independent implementation of the reference predictor's published
# rules — intentionally NOT sharing code with xgboost_spark.

def _link_margin(objective: str, v: float) -> float:
    if objective in ("binary:logistic", "reg:logistic", "binary:logitraw"):
        return math.log(v / (1.0 - v))
    if objective in ("count:poisson", "reg:gamma", "reg:tweedie",
                     "survival:aft"):
        return math.log(v)
    return v


def _replay_tree(t: dict, x: np.ndarray) -> float:
    nid = 0
    while t["left_children"][nid] != -1:
        f = t["split_indices"][nid]
        v = x[f]
        if t["split_type"][nid] == 1:                     # categorical
            if np.isnan(v):
                go_left = bool(t["default_left"][nid])
            else:
                cats = set()
                for j, cn in enumerate(t["categories_nodes"]):
                    if cn == nid:
                        beg = t["categories_segments"][j]
                        sz = t["categories_sizes"][j]
                        cats = set(t["categories"][beg:beg + sz])
                go_left = int(v) not in cats              # in-set -> RIGHT
        elif np.isnan(v):
            go_left = bool(t["default_left"][nid])
        else:                                             # strict float32 <
            go_left = np.float32(v) < np.float32(t["split_conditions"][nid])
        nid = (t["left_children"][nid] if go_left
               else t["right_children"][nid])
    slv = int(t["tree_param"]["size_leaf_vector"])
    if slv > 1:
        # MultiTargetTree: vector leaves live in leaf_weights, ordered
        # by ascending leaf node id (multi_target_tree_model.cc)
        leaf_idx = sum(1 for j in range(nid)
                       if t["left_children"][j] == -1)
        return np.asarray(
            t["leaf_weights"][leaf_idx * slv:(leaf_idx + 1) * slv],
            dtype=np.float64)
    return float(t["split_conditions"][nid])


def _replay_margins(doc: dict, X: np.ndarray) -> np.ndarray:
    ln = doc["learner"]
    gb = ln["gradient_booster"]
    model = (gb["gbtree"]["model"] if gb["name"] == "dart" else gb["model"])
    wd = gb.get("weight_drop") or model.get("weight_drop") or []
    trees = model["trees"]
    tree_info = model["tree_info"]
    K = max(int(ln["learner_model_param"]["num_class"]), 1)
    raw_bs = str(ln["learner_model_param"]["base_score"]).strip("[]")
    bs = _link_margin(ln["objective"]["name"], float(raw_bs.split(",")[0]))
    out = np.full((len(X), K), bs)
    for i, t in enumerate(trees):
        w = float(wd[i]) if i < len(wd) else 1.0
        k = int(tree_info[i])
        vector_leaf = int(t["tree_param"]["size_leaf_vector"]) > 1
        for r in range(len(X)):
            v = _replay_tree(t, X[r])
            if vector_leaf:
                out[r, :] += w * v
            else:
                out[r, k] += w * v
    return out


def _probe_X(doc: dict, n=40, seed=7) -> np.ndarray:
    """float32-exact probes: random values, NaNs, category codes, and
    every numeric threshold EXACTLY (ties must route right)."""
    nf = int(doc["learner"]["learner_model_param"]["num_feature"])
    rng = np.random.default_rng(seed)
    X = np.float32(rng.normal(0.5, 1.0, size=(n, nf))).astype(np.float64)
    X[:8, :] = np.float32(rng.integers(0, 8, size=(8, nf)))
    X[8:12, 0] = np.nan
    model = doc["learner"]["gradient_booster"]
    model = (model["gbtree"]["model"] if model["name"] == "dart"
             else model.get("model", {}))
    conds = sorted({
        float(t["split_conditions"][i])
        for t in model.get("trees", [])
        for i in range(len(t["left_children"]))
        if t["left_children"][i] != -1 and t["split_type"][i] == 0})
    for j, c in enumerate(conds[: n - 12]):
        X[12 + j, :] = np.float32(c)
    return X


@pytest.mark.parametrize("name", TREE_FIXTURES)
def test_fixture_margins_match_reference_replay(spark, name):
    doc = _doc(name)
    m = GBDTModel.from_json(json.dumps(doc))
    assert all(t.tie_strict for rnd in m.trees for t in rnd)
    X = _probe_X(doc)
    want = _replay_margins(doc, X)
    nf = X.shape[1]
    fc = [f"f{i}" for i in range(nf)]
    df = spark.createDataFrame(
        pd.DataFrame(X, columns=fc).assign(_rid=np.arange(len(X))))
    out = (m.transform(df, feature_cols=fc, output_margin=True)
           .toPandas().sort_values("_rid"))
    got = np.stack([np.atleast_1d(v) for v in out["margin"].to_numpy()])
    assert got.shape == want.shape, (got.shape, want.shape)
    assert np.allclose(got, want, atol=1e-6), \
        np.abs(got - want).max()
    # the pure-Catalyst path agrees with the Arrow-UDF path
    # (transform_expr emits margins in its out_col, "prediction");
    # vector-leaf models serve via the UDF path only (documented
    # margin_exprs NotImplementedError)
    if name == "multi_target":
        with pytest.raises(NotImplementedError):
            m.transform_expr(df, feature_cols=fc, output_margin=True)
        return
    out2 = (m.transform_expr(df, feature_cols=fc, output_margin=True)
            .toPandas().sort_values("_rid"))
    got2 = np.stack([np.atleast_1d(v)
                     for v in out2["prediction"].to_numpy()])
    assert np.allclose(got2, want, atol=1e-6)


def _require(cond, msg):
    assert cond, msg


def _validate_reference_readable(doc: dict):
    """Replicates the reference loader's STRICT accesses: a failure here
    is a document a genuine build would refuse."""
    _require("version" in doc, "Version::Load requires version")
    ln = doc["learner"]
    lmp = ln["learner_model_param"]
    for k in ("base_score", "num_feature", "num_class"):
        _require(isinstance(lmp[k], str), f"{k} must be a JSON string")
    obj = ln["objective"]
    name = obj["name"]
    blocks = {"multi:": "softmax_multiclass_param",
              "count:poisson": "poisson_regression_param",
              "reg:tweedie": "tweedie_regression_param",
              "reg:pseudohubererror": "pseudo_huber_param",
              "survival:aft": "aft_loss_param",
              "rank:": "lambdarank_param"}
    for prefix, block in blocks.items():
        if name.startswith(prefix):
            _require(block in obj, f"{name} requires {block}")
    gb = ln["gradient_booster"]
    if gb["name"] == "gblinear":
        _require("weights" in gb["model"], "gblinear weights")
        return
    model = gb["gbtree"]["model"] if gb["name"] == "dart" else gb["model"]
    trees = model["trees"]
    _require(int(model["gbtree_model_param"]["num_trees"]) == len(trees),
             "num_trees mismatch")
    indptr = model["iteration_indptr"]
    _require(indptr[0] == 0 and indptr[-1] == len(trees),
             "iteration_indptr bounds")
    for i, t in enumerate(trees):
        _require(t["id"] == i, "CHECK_EQ(tree id, t) gbtree_model.cc:108")
        tp = t["tree_param"]
        for k in ("num_nodes", "num_feature", "size_leaf_vector",
                  "num_deleted"):
            _require(isinstance(tp[k], str), f"tree_param.{k} string")
        n = int(tp["num_nodes"])
        slv = int(tp["size_leaf_vector"])
        for k in ("split_conditions", "split_indices", "default_left",
                  "left_children", "right_children", "parents",
                  "loss_changes", "sum_hessian", "split_type"):
            _require(len(t[k]) == n, f"{k} length")
        if slv > 1:
            # MultiTargetTree arrays are per-node x per-target
            _require(len(t["base_weights"]) == n * slv,
                     "base_weights length (n_nodes x n_targets)")
            n_leaves = sum(1 for v in t["left_children"] if v == -1)
            _require(len(t["leaf_weights"]) == n_leaves * slv,
                     "leaf_weights length (n_leaves x n_targets)")
        else:
            _require(len(t["base_weights"]) == n, "base_weights length")
    wd = gb.get("weight_drop") or model.get("weight_drop")
    if wd:
        _require(len(wd) <= len(trees), "CHECK_LE(weight_drop, trees)")


@pytest.mark.parametrize("name", ALL_FIXTURES)
def test_fixture_loads_and_resaves_reference_readable(name):
    doc = _doc(name)
    _validate_reference_readable(doc)
    if name.startswith("gblinear"):
        m = LinearModel.from_json(json.dumps(doc))
        saved = json.loads(m.to_json())
        assert isinstance(
            saved["learner"]["learner_model_param"]["base_score"], str)
        return
    m = GBDTModel.from_json(json.dumps(doc))
    resaved = json.loads(m.to_json())
    resaved.pop("xgboost_spark", None)
    _validate_reference_readable(resaved)
    # DART weights survive the re-save in the modern dialect; with
    # num_parallel_tree both forest members re-emit the round's weight
    if name.startswith("dart") or name == "cat_dart_forest":
        md = resaved["learner"]["gradient_booster"]["model"]
        want = {"dart_forest": [1.0, 1.0, 0.5, 0.5, 0.25, 0.25],
                "cat_dart_forest": [1.0, 1.0, 0.5, 0.5, 0.75, 0.75],
                }.get(name, [1.0, 0.5, 0.25, 0.75])
        assert md["weight_drop"] == pytest.approx(want)


def test_fixture_bytes_are_stable():
    """Committed fixture bytes == a fresh generation: any edit to the
    generator (or silent drift) must be a deliberate, reviewed change."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "gen_fixtures", os.path.join(FIX_DIR, "gen_fixtures.py"))
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    docs = gen.fixtures()
    assert sorted(docs) == sorted(ALL_FIXTURES)
    for name, doc in docs.items():
        with open(_path(name), "rb") as fh:
            on_disk = fh.read()
        fresh = json.dumps(doc, sort_keys=True,
                           separators=(",", ":")).encode()
        assert on_disk == fresh, f"{name}: fixture bytes drifted"


def test_ubjson_primary_fixture_bytes_stable(spark):
    """cat_dart_forest is UBJSON-PRIMARY: the committed ``.ubj`` IS the
    fixture (the reference's binary save path, c_api.h:1353-1389 picks
    the writer by extension), the ``.json`` twin is derived.  Pins
    (1) the binary writer's bytes — any drift in the UBJ encoder breaks
    here, not in a user's saved model; (2) that the binary and text
    documents are the SAME document; (3) that the model loaded from the
    binary bytes serves identically to the JSON-loaded twin."""
    from xgboost_spark.sources import ubjson
    ubj_path = _path("cat_dart_forest").removesuffix(".json") + ".ubj"
    with open(ubj_path, "rb") as fh:
        on_disk = fh.read()
    doc = _doc("cat_dart_forest")
    assert on_disk == ubjson.dumps(doc), "UBJ fixture bytes drifted"
    assert ubjson.loads(on_disk) == doc
    m_bin = GBDTModel.from_doc(ubjson.loads(on_disk))
    m_txt = GBDTModel.from_json(json.dumps(doc))
    X = _probe_X(doc, n=24)
    fc = [f"f{i}" for i in range(X.shape[1])]
    df = spark.createDataFrame(pd.DataFrame(X, columns=fc))
    a = m_bin.transform(df, feature_cols=fc).toPandas()["prediction"]
    b = m_txt.transform(df, feature_cols=fc).toPandas()["prediction"]
    assert np.array_equal(np.stack(a.to_numpy()), np.stack(b.to_numpy()))


def test_multi_target_fixture_base_margin_replace(spark):
    """Interaction pin: the multi_target golden fixture served with a
    per-row base_margin VECTOR — the margin REPLACES the link-space
    base_score in every target (predictor.cc:66-72 applies the supplied
    margin as the init; MultiTargetTree leaves then add per-target), so
    expected = replay - base_score + base_margin[r, k]."""
    doc = _doc("multi_target")
    m = GBDTModel.from_json(json.dumps(doc))
    X = _probe_X(doc, n=24)
    K = int(doc["learner"]["learner_model_param"]["num_class"])
    rng = np.random.default_rng(11)
    bm = np.float32(rng.normal(0.0, 0.5, size=(len(X), K))).astype(np.float64)
    bs = _link_margin(doc["learner"]["objective"]["name"],
                      float(doc["learner"]["learner_model_param"]
                            ["base_score"].strip("[]")))
    want = _replay_margins(doc, X) - bs + bm
    fc = [f"f{i}" for i in range(X.shape[1])]
    pdf = pd.DataFrame(X, columns=fc).assign(
        _rid=np.arange(len(X)), bm=list(bm))
    df = spark.createDataFrame(pdf)
    out = (m.transform(df, feature_cols=fc, output_margin=True,
                       base_margin_col="bm")
           .toPandas().sort_values("_rid"))
    got = np.stack([np.atleast_1d(v) for v in out["margin"].to_numpy()])
    assert np.allclose(got, want, atol=1e-6), np.abs(got - want).max()


@pytest.mark.parametrize("name", ["reg", "cls", "dart_modern"])
def test_fixture_ubjson_roundtrip(spark, name):
    from xgboost_spark.sources import ubjson
    doc = _doc(name)
    m1 = GBDTModel.from_json(json.dumps(doc))
    m2 = GBDTModel.from_doc(ubjson.loads(ubjson.dumps(doc)))
    X = _probe_X(doc, n=16)
    fc = [f"f{i}" for i in range(X.shape[1])]
    df = spark.createDataFrame(pd.DataFrame(X, columns=fc))
    a = m1.transform(df, feature_cols=fc).toPandas()["prediction"]
    b = m2.transform(df, feature_cols=fc).toPandas()["prediction"]
    assert np.array_equal(np.stack(a.to_numpy()), np.stack(b.to_numpy()))
