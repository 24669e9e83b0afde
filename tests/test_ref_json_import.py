"""Import of genuine reference-xgboost model JSON.

Fixture hand-authored to the reference save format
(`src/tree/tree_model.cc:1044-1082` SaveModel/SaveCategoricalSplit,
`src/learner.cc` LearnerModelParam: output-space "[5E-1]" base_score,
categorical splits as flat categories/categories_nodes arrays with
in-set-category rows routed RIGHT, `src/common/categorical.h:50`).
Expected predictions are hand-traced from those semantics.
"""

import json
import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from xgboost_spark.plans.model import GBDTModel


def _ref_doc():
    return {
        "version": [3, 0, 2],
        "learner": {
            "attributes": {},
            "feature_names": [],
            "feature_types": [],
            "learner_model_param": {
                "base_score": "[5E-1]", "num_class": "0",
                "num_feature": "2", "num_target": "1",
            },
            "objective": {"name": "binary:logistic",
                          "reg_loss_param": {"scale_pos_weight": "1"}},
            "gradient_booster": {
                "name": "gbtree",
                "model": {
                    "gbtree_model_param": {"num_trees": "2",
                                           "num_parallel_tree": "1"},
                    "iteration_indptr": [0, 1, 2],
                    "tree_info": [0, 0],
                    "trees": [
                        {   # numeric: f0 <= 2.0, missing goes left
                            "tree_param": {"num_nodes": "3", "num_feature": "2",
                                           "size_leaf_vector": "1"},
                            "split_indices": [0, 0, 0],
                            "split_conditions": [2.0, 0.5, -0.3],
                            "split_type": [0, 0, 0],
                            "categories": [], "categories_nodes": [],
                            "categories_segments": [], "categories_sizes": [],
                            "default_left": [1, 0, 0],
                            "left_children": [1, -1, -1],
                            "right_children": [2, -1, -1],
                            "parents": [2147483647, 0, 0],
                            "loss_changes": [10.0, 0.0, 0.0],
                            "sum_hessian": [20.0, 12.0, 8.0],
                            "base_weights": [0.1, 0.5, -0.3],
                        },
                        {   # categorical on f1: {1,3} -> RIGHT, missing right
                            "tree_param": {"num_nodes": "3", "num_feature": "2",
                                           "size_leaf_vector": "1"},
                            "split_indices": [1, 0, 0],
                            "split_conditions": [0.0, -1.0, 2.0],
                            "split_type": [1, 0, 0],
                            "categories": [1, 3], "categories_nodes": [0],
                            "categories_segments": [0], "categories_sizes": [2],
                            "default_left": [0, 0, 0],
                            "left_children": [1, -1, -1],
                            "right_children": [2, -1, -1],
                            "parents": [2147483647, 0, 0],
                            "loss_changes": [5.0, 0.0, 0.0],
                            "sum_hessian": [20.0, 9.0, 11.0],
                            "base_weights": [0.0, -1.0, 2.0],
                        },
                    ],
                },
            },
        },
    }


#: (f0, f1) -> expected margin per the reference's traversal rules
CASES = [
    ((1.0, 3.0), 0.5 + 2.0),        # f0<=2 left; f1=3 in set -> right
    ((5.0, 2.0), -0.3 + -1.0),      # f0>2 right; 2 not in set -> left
    ((np.nan, np.nan), 0.5 + 2.0),  # dflt: tree0 left, tree1 right
    ((3.0, 1.0), -0.3 + 2.0),       # in set -> right
]


def test_ref_json_predictions(spark):
    m = GBDTModel.from_json(json.dumps(_ref_doc()))
    assert m.base_score == pytest.approx(0.0)   # logit(0.5)
    assert m.feature_names == ["f0", "f1"]
    pdf = pd.DataFrame([c[0] for c in CASES], columns=["f0", "f1"])
    df = spark.createDataFrame(pdf)
    out = (m.transform(df, feature_cols=["f0", "f1"], output_margin=True)
           .toPandas().sort_values("f0", na_position="first"))
    expect = sorted(CASES, key=lambda c: (not math.isnan(c[0][0]), c[0][0]))
    for got_m, got_p, (_, want) in zip(out["margin"], out["prediction"], expect):
        assert got_m[0] == pytest.approx(want)
        assert got_p == pytest.approx(1.0 / (1.0 + math.exp(-want)))


def test_ref_json_roundtrip(spark):
    """Engine save -> load keeps semantics AND emits the reference's
    flat categorical arrays (in-set right) on disk."""
    m = GBDTModel.from_json(json.dumps(_ref_doc()))
    saved = json.loads(m.to_json())
    t1 = saved["learner"]["gradient_booster"]["model"]["trees"][1]
    assert t1["categories_nodes"] == [0]
    assert t1["categories"] == [1, 3]
    assert t1["categories_sizes"] == [2]
    # output-space intercept on disk, like the reference
    assert float(saved["learner"]["learner_model_param"]["base_score"]) \
        == pytest.approx(0.5)
    m2 = GBDTModel.from_json(json.dumps(saved))
    pdf = pd.DataFrame([c[0] for c in CASES], columns=["f0", "f1"])
    df = spark.createDataFrame(pdf)
    a = m.transform(df, feature_cols=["f0", "f1"]).toPandas()["prediction"]
    b = m2.transform(df, feature_cols=["f0", "f1"]).toPandas()["prediction"]
    assert np.allclose(np.sort(a), np.sort(b))


def test_ref_json_vector_base_score(spark):
    """Newer reference versions store one intercept per class
    (learner.cc ParamArray base_score, e.g. '[0.2,0.5,0.3]'); each
    class margin must start from its own intercept."""
    doc = _ref_doc()
    lp = doc["learner"]["learner_model_param"]
    lp["base_score"] = "[0.25,0.75,0.5]"
    lp["num_class"] = "3"
    doc["learner"]["objective"] = {"name": "multi:softprob"}
    gb = doc["learner"]["gradient_booster"]["model"]
    # 3 single-leaf trees, one per class, leaf values 1/2/3
    gb["gbtree_model_param"] = {"num_trees": "3", "num_parallel_tree": "1"}
    gb["tree_info"] = [0, 1, 2]
    gb["trees"] = []
    for k in range(3):
        gb["trees"].append({
            "tree_param": {"num_nodes": "1", "num_feature": "2",
                           "size_leaf_vector": "1"},
            "split_indices": [0], "split_conditions": [float(k + 1)],
            "split_type": [0], "categories": [], "categories_nodes": [],
            "categories_segments": [], "categories_sizes": [],
            "default_left": [0], "left_children": [-1],
            "right_children": [-1], "parents": [2147483647],
            "loss_changes": [0.0], "sum_hessian": [1.0],
            "base_weights": [float(k + 1)],
        })
    m = GBDTModel.from_json(json.dumps(doc))
    assert m.base_score_vec is not None
    df = spark.createDataFrame(pd.DataFrame({"f0": [0.0], "f1": [0.0]}))
    out = m.transform(df, feature_cols=["f0", "f1"],
                      output_margin=True).toPandas()
    # margin_k = bs_k + leaf_k (multiclass intercepts are identity-link)
    assert np.allclose(out["margin"][0], [1.25, 2.75, 3.5])
    # round trip keeps the vector
    m2 = GBDTModel.from_json(m.to_json())
    out2 = m2.transform(df, feature_cols=["f0", "f1"],
                        output_margin=True).toPandas()
    assert np.allclose(out2["margin"][0], [1.25, 2.75, 3.5])
    # the pure-Catalyst path agrees
    out3 = m.transform_expr(df, feature_cols=["f0", "f1"],
                            output_margin=True).toPandas()
    assert np.allclose(out3["prediction"][0], [1.25, 2.75, 3.5])


def test_ref_json_jvm_expr_path(spark):
    """The pure-Catalyst serving path honors the flipped categorical
    direction too."""
    m = GBDTModel.from_json(json.dumps(_ref_doc()))
    pdf = pd.DataFrame([c[0] for c in CASES if not math.isnan(c[0][0])],
                       columns=["f0", "f1"])
    df = spark.createDataFrame(pdf)
    out = (m.transform_expr(df, feature_cols=["f0", "f1"], output_margin=True)
           .orderBy("f0").toPandas())
    expect = sorted((c for c in CASES if not math.isnan(c[0][0])),
                    key=lambda c: c[0][0])
    for got, (_, want) in zip(out["prediction"], expect):
        assert got == pytest.approx(want)

# --------------------------------------------------------------- DART dialect

def _dartify(saved: dict, legacy: bool) -> dict:
    """Rewrite an engine save into the genuine reference DART dialect.

    legacy=True: `src/gbm/gbtree.cc:448-463` — gradient_booster is
    ``{"name": "dart", "gbtree": {model...}, "weight_drop": [...]}``.
    legacy=False: modern save — ``weight_drop`` array INSIDE the model
    object (`src/gbm/gbtree_model.cc:80-84`), name stays "gbtree".
    Strips the engine extension block either way."""
    doc = json.loads(json.dumps(saved))
    ext = doc.pop("xgboost_spark")
    gb = doc["learner"]["gradient_booster"]
    rounds = ext["tree_weights"]
    trees = gb["model"]["trees"]
    K = max(len(trees) // len(rounds), 1)
    per_tree = [w for w in rounds for _ in range(K)]
    if legacy:
        doc["learner"]["gradient_booster"] = {
            "name": "dart",
            "gbtree": {"model": gb["model"]},
            "weight_drop": per_tree,
        }
    else:
        gb["model"]["weight_drop"] = per_tree
    return doc


@pytest.mark.parametrize("legacy", [True, False], ids=["nested", "in-model"])
def test_ref_dart_json_dialects(spark, reg_df, legacy):
    """A stripped genuine-dialect DART doc (no extension block) must load
    and predict exactly like the extension-block round trip."""
    from xgboost_spark.plans.booster import train
    fc = [f"c{i}" for i in range(5)]
    model = train({"num_boost_round": 6, "max_depth": 3, "base_score": 0.0,
                   "booster": "dart", "rate_drop": 0.5, "one_drop": True,
                   "seed": 7}, reg_df, feature_cols=fc)
    assert any(w != 1.0 for w in model.tree_weights)
    saved = json.loads(model.to_json())
    m_ext = GBDTModel.from_json(json.dumps(saved))
    m_ref = GBDTModel.from_json(json.dumps(_dartify(saved, legacy)))
    assert m_ref.tree_weights == pytest.approx(m_ext.tree_weights)
    sample = reg_df.limit(200)
    a = (m_ext.transform(sample, feature_cols=fc, output_margin=True)
         .toPandas().sort_values("c0")["margin"])
    b = (m_ref.transform(sample, feature_cols=fc, output_margin=True)
         .toPandas().sort_values("c0")["margin"])
    assert np.array_equal(np.stack(a.to_numpy()), np.stack(b.to_numpy()))


def test_ref_dart_legacy_override_and_short_array(spark, reg_df):
    """Reference compat rules: a top-level weight_drop OVERRIDES the
    model-level array, and a short array (CHECK_LE, gbtree.cc:462)
    leaves the remaining trees at weight 1.0."""
    from xgboost_spark.plans.booster import train
    fc = [f"c{i}" for i in range(5)]
    model = train({"num_boost_round": 3, "max_depth": 2, "base_score": 0.0,
                   "booster": "dart", "rate_drop": 0.0, "seed": 3},
                  reg_df, feature_cols=fc)
    saved = json.loads(model.to_json())
    doc = _dartify(saved, legacy=False)
    doc["learner"]["gradient_booster"]["model"]["weight_drop"] = [0.5, 0.5, 0.5]
    doc["learner"]["gradient_booster"]["weight_drop"] = [0.25]   # wins, short
    m = GBDTModel.from_json(json.dumps(doc))
    assert m.tree_weights == pytest.approx([0.25, 1.0, 1.0])


# ----------------------------------------------------------- gblinear dialect

def test_ref_gblinear_json_dialect(spark):
    """Genuine reference gblinear JSON (`src/gbm/gblinear_model.cc:10-42`):
    flat (num_feature+1) weights with bias last, output-space
    "[5E-1]"-style base_score, no feature_names."""
    from xgboost_spark.plans.linear import LinearModel
    doc = {
        "version": [3, 0, 2],
        "learner": {
            "attributes": {},
            "feature_names": [],
            "feature_types": [],
            "learner_model_param": {
                "base_score": "[5E-1]", "num_class": "0",
                "num_feature": "2", "num_target": "1",
            },
            "objective": {"name": "binary:logistic",
                          "reg_loss_param": {"scale_pos_weight": "1"}},
            "gradient_booster": {
                "name": "gblinear",
                "model": {"weights": [0.5, -0.25, 2.0],
                          "boosted_rounds": 10},
            },
        },
    }
    m = LinearModel.from_json(json.dumps(doc))
    assert m.base_score == pytest.approx(0.0)            # logit(0.5)
    assert list(m.weights) == pytest.approx([0.5, -0.25])
    assert m.bias == pytest.approx(2.0)
    assert m.feature_names == ["f0", "f1"]
    df = spark.createDataFrame(pd.DataFrame({"f0": [2.0], "f1": [4.0]}))
    out = m.transform(df, feature_cols=["f0", "f1"],
                      output_margin=True).toPandas()
    assert out["margin"][0] == pytest.approx(0.5 * 2.0 - 0.25 * 4.0 + 2.0)
    assert out["prediction"][0] == pytest.approx(
        1.0 / (1.0 + math.exp(-2.0)))


def test_ref_gblinear_multigroup(spark):
    """Multi-group gblinear: interleaved weights w[fid*K + gid] with the
    bias block last (gblinear_model.h:49-62); softprob serving is a
    stable softmax over the per-group inner products."""
    from xgboost_spark.plans.linear import LinearModel
    # F=2, K=3: w[f,k] = f + 0.1*k scaled; bias = [1, 2, 3]
    W = np.array([[0.5, 0.25, -0.5], [1.0, -0.25, 0.75]])
    bias = np.array([1.0, 2.0, 3.0])
    wb = [W[f, k] for f in range(2) for k in range(3)] + list(bias)
    doc = {"learner": {
        "learner_model_param": {"base_score": "[0.1,0.2,0.3]",
                                "num_class": "3", "num_feature": "2"},
        "objective": {"name": "multi:softprob"},
        "gradient_booster": {"name": "gblinear",
                             "model": {"weights": wb}},
    }}
    m = LinearModel.from_json(json.dumps(doc))
    assert m.n_groups == 3
    x = np.array([2.0, 4.0])
    want_m = np.array([0.1, 0.2, 0.3]) + bias + W.T @ x
    want_p = np.exp(want_m - want_m.max())
    want_p /= want_p.sum()
    df = spark.createDataFrame(pd.DataFrame({"f0": [x[0]], "f1": [x[1]]}))
    out = m.transform(df, feature_cols=["f0", "f1"],
                      output_margin=True).toPandas()
    assert np.allclose(out["margin"][0], want_m)
    assert np.allclose(out["prediction"][0], want_p)
    # round trip through the engine save (interleaved layout + margin
    # marker) preserves groups
    m2 = LinearModel.from_json(m.to_json())
    out2 = m2.transform(df, feature_cols=["f0", "f1"]).toPandas()
    assert np.allclose(out2["prediction"][0], want_p)
    # softmax objective serves the argmax class id
    doc["learner"]["objective"] = {"name": "multi:softmax"}
    m3 = LinearModel.from_json(json.dumps(doc))
    out3 = m3.transform(df, feature_cols=["f0", "f1"]).toPandas()
    assert out3["prediction"][0] == float(np.argmax(want_m))


def test_own_dart_save_readable_without_extension(spark, reg_df):
    """Engine DART saves carry weight_drop in the reference's modern
    model-level dialect, so stripping the whole engine extension block
    (what a genuine reference build would see) keeps the drop weights."""
    from xgboost_spark.plans.booster import train
    fc = [f"c{i}" for i in range(5)]
    model = train({"num_boost_round": 5, "max_depth": 2, "base_score": 0.0,
                   "booster": "dart", "rate_drop": 0.5, "one_drop": True,
                   "seed": 11}, reg_df, feature_cols=fc)
    assert any(w != 1.0 for w in model.tree_weights)
    doc = json.loads(model.to_json())
    md = doc["learner"]["gradient_booster"]["model"]
    assert md["weight_drop"] == pytest.approx(model.tree_weights)
    doc.pop("xgboost_spark")
    m2 = GBDTModel.from_json(json.dumps(doc))
    assert m2.tree_weights == pytest.approx(model.tree_weights)


def test_ref_json_forest_grouping(spark):
    """A genuine forest doc (num_parallel_tree=2, 2 boosting rounds, 4
    single-leaf trees) must group as 2 rounds of 2 trees — via
    iteration_indptr when present, via num_class x num_parallel_tree
    otherwise (gbtree_model.cc:118-127 MakeIndptr) — and all 4 leaves
    must sum into the margin."""
    doc = _ref_doc()
    gb = doc["learner"]["gradient_booster"]["model"]
    gb["gbtree_model_param"] = {"num_trees": "4", "num_parallel_tree": "2"}
    gb["tree_info"] = [0, 0, 0, 0]
    gb["trees"] = []
    for k in range(4):
        gb["trees"].append({
            "tree_param": {"num_nodes": "1", "num_feature": "2",
                           "size_leaf_vector": "1"},
            "split_indices": [0], "split_conditions": [float(2 ** k)],
            "split_type": [0], "categories": [], "categories_nodes": [],
            "categories_segments": [], "categories_sizes": [],
            "default_left": [0], "left_children": [-1],
            "right_children": [-1], "parents": [2147483647],
            "loss_changes": [0.0], "sum_hessian": [1.0],
            "base_weights": [float(2 ** k)],
        })
    df = spark.createDataFrame(pd.DataFrame({"f0": [0.0], "f1": [0.0]}))
    for indptr in ([0, 2, 4], None):
        d = json.loads(json.dumps(doc))
        if indptr is None:
            d["learner"]["gradient_booster"]["model"].pop(
                "iteration_indptr", None)
        else:
            d["learner"]["gradient_booster"]["model"][
                "iteration_indptr"] = indptr
        m = GBDTModel.from_json(json.dumps(d))
        assert [len(r) for r in m.trees] == [2, 2]
        assert m.params.num_parallel_tree == 2
        out = m.transform(df, feature_cols=["f0", "f1"],
                          output_margin=True).toPandas()
        # margin = logit(0.5) + 1 + 2 + 4 + 8
        assert out["margin"][0][0] == pytest.approx(15.0)
        # iteration_range [0,1) keeps only the first round's forest
        s = m.slice(0, 1)
        o2 = s.transform(df, feature_cols=["f0", "f1"],
                         output_margin=True).toPandas()
        assert o2["margin"][0][0] == pytest.approx(3.0)


# --------------------------------------------------- tie convention (round 11)

def _stump_doc(split: float, lo: float, hi: float) -> dict:
    """Genuine-dialect single-stump regression doc: f0 vs ``split``,
    left leaf ``lo``, right leaf ``hi``, missing goes left."""
    return {
        "version": [3, 0, 2],
        "learner": {
            "attributes": {}, "feature_names": [], "feature_types": [],
            "learner_model_param": {
                "base_score": "0", "num_class": "0",
                "num_feature": "1", "num_target": "1"},
            "objective": {"name": "reg:squarederror"},
            "gradient_booster": {
                "name": "gbtree",
                "model": {
                    "gbtree_model_param": {"num_trees": "1",
                                           "num_parallel_tree": "1"},
                    "iteration_indptr": [0, 1], "tree_info": [0],
                    "trees": [{
                        "tree_param": {"num_nodes": "3", "num_feature": "1",
                                       "size_leaf_vector": "1"},
                        "split_indices": [0, 0, 0],
                        "split_conditions": [split, lo, hi],
                        "split_type": [0, 0, 0],
                        "categories": [], "categories_nodes": [],
                        "categories_segments": [], "categories_sizes": [],
                        "default_left": [1, 0, 0],
                        "left_children": [1, -1, -1],
                        "right_children": [2, -1, -1],
                        "parents": [2147483647, 0, 0],
                        "loss_changes": [1.0, 0.0, 0.0],
                        "sum_hessian": [3.0, 2.0, 1.0],
                        "base_weights": [0.0, lo, hi],
                    }],
                },
            },
        },
    }


def test_ref_import_strict_tie_convention(spark):
    """The reference predictor routes LEFT only on strict float32
    ``x < split_cond`` (`src/predictor/predict_fn.h:22`), so a row
    exactly AT the threshold goes RIGHT — genuine-dialect imports must
    serve that convention on BOTH the Arrow-UDF path (transform) and
    the pure-Catalyst path (transform_expr); engine-trained models keep
    ``<=`` (their binning is <=-upper-bound-consistent)."""
    m = GBDTModel.from_json(json.dumps(_stump_doc(2.0, -1.0, 1.0)))
    assert all(t.tie_strict for rnd in m.trees for t in rnd)
    df = spark.createDataFrame(
        pd.DataFrame({"f0": [1.5, 2.0, 2.5, np.nan]}))
    for path in ("udf", "expr"):
        fn = m.transform if path == "udf" else m.transform_expr
        out = (fn(df, feature_cols=["f0"])
               .toPandas().sort_values("f0", na_position="last"))
        got = list(out["prediction"])
        assert got[0] == pytest.approx(-1.0)        # 1.5 < 2.0 -> left
        assert got[1] == pytest.approx(1.0), path   # tie -> RIGHT
        assert got[2] == pytest.approx(1.0)
        assert got[3] == pytest.approx(-1.0)        # missing: default left
    # engine re-save keeps the strict convention (extension flag)
    m2 = GBDTModel.from_json(m.to_json())
    assert all(t.tie_strict for rnd in m2.trees for t in rnd)
    out2 = m2.transform(df, feature_cols=["f0"]).toPandas()
    assert sorted(out2["prediction"])[2] == pytest.approx(1.0)


def test_ref_import_float32_threshold_compare(spark):
    """The reference compares float32 OPERANDS (fvalue is ingested as
    float32, predict_fn.h:22): a double x just below the float32
    threshold that ROUNDS TO the threshold must tie and route RIGHT —
    a double-precision ``x < t32`` compare would wrongly send it left.
    Pins that both serving paths cast the feature to float32 too."""
    t32 = float(np.float32(0.1))
    assert t32 > 0.1
    x = t32 - 1e-10              # double: x < t32, but float32(x) == t32
    assert x < t32 and float(np.float32(x)) == t32
    m = GBDTModel.from_json(json.dumps(_stump_doc(0.1, -1.0, 1.0)))
    df = spark.createDataFrame(pd.DataFrame({"f0": [x]}))
    for fn in (m.transform, m.transform_expr):
        out = fn(df, feature_cols=["f0"]).toPandas()
        assert out["prediction"][0] == pytest.approx(1.0), fn


def test_engine_trained_keeps_le_tie(spark):
    """An engine-trained model routes ties LEFT (``<=``): pin via a
    hand-built core.Tree served through both paths."""
    from xgboost_spark import core
    from xgboost_spark.config import TrainParams
    t = core.Tree()
    t.expand(0, 0, 0, 2.0, True, 1.0, 0.0, 2.0, 0.0, 1.0)
    t.leaf_value[1], t.leaf_value[2] = -1.0, 1.0
    m = GBDTModel(TrainParams.from_dict({"objective": "reg:squarederror"}),
                  0.0, [[t]], ["f0"])
    df = spark.createDataFrame(pd.DataFrame({"f0": [2.0]}))
    for fn in (m.transform, m.transform_expr):
        out = fn(df, feature_cols=["f0"]).toPandas()
        assert out["prediction"][0] == pytest.approx(-1.0), fn   # tie LEFT
    # round trip: engine dialect keeps <= (no tie_strict flag)
    m2 = GBDTModel.from_json(m.to_json())
    assert not any(tt.tie_strict for rnd in m2.trees for tt in rnd)


# ------------------------------------------- gblinear base_score spaces (r11)

def test_gblinear_save_output_space_base_score():
    """LinearModel.to_json writes the reference's OUTPUT-space
    base_score into learner_model_param (like GBDTModel): a genuine
    reference build applies ProbToMargin on load, so the margin-space
    value must NOT appear there (a margin 0.0 for binary:logistic is
    output 0.5); the exact margin rides in the extension block."""
    from xgboost_spark.config import TrainParams
    from xgboost_spark.plans.linear import LinearModel
    m = LinearModel(TrainParams.from_dict({"objective": "binary:logistic"}),
                    0.0, np.array([0.5, -0.25]), 2.0, ["f0", "f1"])
    doc = json.loads(m.to_json())
    assert float(doc["learner"]["learner_model_param"]["base_score"]) \
        == pytest.approx(0.5)
    assert doc["xgboost_spark"]["base_score_margin"] == pytest.approx(0.0)
    assert "version" in doc
    # round trip restores the exact margin-space intercept
    m2 = LinearModel.from_json(m.to_json())
    assert m2.base_score == pytest.approx(0.0, abs=1e-15)


def test_gblinear_legacy_engine_save_margin_space():
    """Legacy engine gblinear saves (pre-round-11: margin-space
    base_score in learner_model_param, NO extension block, NO version
    key) must load margin-space — the discriminator is the top-level
    "version" key genuine reference docs always carry
    (learner.cc Version::Save) and legacy engine saves never did."""
    from xgboost_spark.plans.linear import LinearModel
    legacy = {"learner": {
        "gradient_booster": {"name": "gblinear",
                             "model": {"weights": [0.5, -0.25, 2.0]}},
        "objective": {"name": "binary:logistic"},
        "feature_names": ["f0", "f1"],
        "learner_model_param": {"base_score": "0.0", "num_feature": "2",
                                "num_class": "0"},
    }}
    m = LinearModel.from_json(json.dumps(legacy))
    # margin space: stays 0.0 (prob_to_margin would give logit(eps))
    assert m.base_score == pytest.approx(0.0, abs=1e-12)


def test_engine_export_exclusive_bounds_tie_faithful(spark):
    """Engine saves export reference-dialect split_conditions as
    EXCLUSIVE float32 bounds (one ulp above the engine's inclusive
    bound), so a genuine reference build — strict float32 ``<``,
    predict_fn.h:22 — reproduces the engine's routing for every
    float32-exact feature value, INCLUDING rows exactly at a split
    (engine bins are <=-upper-bound, so bin-boundary data values tie).
    The exact inclusive bounds ride in the extension block, keeping
    engine round-trips bit-exact."""
    from xgboost_spark import core
    from xgboost_spark.config import TrainParams
    t = core.Tree()
    t.expand(0, 0, 0, 2.0, True, 1.0, 0.0, 2.0, 0.0, 1.0)
    t.leaf_value[1], t.leaf_value[2] = -1.0, 1.0
    m = GBDTModel(TrainParams.from_dict({"objective": "reg:squarederror"}),
                  0.0, [[t]], ["f0"])
    doc = json.loads(m.to_json())
    cond = doc["learner"]["gradient_booster"]["model"]["trees"][0][
        "split_conditions"][0]
    assert cond == float(np.nextafter(np.float32(2.0), np.float32(np.inf)))
    assert doc["xgboost_spark"]["exact_split_values"][0][0] == 2.0
    df = spark.createDataFrame(pd.DataFrame({"f0": [1.5, 2.0, 2.5]}))
    want = [-1.0, -1.0, 1.0]                      # engine: tie LEFT
    # engine round trip: exact bounds restored, '<=' kept
    m2 = GBDTModel.from_json(m.to_json())
    assert m2.trees[0][0].split_value[1 - 1] == 2.0
    # stripped = what a genuine reference build sees: strict float32 '<'
    # on the exclusive bound — SAME routing at the tie
    stripped = {k: v for k, v in doc.items() if k != "xgboost_spark"}
    m3 = GBDTModel.from_json(json.dumps(stripped))
    assert all(tt.tie_strict for rnd in m3.trees for tt in rnd)
    for model in (m2, m3):
        for fn in (model.transform, model.transform_expr):
            out = fn(df, feature_cols=["f0"]).toPandas().sort_values("f0")
            assert list(out["prediction"]) == pytest.approx(want), (model, fn)
