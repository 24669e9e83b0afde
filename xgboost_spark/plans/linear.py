"""gblinear: regularized linear booster.

Re-expresses the reference's linear updaters (coordinate descent
`src/linear/updater_coordinate.cc:24-100`, parallel lock-free shotgun
`src/linear/updater_shotgun.cc:96`, elastic-net soft threshold
`CoordinateDelta`) for Spark's execution model:

- per boosting round ONE Spark job computes every feature's gradient
  sums (sum g*x_f, sum h*x_f^2) plus the bias sums as per-partition
  partials (a treeAggregate-shaped mapInPandas + final agg);
- the driver applies the shotgun update to ALL features at once:
      dw_f = -ThresholdL1(sum(g x_f) + lambda*w_f, alpha) / (sum(h x_f^2) + lambda)
      w_f += eta * dw_f;     bias += eta * (-sum g / sum h)
- serving is a pure Catalyst expression (weights are literals), so
  whole-stage codegen applies and no Python is in the hot path.

Missing values contribute 0, matching the reference's sparse-entry
semantics (absent entry = no contribution).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xgboost_spark.config import TrainParams
from xgboost_spark.functions import metrics as metrics_mod
from xgboost_spark.functions.objectives import get_objective
from xgboost_spark.sources.tables import assemble_features


class LinearModel:
    """weights/bias + base_score; serving via column expressions."""

    def __init__(self, params: TrainParams, base_score: float,
                 weights: np.ndarray, bias: float, feature_names: list[str],
                 eval_history: dict | None = None):
        self.params = params
        self.base_score = base_score
        # (F,) trained scalar form, or (F, K) for a loaded multi-group
        # reference document (bias then a (K,) vector)
        self.weights = np.asarray(weights, dtype=np.float64)
        self.bias = (float(bias) if np.ndim(bias) == 0
                     else np.asarray(bias, dtype=np.float64))
        self.feature_names = feature_names
        self.eval_history = eval_history or {}
        self.obj = get_objective(params.objective, params)

    @property
    def n_groups(self) -> int:
        """1 for the trained scalar form; K when a multi-group reference
        document was loaded (weights shape (F, K))."""
        return 1 if self.weights.ndim == 1 else int(self.weights.shape[1])

    def margin_expr(self, feature_cols: list[str] | None = None):
        cols = feature_cols or self.feature_names
        e = F.lit(self.base_score + self.bias)
        for w, c in zip(self.weights, cols):
            if w != 0.0:
                e = e + F.lit(float(w)) * F.coalesce(F.col(c).cast("double"), F.lit(0.0))
        return e

    def margin_exprs(self, feature_cols: list[str] | None = None) -> list:
        """One margin expression per output group: margin_k =
        base_score_k + bias_k + sum_f w[f,k] * x_f (reference
        `src/gbm/gblinear.cc` PredictBatch per-group inner product;
        multiclass intercepts are identity-link, like GBDTModel)."""
        if self.n_groups == 1:
            return [self.margin_expr(feature_cols)]
        cols = feature_cols or self.feature_names
        bs = getattr(self, "base_score_vec", None)
        outs = []
        for k in range(self.n_groups):
            b = (float(bs[k]) if bs is not None else self.base_score)
            e = F.lit(b + float(self.bias[k]))
            for w, c in zip(self.weights[:, k], cols):
                if w != 0.0:
                    e = e + F.lit(float(w)) * F.coalesce(
                        F.col(c).cast("double"), F.lit(0.0))
            outs.append(e)
        return outs

    def transform(self, df: DataFrame, feature_cols: list[str] | None = None,
                  output_margin: bool = False,
                  pred_contribs: bool = False) -> DataFrame:
        """``pred_contribs``: per-feature contribution array (w_f * x_f,
        bias+intercept last) — the reference's gblinear contribution
        semantics (`src/gbm/gblinear.cc:153-194` PredictContribution:
        linear terms are exact Shapley values).  Pure expressions."""
        name = self.params.objective
        if self.n_groups > 1:
            margins = self.margin_exprs(feature_cols)
            if name == "multi:softmax":
                pred = (F.array_position(
                    F.array(*margins), F.greatest(*margins)) - 1
                ).cast("double")
            else:
                # multi:softprob — numerically stable softmax as SQL
                mx = F.greatest(*margins)
                exps = [F.exp(m - mx) for m in margins]
                tot = exps[0]
                for e in exps[1:]:
                    tot = tot + e
                pred = F.array(*[e / tot for e in exps])
            out = df.withColumn("prediction", pred)
            if output_margin:
                out = out.withColumn("margin", F.array(*margins))
            if pred_contribs:
                # per-GROUP contribution blocks (reference
                # `src/gbm/gblinear.cc:153-194` PredictContribution
                # loops gid: w[f][gid]*x_f per feature, intercept —
                # bias_gid + base_score_gid — last); linear terms are
                # exact Shapley values.  Shape (K, F+1) per row.
                cols = feature_cols or self.feature_names
                bs = getattr(self, "base_score_vec", None)
                blocks = []
                for k in range(self.n_groups):
                    b = (float(bs[k]) if bs is not None
                         else float(self.base_score))
                    terms = [
                        (F.lit(float(w)) * F.coalesce(
                            F.col(c).cast("double"), F.lit(0.0)))
                        for w, c in zip(self.weights[:, k], cols)
                    ] + [F.lit(float(self.bias[k]) + b)]
                    blocks.append(F.array(*terms))
                out = out.withColumn("contribs", F.array(*blocks))
            return out
        m = self.margin_expr(feature_cols)
        if name in ("binary:logistic", "reg:logistic"):
            pred = F.lit(1.0) / (F.lit(1.0) + F.exp(-m))
        elif name in ("count:poisson", "reg:gamma", "reg:tweedie", "survival:aft"):
            pred = F.exp(m)
        else:
            pred = m
        out = df.withColumn("prediction", pred)
        if output_margin:
            out = out.withColumn("margin", m)
        if pred_contribs:
            cols = feature_cols or self.feature_names
            terms = [
                (F.lit(float(w)) * F.coalesce(F.col(c).cast("double"), F.lit(0.0)))
                for w, c in zip(self.weights, cols)
            ] + [F.lit(float(self.bias + self.base_score))]
            out = out.withColumn("contribs", F.array(*terms))
        return out

    def to_json(self) -> str:
        from xgboost_spark.functions.objectives import margin_to_prob
        if self.n_groups > 1:
            # reference interleaved layout: w[fid*K + gid], bias block
            # last (gblinear_model.h:49-62)
            wb = [float(v) for row in self.weights for v in row] \
                + [float(v) for v in self.bias]
        else:
            wb = self.weights.tolist() + [self.bias]
        # learner_model_param.base_score uses the reference's OUTPUT-
        # space convention (learner.cc ProbToMargin on load) so a
        # genuine reference build loads this save with the right
        # intercept; the exact margin-space value rides in the engine
        # extension block (read back first on load).  Multi-group
        # intercepts are identity-link (like GBDTModel multiclass).
        bs_vec = getattr(self, "base_score_vec", None)
        if bs_vec is not None:
            bs_out = "[" + ",".join(str(float(v)) for v in bs_vec) + "]"
        else:
            bs_out = str(margin_to_prob(self.params.objective,
                                        self.base_score)
                         if self.n_groups == 1 else self.base_score)
        return json.dumps({
            # reference saves carry a top-level version (learner.cc
            # Version::Save); also the legacy-save discriminator — see
            # from_json
            "version": [0, 1, 0],
            "learner": {
                "gradient_booster": {
                    "name": "gblinear",
                    "model": {"weights": wb},
                },
                "objective": {"name": self.params.objective},
                "feature_names": self.feature_names,
                "learner_model_param": {
                    "base_score": bs_out,
                    "num_feature": str(len(self.feature_names)),
                    "num_class": str(self.params.num_class),
                },
            },
            # engine extension: exact margin-space intercept (the
            # learner_model_param value above is OUTPUT space)
            "xgboost_spark": {
                "base_score_margin": float(self.base_score),
                "base_score_margin_vec": (
                    [float(v) for v in self.base_score_vec]
                    if getattr(self, "base_score_vec", None) is not None
                    else None),
            },
        })

    @classmethod
    def from_json(cls, s: str) -> "LinearModel":
        """Load engine saves AND genuine reference gblinear JSON
        (`src/gbm/gblinear_model.cc:10-42`): weights are the flat
        ``(num_feature + 1) * num_output_group`` array with the bias
        block last (`gblinear_model.h:49-55`; multi-group docs
        interleave by group, ``w[fid*K + gid]``); ``base_score`` may be
        the reference's "[5E-1]" array-string in OUTPUT space and
        ``feature_names`` may be absent (fall back to f{i})."""
        full = json.loads(s)
        doc = full["learner"]
        ext = full.get("xgboost_spark", {})
        lmp = doc["learner_model_param"]
        gb = doc["gradient_booster"]
        wb = [float(v) for v in gb["model"]["weights"]]
        objective = doc["objective"]["name"]
        num_class = int(lmp.get("num_class", 0) or 0)
        ngroup = max(num_class, 1)
        params = TrainParams.from_dict(
            {"objective": objective, "num_class": num_class})
        raw_bs = str(lmp["base_score"]).strip()
        bs_vals = ([float(x) for x in raw_bs.strip("[]").split(",") if x]
                   if raw_bs.startswith("[") else [float(raw_bs)])
        bs_vec = None
        if "base_score_margin" in ext:
            base_score = float(ext["base_score_margin"])
            if ext.get("base_score_margin_vec"):
                bs_vec = np.asarray(ext["base_score_margin_vec"],
                                    dtype=np.float64)
        elif ngroup > 1:
            # multiclass intercepts are identity-link (like GBDTModel)
            base_score = bs_vals[0]
            if len(bs_vals) > 1:
                bs_vec = np.asarray(bs_vals, dtype=np.float64)
        elif "version" not in full:
            # legacy engine save (pre-round-11 format): no extension
            # block AND no top-level version key — genuine reference
            # docs always carry "version" (learner.cc Version::Save),
            # engine legacy saves never did.  Its base_score is already
            # MARGIN space; applying ProbToMargin here would e.g. turn
            # a saved 0.0 for binary:logistic into logit(eps) ~ -34.5
            base_score = bs_vals[0]
        else:
            from xgboost_spark.functions.objectives import prob_to_margin
            base_score = prob_to_margin(objective, bs_vals[0])
        nf = int(lmp.get("num_feature", 0) or (len(wb) // ngroup - 1))
        feature_names = list(doc.get("feature_names") or []) or [
            f"f{i}" for i in range(nf)]
        if ngroup > 1:
            # interleaved reference layout: w[fid*K + gid], bias block
            # at w[nf*K + gid] (gblinear_model.h:49-62)
            W = np.asarray(wb[:nf * ngroup],
                           dtype=np.float64).reshape(nf, ngroup)
            bias = np.asarray(wb[nf * ngroup:(nf + 1) * ngroup],
                              dtype=np.float64)
            m = cls(params, base_score, W, bias, feature_names)
        else:
            m = cls(params, base_score,
                    np.asarray(wb[:nf]), wb[nf], feature_names)
        m.base_score_vec = bs_vec
        return m

    def save(self, path: str):
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "LinearModel":
        with open(path) as f:
            return cls.from_json(f.read())


def _threshold_l1(g: float, alpha: float) -> float:
    if g > alpha:
        return g - alpha
    if g < -alpha:
        return g + alpha
    return 0.0


def train_linear(params: dict | TrainParams, df: DataFrame,
                 feature_cols: list[str] | None = None,
                 array_col: str | None = None, label_col: str = "label",
                 weight_col: str | None = None,
                 evals: list[tuple[DataFrame, str]] | None = None,
                 verbose: bool = False) -> LinearModel:
    p = params if isinstance(params, TrainParams) else TrainParams.from_dict(params)
    obj = get_objective(p.objective, p)
    raw, fnames = assemble_features(df, feature_cols=feature_cols, array_col=array_col,
                                    label_col=label_col, weight_col=weight_col)
    from xgboost_spark.plans.booster import validate_meta
    validate_meta(raw, obj, p.objective)
    raw = raw.localCheckpoint(eager=True)
    Fn = len(fnames)
    has_w = "weight" in raw.columns
    feat_names_out = feature_cols if (feature_cols and not array_col) else fnames

    if p.n_groups > 1:
        return _train_linear_multigroup(p, raw, fnames, feat_names_out,
                                        has_w, obj, evals, feature_cols,
                                        array_col, label_col, weight_col,
                                        verbose)

    # base score: distributed stump (same as the tree path)
    w_expr = F.col("weight") if has_w else F.lit(1.0)
    if p.base_score is not None:
        base_score = float(p.base_score)
    else:
        name = p.objective
        r = raw.agg((F.sum(F.col("label") * w_expr) / F.sum(w_expr)).alias("v")).first()
        mean = float(r["v"])
        if name in ("binary:logistic", "reg:logistic", "binary:logitraw"):
            mp = min(max(mean, 1e-7), 1 - 1e-7)
            base_score = float(np.log(mp / (1 - mp)))
        elif name in ("count:poisson", "reg:gamma", "reg:tweedie"):
            base_score = float(np.log(max(mean, 1e-16)))
        else:
            base_score = mean

    weights = np.zeros(Fn)
    bias = 0.0
    rng = np.random.default_rng(p.seed)
    history: dict[str, dict[str, list[float]]] = {}
    metric_names = p.eval_metric or [obj.default_metric()]
    sums_schema = ", ".join(
        ["G double", "H double"]
        + [f"gx{i} double, hx{i} double" for i in range(Fn)])

    for it in range(p.num_boost_round):
        bw = weights.copy()
        bb = bias + base_score

        if obj.needs_global_scale:
            # global residual scale for smooth-MM MAE / smoothed
            # quantile (reference GlobalSum before GetGradient): one
            # partial-sums pre-pass at the current round's margin
            def scale_fn(it_: Iterator[pd.DataFrame],
                         _bw=bw, _bb=bb) -> Iterator[pd.DataFrame]:
                acc = None
                for pdf in it_:
                    if len(pdf) == 0:
                        continue
                    X = np.column_stack([
                        np.nan_to_num(pdf[c].to_numpy(dtype=np.float64,
                                                      na_value=np.nan))
                        for c in fnames])
                    y = pdf["label"].to_numpy(dtype=np.float64)
                    w_ = (pdf["weight"].to_numpy(dtype=np.float64)
                          if has_w else None)
                    st = obj.scale_stats(y, _bb + X @ _bw, w_)
                    acc = st if acc is None else acc + st
                if acc is not None:
                    yield pd.DataFrame({f"s{i}": [acc[i]]
                                        for i in range(len(acc))})

            r_sc = (raw.mapInPandas(scale_fn, schema="s0 double, s1 double")
                    .agg(F.sum("s0").alias("s0"), F.sum("s1").alias("s1"))
                    .first())
            obj.set_scale(np.array([float(r_sc["s0"] or 0.0),
                                    float(r_sc["s1"] or 0.0)]))

        def sums_fn(it_: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            G = H = 0.0
            gx = np.zeros(Fn)
            hx = np.zeros(Fn)
            for pdf in it_:
                if len(pdf) == 0:
                    continue
                X = np.column_stack([
                    np.nan_to_num(pdf[c].to_numpy(dtype=np.float64, na_value=np.nan))
                    for c in fnames])
                y = pdf["label"].to_numpy(dtype=np.float64)
                w_ = pdf["weight"].to_numpy(dtype=np.float64) if has_w else None
                m = bb + X @ bw
                g, h = obj.grad_hess(y, m, w_)
                G += g.sum()
                H += h.sum()
                gx += g @ X
                hx += h @ (X * X)
            yield pd.DataFrame({
                "G": [G], "H": [H],
                **{f"gx{i}": [gx[i]] for i in range(Fn)},
                **{f"hx{i}": [hx[i]] for i in range(Fn)},
            })

        agg_cols = [F.sum(c).alias(c) for c in
                    ["G", "H"] + [f"gx{i}" for i in range(Fn)] + [f"hx{i}" for i in range(Fn)]]
        r = raw.mapInPandas(sums_fn, schema=sums_schema).agg(*agg_cols).first()

        # shotgun update: every feature from the same gradient snapshot
        # (reference updater_shotgun.cc); selector affects which features
        # move this round
        order = np.arange(Fn)
        if p.feature_selector == "shuffle":
            rng.shuffle(order)
        elif p.feature_selector == "random":
            order = rng.choice(Fn, size=max(1, Fn // 2), replace=False)
        elif p.feature_selector in ("greedy", "thrifty"):
            # reference greedy/thrifty selectors (src/linear/param.h,
            # coord_descent updater): rank features by the magnitude of
            # their univariate Newton step from this round's gradient
            # snapshot, update the top_k largest first (top_k=0 => all)
            mag = np.empty(Fn)
            for i in range(Fn):
                gi = float(r[f"gx{i}"]) + p.reg_lambda * weights[i]
                hi = float(r[f"hx{i}"]) + p.reg_lambda
                mag[i] = abs(_threshold_l1(gi, p.reg_alpha)) / max(hi, 1e-16)
            order = np.argsort(-mag)
            if p.top_k > 0:
                order = order[:p.top_k]
        for f in order:
            gf = float(r[f"gx{f}"]) + p.reg_lambda * weights[f]
            hf = float(r[f"hx{f}"]) + p.reg_lambda
            if hf <= 0:
                continue
            dw = -_threshold_l1(gf, p.reg_alpha) / hf
            weights[f] += p.eta * dw
        if float(r["H"]) > 0:
            bias += p.eta * (-float(r["G"]) / float(r["H"]))

        if evals:
            model = LinearModel(p, base_score, weights, bias, feat_names_out)
            for ev_df, ev_name in evals:
                ev_raw, _ = assemble_features(
                    ev_df, feature_cols=feature_cols, array_col=array_col,
                    label_col=label_col, weight_col=weight_col)
                scored = model.transform(
                    ev_raw, feature_cols=fnames, output_margin=True
                ).select(F.col("label").alias("y"), F.col("margin").alias("m0"),
                         w_expr.alias("w"))
                for mname in metric_names:
                    val = metrics_mod.compute_metric(scored, mname, y="y",
                                                     margin_cols=["m0"], weight="w")
                    history.setdefault(ev_name, {}).setdefault(mname, []).append(val)
                    if verbose:
                        print(f"[{it}] {ev_name}-{mname}: {val:.6f}")

    return LinearModel(p, base_score, weights, bias, feat_names_out,
                       eval_history=history)


def _train_linear_multigroup(p: TrainParams, raw: DataFrame,
                             fnames: list[str], feat_names_out: list[str],
                             has_w: bool, obj, evals, feature_cols,
                             array_col, label_col, weight_col,
                             verbose: bool) -> LinearModel:
    """gblinear training with ``num_output_group > 1`` (reference
    `src/gbm/gblinear.cc` DoBoost: one coordinate pass PER GROUP over
    the shared gradient snapshot; weights live in the interleaved
    ``(F+1) x K`` layout, `gblinear_model.h:40-62`).

    Spark shape mirrors the scalar path: per boosting round ONE
    mapInPandas job emits per-partition partial sums — per-group
    (G_k, H_k) plus per-(feature, group) (sum g_k x_f, sum h_k x_f^2) —
    aggregated JVM-side; the driver applies the shotgun update to every
    group's coordinates from that single snapshot.  The multiclass
    intercept is identity-link 0.5 (reference multiclass default base
    score), like the tree path."""
    Fn = len(fnames)
    K = p.n_groups
    base_score = float(p.base_score) if p.base_score is not None else 0.5
    W = np.zeros((Fn, K))
    bias = np.zeros(K)
    rng = np.random.default_rng(p.seed)
    history: dict[str, dict[str, list[float]]] = {}
    metric_names = p.eval_metric or [obj.default_metric()]
    w_expr = F.col("weight") if has_w else F.lit(1.0)
    cols = (["G%d" % k for k in range(K)] + ["H%d" % k for k in range(K)]
            + ["gx%d_%d" % (i, k) for i in range(Fn) for k in range(K)]
            + ["hx%d_%d" % (i, k) for i in range(Fn) for k in range(K)])
    sums_schema = ", ".join(f"{c} double" for c in cols)

    for it in range(p.num_boost_round):
        bw = W.copy()
        bb = bias + base_score                       # (K,)

        if obj.needs_global_scale:
            def scale_fn(it_: "Iterator[pd.DataFrame]",
                         _bw=bw, _bb=bb) -> "Iterator[pd.DataFrame]":
                acc = None
                for pdf in it_:
                    if len(pdf) == 0:
                        continue
                    X = np.column_stack([
                        np.nan_to_num(pdf[c].to_numpy(dtype=np.float64,
                                                      na_value=np.nan))
                        for c in fnames])
                    y = pdf["label"].to_numpy(dtype=np.float64)
                    w_ = (pdf["weight"].to_numpy(dtype=np.float64)
                          if has_w else None)
                    st = obj.scale_stats(y, _bb[None, :] + X @ _bw, w_)
                    acc = st if acc is None else acc + st
                if acc is not None:
                    yield pd.DataFrame({f"s{i}": [acc[i]]
                                        for i in range(len(acc))})

            _n_st = K + 1
            _sc_schema = ", ".join(f"s{i} double" for i in range(_n_st))
            r_sc = (raw.mapInPandas(scale_fn, schema=_sc_schema)
                    .agg(*[F.sum(f"s{i}").alias(f"s{i}")
                           for i in range(_n_st)]).first())
            obj.set_scale(np.array([float(r_sc[f"s{i}"] or 0.0)
                                    for i in range(_n_st)]))

        def sums_fn(it_: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
            G = np.zeros(K)
            H = np.zeros(K)
            gx = np.zeros((Fn, K))
            hx = np.zeros((Fn, K))
            for pdf in it_:
                if len(pdf) == 0:
                    continue
                X = np.column_stack([
                    np.nan_to_num(pdf[c].to_numpy(dtype=np.float64,
                                                  na_value=np.nan))
                    for c in fnames])
                y = pdf["label"].to_numpy(dtype=np.float64)
                w_ = (pdf["weight"].to_numpy(dtype=np.float64)
                      if has_w else None)
                M = bb[None, :] + X @ bw             # (n, K)
                g, h = obj.grad_hess(y, M, w_)       # (n, K)
                G += g.sum(axis=0)
                H += h.sum(axis=0)
                gx += X.T @ g
                hx += (X * X).T @ h
            out = {f"G{k}": [G[k]] for k in range(K)}
            out.update({f"H{k}": [H[k]] for k in range(K)})
            out.update({f"gx{i}_{k}": [gx[i, k]]
                        for i in range(Fn) for k in range(K)})
            out.update({f"hx{i}_{k}": [hx[i, k]]
                        for i in range(Fn) for k in range(K)})
            yield pd.DataFrame(out)

        r = (raw.mapInPandas(sums_fn, schema=sums_schema)
             .agg(*[F.sum(c).alias(c) for c in cols]).first())

        # per-group shotgun pass from the shared snapshot (gblinear.cc
        # DoBoost loops gid; updater runs its selector per group)
        for k in range(K):
            order = np.arange(Fn)
            if p.feature_selector == "shuffle":
                rng.shuffle(order)
            elif p.feature_selector == "random":
                order = rng.choice(Fn, size=max(1, Fn // 2), replace=False)
            elif p.feature_selector in ("greedy", "thrifty"):
                mag = np.empty(Fn)
                for i in range(Fn):
                    gi = float(r[f"gx{i}_{k}"]) + p.reg_lambda * W[i, k]
                    hi = float(r[f"hx{i}_{k}"]) + p.reg_lambda
                    mag[i] = abs(_threshold_l1(gi, p.reg_alpha)) / max(hi, 1e-16)
                order = np.argsort(-mag)
                if p.top_k > 0:
                    order = order[:p.top_k]
            for f in order:
                gf = float(r[f"gx{f}_{k}"]) + p.reg_lambda * W[f, k]
                hf = float(r[f"hx{f}_{k}"]) + p.reg_lambda
                if hf <= 0:
                    continue
                W[f, k] += p.eta * (-_threshold_l1(gf, p.reg_alpha) / hf)
            Hk = float(r[f"H{k}"])
            if Hk > 0:
                bias[k] += p.eta * (-float(r[f"G{k}"]) / Hk)

        if evals:
            model = LinearModel(p, base_score, W.copy(), bias.copy(),
                                feat_names_out)
            for ev_df, ev_name in evals:
                ev_raw, _ = assemble_features(
                    ev_df, feature_cols=feature_cols, array_col=array_col,
                    label_col=label_col, weight_col=weight_col)
                scored = model.transform(
                    ev_raw, feature_cols=fnames, output_margin=True)
                mcols = [f"m{k}" for k in range(K)]
                scored = scored.select(
                    F.col("label").alias("y"), w_expr.alias("w"),
                    *[F.col("margin").getItem(k).alias(mcols[k])
                      for k in range(K)])
                for mname in metric_names:
                    val = metrics_mod.compute_metric(
                        scored, mname, y="y", margin_cols=mcols, weight="w")
                    history.setdefault(ev_name, {}).setdefault(
                        mname, []).append(val)
                    if verbose:
                        print(f"[{it}] {ev_name}-{mname}: {val:.6f}")

    return LinearModel(p, base_score, W, bias, feat_names_out,
                       eval_history=history)
