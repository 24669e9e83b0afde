"""gblinear: regularized linear booster.

Re-expresses the reference's linear updaters (coordinate descent
`src/linear/updater_coordinate.cc:24-100`, parallel lock-free shotgun
`src/linear/updater_shotgun.cc:96`, elastic-net soft threshold
`CoordinateDelta`) for Spark's execution model:

- per boosting round ONE Spark job computes the round's sufficient
  statistics as per-partition partials: bias sums (G, H), per-feature
  gradient sums gx = X^T g and hx = X^T h, and — on the exact path
  (F <= 256) — the cross-product matrix M = X^T diag(h) X;
- the driver then replays the reference's SEQUENTIAL round exactly
  (single-thread shotgun / coord_descent semantics): the bias updates
  first and propagates into every feature's gradient sum, and each
  coordinate evaluates CoordinateDelta at the residuals left by the
  coordinates before it — hessians are fixed within a round, so the
  in-round residual updates are linear in M and the whole pass is a
  deterministic driver-side computation (no extra Spark jobs).
  Penalties are DENORMALIZED by the sum of instance weights and the
  linear booster has its own defaults (eta 0.5, lambda 0, alpha 0 —
  src/linear/param.h), both reference semantics.  Past 256 features a
  one-snapshot (Jacobi) pass with the same per-coordinate math stands
  in — at that width the reference's own lock-free shotgun races make
  sequential bit-parity moot;
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
                  pred_contribs: bool = False,
                  pred_interactions: bool = False,
                  pred_leaf: bool = False,
                  iteration_range: tuple[int, int] | None = None) -> DataFrame:
        """``pred_contribs``: per-feature contribution array (w_f * x_f,
        bias+intercept last) — the reference's gblinear contribution
        semantics (`src/gbm/gblinear.cc:153-194` PredictContribution:
        linear terms are exact Shapley values).  Pure expressions.

        ``pred_interactions``: the reference's gblinear
        PredictInteractionContributions (`src/gbm/gblinear.cc:192-204`)
        — "linear models have no interaction effects" — fills
        rows x n_groups x F x F with ZEROS; exposed for API parity as
        an ``interactions`` column (flat F*F zero array per row; K > 1
        emits K such blocks, mirroring ``contribs``).

        ``iteration_range``: gblinear has no layers — a non-zero begin
        is an error (`gblinear.cc:48-49` LinearCheckLayer; the end is
        ignored, matching the reference's unused layer_end) and
        ``pred_leaf`` is unsupported (`gblinear.cc:149-152`)."""
        if pred_leaf:
            raise ValueError(
                "gblinear does not support prediction of leaf index")
        if iteration_range is not None and iteration_range[0] != 0:
            raise ValueError(
                "Linear booster does not support prediction range.")
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
            if pred_interactions:
                Fn = len(feature_cols or self.feature_names)
                zeros = F.array_repeat(F.lit(0.0), Fn * Fn)
                out = out.withColumn(
                    "interactions",
                    F.array(*[zeros for _ in range(self.n_groups)]))
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
        if pred_interactions:
            Fn = len(feature_cols or self.feature_names)
            out = out.withColumn("interactions",
                                 F.array_repeat(F.lit(0.0), Fn * Fn))
        return out

    def get_score(self, importance_type: str = "weight"):
        """Feature importance (reference `src/gbm/gblinear.cc:206-231`
        FeatureScore): gblinear defines ONLY ``weight`` — the raw
        coefficient per feature (per group when K > 1), bias excluded.
        Any other importance_type raises, mirroring the reference's
        CHECK_EQ."""
        if importance_type != "weight":
            raise ValueError(
                "gblinear only has `weight` defined for feature "
                "importance")
        if self.n_groups == 1:
            return {c: float(w) for c, w in zip(self.feature_names,
                                                self.weights)}
        return {c: [float(v) for v in self.weights[i]]
                for i, c in enumerate(self.feature_names)}

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


# reference LinearTrainParam defaults (src/linear/param.h:30-56) —
# SEPARATE from the tree params that share the user-facing names:
# gblinear's eta defaults to 0.5 and its L1/L2 penalties to 0
_LIN_ETA, _LIN_LAMBDA, _LIN_ALPHA = 0.5, 0.0, 0.0
# above this feature count the exact sequential replay's X^T diag(h) X
# cross-product payload (F^2 doubles per partition) stops being cheap;
# fall back to the one-snapshot (Jacobi) pass — at that width the
# reference's own lock-free shotgun races make bit-parity moot anyway
_EXACT_SEQ_MAX_F = 256


def _linear_hyper(p) -> tuple[float, float, float]:
    """(eta, reg_lambda, reg_alpha) for the LINEAR booster: the user's
    explicit values when set, else the reference's gblinear defaults."""
    ek = getattr(p, "explicit_keys", frozenset()) or frozenset()
    eta = p.eta if "eta" in ek else _LIN_ETA
    lam = p.reg_lambda if "reg_lambda" in ek else _LIN_LAMBDA
    alpha = p.reg_alpha if "reg_alpha" in ek else _LIN_ALPHA
    return float(eta), float(lam), float(alpha)


def _coordinate_delta(sum_grad: float, sum_hess: float, w: float,
                      alpha: float, lam: float) -> float:
    """Exact port of the reference's elastic-net coordinate update
    (CoordinateDelta, src/linear/coordinate_common.h:44-56): the L1
    term applies on the side of the CURRENT weight's unregularized
    target, and the step clamps at the zero crossing (a coordinate
    never flips sign in one update); zero when the RAW hessian sum is
    below 1e-5."""
    if sum_hess < 1e-5:
        return 0.0
    sum_grad_l2 = sum_grad + lam * w
    sum_hess_l2 = sum_hess + lam
    tmp = w - sum_grad_l2 / sum_hess_l2
    if tmp >= 0:
        return max(-(sum_grad_l2 + alpha) / sum_hess_l2, -w)
    return min(-(sum_grad_l2 - alpha) / sum_hess_l2, -w)


def _coordinate_delta_bias(sum_grad: float, sum_hess: float) -> float:
    """CoordinateDeltaBias (coordinate_common.h:65-71): -G/H with
    nan/inf guarded to 0."""
    if sum_hess == 0.0:
        return 0.0
    b = -sum_grad / sum_hess
    return 0.0 if (np.isnan(b) or np.isinf(b)) else b


def _replay_linear_round(weights_k: np.ndarray, bias_k: float,
                         G: float, H: float, gx: np.ndarray,
                         hx: np.ndarray, M: np.ndarray, eta: float,
                         lam_d: float, alpha_d: float, selector: str,
                         rng: np.random.Generator, top_k: int) -> float:
    """Driver-side EXACT replay of one reference gblinear round for one
    output group (single-thread shotgun/coord_descent semantics,
    updater_shotgun.cc:33-86 / updater_coordinate.cc:48-90): bias
    updates FIRST and its step propagates into every feature's gradient
    sum; each coordinate's (sum_grad, sum_hess) is then evaluated at the
    CURRENT residuals — since the hessians are fixed within a round, the
    residual updates are linear and the whole sequential pass is a
    deterministic function of the aggregated sufficient statistics
    (gx = X^T g, hx = X^T h, M = X^T diag(h) X).  Mutates ``weights_k``
    in place; returns the updated bias."""
    Fn = len(weights_k)
    dbias = eta * _coordinate_delta_bias(G, H)
    bias_k += dbias
    gxc = gx + dbias * hx          # UpdateBiasResidualParallel

    def apply(f: int) -> None:
        dw = eta * _coordinate_delta(gxc[f], M[f, f], weights_k[f],
                                     alpha_d, lam_d)
        if dw == 0.0:
            return
        weights_k[f] += dw
        gxc[...] = gxc + dw * M[f]  # UpdateResidualParallel

    if selector in ("cyclic", "shuffle", "random"):
        if selector == "cyclic":
            seq = range(Fn)
        elif selector == "shuffle":
            seq = rng.permutation(Fn)
        else:                       # random: F draws WITH replacement
            seq = rng.integers(0, Fn, size=Fn)
        for f in seq:
            apply(int(f))
        return bias_k
    # greedy/thrifty: the reference's counter stops after top_k picks
    # or num_feature - 1 picks (coordinate_common.h:343-345 increments
    # then compares, so the F-th call returns -1) — a genuine quirk
    limit = min(top_k if top_k > 0 else Fn, max(Fn - 1, 1))
    if selector == "thrifty":
        d0 = np.array([abs(_coordinate_delta(gxc[f], M[f, f],
                                             weights_k[f], alpha_d, lam_d))
                       for f in range(Fn)])
        seq = np.argsort(-d0, kind="stable")[:limit]
        for f in seq:
            apply(int(f))
        return bias_k
    if selector == "greedy":
        for _ in range(limit):
            deltas = np.array([abs(_coordinate_delta(
                gxc[f], M[f, f], weights_k[f], alpha_d, lam_d))
                for f in range(Fn)])
            best = int(np.argmax(deltas))   # strict >: lowest index wins
            if deltas[best] == 0.0:
                apply(best)     # no-op, mirrors the reference's pick
                continue
            apply(best)
        return bias_k
    raise ValueError(f"unknown feature_selector {selector!r}")


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
    eta_l, lam_l, alpha_l = _linear_hyper(p)
    # DenormalizePenalties (param.h:59-62): penalties scale by the sum
    # of instance weights (row count when unweighted), recomputed by the
    # reference every Update from the constant training set
    w_expr0 = F.col("weight") if has_w else F.lit(1.0)
    sum_iw = float(raw.agg(F.sum(w_expr0)).first()[0] or 0.0)
    lam_d, alpha_d = lam_l * sum_iw, alpha_l * sum_iw
    exact_seq = Fn <= _EXACT_SEQ_MAX_F
    arr_schema = ("G double, H double, gx array<double>, "
                  "hx array<double>, M array<double>")
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

        if exact_seq:
            def sums_fn(it_: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                G = H = 0.0
                gx = np.zeros(Fn)
                hx = np.zeros(Fn)
                M = np.zeros((Fn, Fn))
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
                    m = bb + X @ bw
                    g, h = obj.grad_hess(y, m, w_)
                    G += g.sum()
                    H += h.sum()
                    gx += g @ X
                    hx += h @ X
                    M += (X * h[:, None]).T @ X
                yield pd.DataFrame({
                    "G": [G], "H": [H], "gx": [gx.tolist()],
                    "hx": [hx.tolist()], "M": [M.reshape(-1).tolist()]})

            parts = raw.mapInPandas(sums_fn, schema=arr_schema).toPandas()
            G = float(parts["G"].sum())
            H = float(parts["H"].sum())
            gx = np.sum(np.stack(parts["gx"].map(np.asarray)), axis=0)
            hx = np.sum(np.stack(parts["hx"].map(np.asarray)), axis=0)
            M = np.sum(np.stack(parts["M"].map(np.asarray)),
                       axis=0).reshape(Fn, Fn)
            bias = _replay_linear_round(
                weights, bias, G, H, gx, hx, M, eta_l, lam_d, alpha_d,
                p.feature_selector, rng, p.top_k)
        else:
            # wide-feature fallback: one frozen gradient snapshot per
            # round (Jacobi) with the same CoordinateDelta/bias-first
            # math but WITHOUT in-round residual propagation — the
            # F^2 cross-product payload stops being cheap past
            # _EXACT_SEQ_MAX_F, where the reference's own lock-free
            # shotgun races make exact sequential parity moot
            def sums_fn(it_: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                G = H = 0.0
                gx = np.zeros(Fn)
                hx = np.zeros(Fn)
                hx2 = np.zeros(Fn)
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
                    m = bb + X @ bw
                    g, h = obj.grad_hess(y, m, w_)
                    G += g.sum()
                    H += h.sum()
                    gx += g @ X
                    hx += h @ X
                    hx2 += h @ (X * X)
                yield pd.DataFrame({
                    "G": [G], "H": [H],
                    **{f"gx{i}": [gx[i]] for i in range(Fn)},
                    **{f"hx{i}": [hx2[i]] for i in range(Fn)},
                    "HB": [hx.tolist()]})

            r = (raw.mapInPandas(sums_fn, schema=sums_schema
                                 + ", HB array<double>").toPandas())
            G = float(r["G"].sum())
            H = float(r["H"].sum())
            gxv = np.array([float(r[f"gx{i}"].sum()) for i in range(Fn)])
            hx2v = np.array([float(r[f"hx{i}"].sum()) for i in range(Fn)])
            hbv = np.sum(np.stack(r["HB"].map(np.asarray)), axis=0)
            dbias = eta_l * _coordinate_delta_bias(G, H)
            bias += dbias
            gxv = gxv + dbias * hbv      # bias residual propagation
            order = np.arange(Fn)
            if p.feature_selector == "shuffle":
                rng.shuffle(order)
            elif p.feature_selector == "random":
                order = rng.integers(0, Fn, size=Fn)
            elif p.feature_selector in ("greedy", "thrifty"):
                mag = np.array([abs(_coordinate_delta(
                    gxv[i], hx2v[i], weights[i], alpha_d, lam_d))
                    for i in range(Fn)])
                order = np.argsort(-mag, kind="stable")
                limit = min(p.top_k if p.top_k > 0 else Fn,
                            max(Fn - 1, 1))
                order = order[:limit]
            for f in order:
                weights[f] += eta_l * _coordinate_delta(
                    gxv[f], hx2v[f], weights[f], alpha_d, lam_d)

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
    score), like the tree path.

    Past ``_EXACT_SEQ_MAX_F`` features the K*F^2 cross-product payload
    of the exact sequential replay stops being cheap, so — exactly like
    the scalar path — a one-snapshot (Jacobi) pass with the same
    bias-first CoordinateDelta math stands in: per group the bias step
    propagates into the gradient sums (dbias * sum h_k x_f) and every
    coordinate evaluates against the FROZEN snapshot.  At that width
    the reference's own lock-free shotgun races make sequential
    bit-parity moot; the payload drops to 3*K*F doubles."""
    Fn = len(fnames)
    K = p.n_groups
    exact_seq = Fn <= _EXACT_SEQ_MAX_F
    base_score = float(p.base_score) if p.base_score is not None else 0.5
    W = np.zeros((Fn, K))
    bias = np.zeros(K)
    rng = np.random.default_rng(p.seed)
    history: dict[str, dict[str, list[float]]] = {}
    metric_names = p.eval_metric or [obj.default_metric()]
    w_expr = F.col("weight") if has_w else F.lit(1.0)
    eta_l, lam_l, alpha_l = _linear_hyper(p)
    sum_iw = float(raw.agg(F.sum(w_expr)).first()[0] or 0.0)
    lam_d, alpha_d = lam_l * sum_iw, alpha_l * sum_iw
    arr_schema = ("G array<double>, H array<double>, gx array<double>, "
                  "hx array<double>, M array<double>")
    wide_schema = ("G array<double>, H array<double>, gx array<double>, "
                   "hx2 array<double>, HB array<double>")

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

        if exact_seq:
            def sums_fn(it_: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
                G = np.zeros(K)
                H = np.zeros(K)
                gx = np.zeros((K, Fn))
                hx = np.zeros((K, Fn))
                Mk = np.zeros((K, Fn, Fn))
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
                    gx += (X.T @ g).T
                    hx += (X.T @ h).T
                    for k in range(K):
                        Mk[k] += (X * h[:, k][:, None]).T @ X
                yield pd.DataFrame({
                    "G": [G.tolist()], "H": [H.tolist()],
                    "gx": [gx.reshape(-1).tolist()],
                    "hx": [hx.reshape(-1).tolist()],
                    "M": [Mk.reshape(-1).tolist()]})

            parts = raw.mapInPandas(sums_fn, schema=arr_schema).toPandas()
            Gv = np.sum(np.stack(parts["G"].map(np.asarray)), axis=0)
            Hv = np.sum(np.stack(parts["H"].map(np.asarray)), axis=0)
            gxv = np.sum(np.stack(parts["gx"].map(np.asarray)),
                         axis=0).reshape(K, Fn)
            hxv = np.sum(np.stack(parts["hx"].map(np.asarray)),
                         axis=0).reshape(K, Fn)
            Mv = np.sum(np.stack(parts["M"].map(np.asarray)),
                        axis=0).reshape(K, Fn, Fn)

            # per-group exact sequential replay (gblinear.cc DoBoost
            # loops gid; updater runs bias-first + residual-updated
            # coordinates)
            for k in range(K):
                wk = W[:, k].copy()
                bias[k] = _replay_linear_round(
                    wk, float(bias[k]), float(Gv[k]), float(Hv[k]),
                    gxv[k], hxv[k], Mv[k], eta_l, lam_d, alpha_d,
                    p.feature_selector, rng, p.top_k)
                W[:, k] = wk
        else:
            # wide-feature (F > _EXACT_SEQ_MAX_F) fallback — the scalar
            # path's one-snapshot Jacobi pass, per group: same
            # CoordinateDelta/bias-first math, NO in-round residual
            # propagation; payload 3*K*F doubles instead of K*F^2
            def sums_fn(it_: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
                G = np.zeros(K)
                H = np.zeros(K)
                gx = np.zeros((K, Fn))
                hx2 = np.zeros((K, Fn))
                hb = np.zeros((K, Fn))
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
                    gx += (X.T @ g).T
                    hx2 += ((X * X).T @ h).T
                    hb += (X.T @ h).T
                yield pd.DataFrame({
                    "G": [G.tolist()], "H": [H.tolist()],
                    "gx": [gx.reshape(-1).tolist()],
                    "hx2": [hx2.reshape(-1).tolist()],
                    "HB": [hb.reshape(-1).tolist()]})

            parts = raw.mapInPandas(sums_fn, schema=wide_schema).toPandas()
            Gv = np.sum(np.stack(parts["G"].map(np.asarray)), axis=0)
            Hv = np.sum(np.stack(parts["H"].map(np.asarray)), axis=0)
            gxv = np.sum(np.stack(parts["gx"].map(np.asarray)),
                         axis=0).reshape(K, Fn)
            hx2v = np.sum(np.stack(parts["hx2"].map(np.asarray)),
                          axis=0).reshape(K, Fn)
            hbv = np.sum(np.stack(parts["HB"].map(np.asarray)),
                         axis=0).reshape(K, Fn)
            for k in range(K):
                dbias = eta_l * _coordinate_delta_bias(
                    float(Gv[k]), float(Hv[k]))
                bias[k] += dbias
                gxk = gxv[k] + dbias * hbv[k]   # bias residual propagation
                order = np.arange(Fn)
                if p.feature_selector == "shuffle":
                    order = rng.permutation(Fn)
                elif p.feature_selector == "random":
                    order = rng.integers(0, Fn, size=Fn)
                elif p.feature_selector in ("greedy", "thrifty"):
                    mag = np.array([abs(_coordinate_delta(
                        gxk[i], hx2v[k, i], W[i, k], alpha_d, lam_d))
                        for i in range(Fn)])
                    order = np.argsort(-mag, kind="stable")
                    limit = min(p.top_k if p.top_k > 0 else Fn,
                                max(Fn - 1, 1))
                    order = order[:limit]
                for f in order:
                    W[f, k] += eta_l * _coordinate_delta(
                        gxk[f], hx2v[k, f], W[f, k], alpha_d, lam_d)

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
