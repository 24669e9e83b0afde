"""Objective (gradient) functions.

Each objective maps ``(labels, margin, weight) -> (grad, hess)`` rowwise,
mirroring the reference's objective registry (interface
`include/xgboost/objective.h:27,50`; kernels under `src/objective/`).
They are embarrassingly parallel, so on Spark they run either as column
expressions or inside Arrow-batched NumPy kernels (both stay vectorized).

The NumPy forms here are shared by the distributed trainer (inside
``mapInPandas``) and the local baseline booster — one implementation,
two execution contexts.

Gradient conventions follow the reference:
- grad = d(loss)/d(margin), hess = d2(loss)/d(margin)^2
- instance weights multiply both (reference regression_loss.h).
"""

from __future__ import annotations

import numpy as np

_EPS = 1e-16
_RT_EPS_F = 1e-6   # reference kRtEps (include/xgboost/base.h:309)


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


class Objective:
    """Base: scalar-output, rowwise objective."""

    name: str = ""
    # custom-objective hook: leaves refreshed to a residual quantile
    # after growth (the classic "adaptive tree" pattern; NO built-in
    # reference objective uses it — this reference has no UpdateTreeLeaf)
    adaptive_alpha: float | None = None
    # reg:absoluteerror / reg:quantileerror: gradients need a per-
    # iteration GLOBAL residual scale (scale_stats/set_scale protocol)
    needs_global_scale: bool = False
    needs_qid: bool = False
    # survival:aft — gradient is a function of (label_lower, label_upper)
    needs_bounds: bool = False
    # survival:cox — gradient needs risk-set sums over globally
    # label-sorted data (reference requires sorted labels, data.h:151)
    needs_global_sort: bool = False
    # valid label interval (lo, hi, lo_exclusive) — the reference's
    # per-objective CheckLabel (e.g. regression_loss.h "label must be in
    # [0,1] for logistic regression", gamma "label must be positive")
    label_range: tuple[float, float, bool] | None = None
    # ObjInfo.const_hess (reference task.h:33): True only for
    # reg:squarederror.  The approx updater's GHistIndexMatrix regen
    # flag is !const_hess (updater_approx.cc:47-52 BatchSpec), so a
    # const-hess objective sketches ONCE — with the FIRST round's
    # (sampled) hessians as weights — and reuses those cuts for every
    # later round; all other objectives re-sketch per round.
    const_hess: bool = False

    def grad_hess(self, y: np.ndarray, margin: np.ndarray, w: np.ndarray | None):
        raise NotImplementedError

    def scale_stats(self, y: np.ndarray, margin: np.ndarray,
                    w: np.ndarray | None) -> np.ndarray | None:
        """Partial SUMS of the per-iteration GLOBAL statistics this
        objective needs before gradients can be computed (reference
        MeanAbsoluteError / QuantileRegression recompute an automatic
        residual scale with a collective GlobalSum each boosting
        iteration, regression_obj.cu:642-660 / quantile_obj.cu:123-152).
        Trainers allreduce/aggregate the vector across workers and
        install it with :meth:`set_scale`; ``None`` = no global state
        needed (the default, and the fast path)."""
        return None

    def set_scale(self, stats: np.ndarray | None) -> None:
        """Install globally-summed :meth:`scale_stats` (or ``None`` to
        clear).  While installed, :meth:`grad_hess` uses it instead of
        recomputing from its own (possibly partial) input — that is what
        keeps per-partition gradient kernels globally correct."""
        pass

    def base_score(self, y: np.ndarray, w: np.ndarray | None) -> float:
        """Initial intercept — the reference's FitIntercept estimation
        (init_estimation.cc:8-27): one unregularized Newton stump from
        the gradients at margin 0 (-G / max(H, kRtEps),
        fit_stump.h:27)."""
        g, h = self.grad_hess(y, np.zeros_like(y, dtype=np.float64), w)
        return float(-g.sum() / max(h.sum(), _RT_EPS_F))

    def pred_transform(self, margin: np.ndarray) -> np.ndarray:
        return margin

    def default_metric(self) -> str:
        return "rmse"


class SquaredError(Objective):
    """reg:squarederror (reference src/objective/regression_loss.h:31)."""

    name = "reg:squarederror"
    const_hess = True    # regression_loss.h:32 ObjInfo{kRegression, true}

    def grad_hess(self, y, margin, w):
        g = margin - y
        h = np.ones_like(y, dtype=np.float64)
        if w is not None:
            g, h = g * w, h * w
        return g, h


class SquaredLogError(Objective):
    """reg:squaredlogerror (regression_loss.h:58). Requires y > -1."""

    name = "reg:squaredlogerror"
    label_range = (-1.0, float("inf"), True)

    def grad_hess(self, y, margin, w):
        p = np.maximum(margin, -1 + 1e-6)
        r = np.log1p(p) - np.log1p(y)
        g = r / (p + 1)
        h = np.maximum((1 - r) / (p + 1) ** 2, 1e-6)
        if w is not None:
            g, h = g * w, h * w
        return g, h

    def default_metric(self):
        return "rmsle"


class Logistic(Objective):
    """binary:logistic (regression_loss.h:91); margin = log-odds."""

    name = "binary:logistic"
    label_range = (0.0, 1.0, False)

    def __init__(self, scale_pos_weight: float = 1.0):
        self.scale_pos_weight = scale_pos_weight

    def grad_hess(self, y, margin, w):
        p = _sigmoid(margin)
        g = p - y
        h = np.maximum(p * (1 - p), _EPS)
        ww = np.ones_like(y) if w is None else w.astype(np.float64).copy()
        if self.scale_pos_weight != 1.0:
            ww = ww * np.where(y == 1, self.scale_pos_weight, 1.0)
        return g * ww, h * ww

    def base_score(self, y, w):
        # closed-form Newton at margin 0 matches the reference's one-step
        # estimate; use exact log-odds of the weighted mean for stability.
        ww = np.ones_like(y, dtype=np.float64) if w is None else w
        p = float(np.clip((y * ww).sum() / ww.sum(), 1e-7, 1 - 1e-7))
        return float(np.log(p / (1 - p)))

    def pred_transform(self, margin):
        return _sigmoid(margin)

    def default_metric(self):
        return "logloss"


class LogitRaw(Logistic):
    """binary:logitraw — logistic gradients, identity pred transform."""

    name = "binary:logitraw"

    def pred_transform(self, margin):
        return margin


class RegLogistic(Logistic):
    """reg:logistic — same kernel, regression framing."""

    name = "reg:logistic"

    def default_metric(self):
        return "rmse"


class Hinge(Objective):
    """binary:hinge (src/objective/hinge.cc:60); labels 0/1."""

    name = "binary:hinge"
    label_range = (0.0, 1.0, False)

    def grad_hess(self, y, margin, w):
        yy = 2.0 * y - 1.0
        active = yy * margin < 1.0
        g = np.where(active, -yy, 0.0)
        if w is not None:
            g = g * w
            hw = np.asarray(w, dtype=np.float64)
        else:
            hw = np.ones_like(yy)
        # inactive hessian is the UNWEIGHTED float32 minimum
        # (hinge.h:21 GradientPair{0, FLT_MIN}); the active hessian is
        # the row weight
        h = np.where(active, hw, float(np.finfo(np.float32).tiny))
        return g, h

    def base_score(self, y, w):
        # FitIntercept (hinge.cc:28): stump from gradients at margin 0,
        # then the objective's OWN PredTransform (init_estimation.cc:26)
        # — hinge's is the 0/1 indicator, so the intercept is 0.0 or 1.0
        # (ProbToMargin is identity, so that IS the serving margin)
        w0 = super().base_score(y, w)
        return 1.0 if w0 > 0 else 0.0

    def pred_transform(self, margin):
        return (margin > 0).astype(np.float64)

    def default_metric(self):
        return "error"


class PseudoHuber(Objective):
    """reg:pseudohubererror (src/objective/pseudohuber_obj.cc:74)."""

    name = "reg:pseudohubererror"

    def __init__(self, slope: float = 1.0):
        self.slope = slope

    def grad_hess(self, y, margin, w):
        z = margin - y
        d = self.slope
        scale = 1.0 + (z / d) ** 2
        root = np.sqrt(scale)
        g = z / root
        h = 1.0 / (scale * root)
        if w is not None:
            g, h = g * w, h * w
        return g, h

    # base_score: the FitIntercept stump (base class) — the reference's
    # PseudoHuberRegression inherits FitIntercept (pseudohuber_obj.cc:28)

    def default_metric(self):
        return "mphe"


class AbsoluteError(Objective):
    """reg:absoluteerror (regression_obj.cu:609-755 MeanAbsoluteError) —
    smooth MM (majorize-minimize) approximation to the mean absolute
    error.  NOT the sign-gradient/adaptive-leaf MAE of other gradient
    boosters: this reference has no UpdateTreeLeaf machinery at all.

    Each boosting iteration recomputes, per target, the automatic scale

        delta = (sum_i w_i * sqrt(|pred_i - y_i|) / sum_i w_i)^2

    (a GLOBAL weighted reduction — distributed trainers allreduce it via
    :meth:`scale_stats`/:meth:`set_scale`).  For residual r and
    norm = hypot(delta, r):

        curvature = delta / norm   (1.0 when norm == 0)
        grad = w * r * curvature,   hess = w * curvature

    which is the pseudo-Huber gradient r / sqrt(1 + (r/delta)^2) with
    the majorization curvature 1/q instead of the exact 1/q^3 —
    approaching the L1 gradient as the residual scale contracts
    (regression_obj.cu:610-620 doc comment, kernel :676-684).
    """

    name = "reg:absoluteerror"
    needs_global_scale = True

    def __init__(self):
        self._scale = None      # per-target delta installed by set_scale

    @staticmethod
    def _per_target_sqrt_sums(y, margin, w):
        y = y[:, None] if (margin.ndim == 2 and np.ndim(y) == 1) else y
        r = margin - y
        ww = np.ones(r.shape[0], dtype=np.float64) if w is None else w
        if r.ndim == 2:
            s = (ww[:, None] * np.sqrt(np.abs(r))).sum(axis=0)
        else:
            s = np.array([(ww * np.sqrt(np.abs(r))).sum()])
        return np.append(s, ww.sum())

    def scale_stats(self, y, margin, w):
        return self._per_target_sqrt_sums(y, margin, w)

    def set_scale(self, stats):
        if stats is None:
            self._scale = None
            return
        tot = float(stats[-1])
        s = np.asarray(stats[:-1], dtype=np.float64)
        # reference CloseTo(sum_weight, 0) guard (regression_obj.cu:665)
        self._scale = np.zeros_like(s) if tot <= _RT_EPS else (s / tot) ** 2

    def grad_hess(self, y, margin, w):
        y = y[:, None] if (margin.ndim == 2 and np.ndim(y) == 1) else y
        r = margin - y
        if self._scale is not None:
            delta = self._scale
        else:
            st = self._per_target_sqrt_sums(y, margin, w)
            tot = float(st[-1])
            delta = (np.zeros_like(st[:-1]) if tot <= _RT_EPS
                     else (st[:-1] / tot) ** 2)
        d = delta if r.ndim == 2 else float(delta[0])
        norm = np.hypot(d, r)
        curvature = np.where(norm > 0.0,
                             d / np.where(norm > 0.0, norm, 1.0), 1.0)
        g = r * curvature
        h = curvature
        if w is not None:
            ww = w[:, None] if r.ndim == 2 else w
            g, h = g * ww, h * ww
        return g, h

    def base_score(self, y, w):
        # reference InitEstimation (regression_obj.cu:686-739): label
        # mean + one unregularized FitStump step of the MM gradient
        # evaluated at that mean (-G / max(H, kRtEps), fit_stump.h:27)
        ww = np.ones_like(y, dtype=np.float64) if w is None else w
        mean = float((y * ww).sum() / ww.sum())
        m0 = np.full_like(np.asarray(y, dtype=np.float64), mean)
        save = self._scale
        self._scale = None          # estimation never uses a stale scale
        try:
            g, h = self.grad_hess(y, m0, w)
        finally:
            self._scale = save
        return mean + float(-g.sum() / max(h.sum(), _RT_EPS))

    def default_metric(self):
        return "mae"


class QuantileError(Objective):
    """reg:quantileerror (src/objective/quantile_obj.cu:42-298
    QuantileRegression) — automatically scaled LOGISTIC-SMOOTHED
    quantile score with MM curvature, NOT the raw pinball subgradient:

        S_j  = (sum_i w_i * sqrt(|r_ij|) / sum_i w_i)^2      (per alpha,
               recomputed each boosting iteration; GLOBAL reduction)
        x    = r / (c * S_j),                    c = 0.04
        grad = w * 0.5 * S_j * (tanh(x) + 1 - 2*alpha_j)
        hess = w * 0.5 / c * max(tanh(x)/x, 3e-4)   (tanh(x)/x -> 1 at 0)

    and (0, 0) when S_j is 0 or w is 0 (quantile_obj.cu:33-75 doc
    comment + :155-174 kernel; both constants are fixed internals).
    ``alpha`` may be a VECTOR (quantile_loss_utils.h QuantileLossParam):
    one model trains all alphas at once, one output group per alpha.
    PredTransform sorts each row's predictions ascending to prevent
    quantile crossing (quantile_obj.cu:177-198); InitEstimation is the
    per-alpha label quantile (interpolated R-6 unweighted, step-function
    weighted — common/stats.h:34-103).
    """

    name = "reg:quantileerror"
    needs_global_scale = True
    _C = 0.04               # kSmoothingScale (quantile_obj.cu:38)
    _MIN_RATIO = 3.0e-4     # kMinSurrogateRatio (quantile_obj.cu:39)

    def __init__(self, alpha=0.5):
        if isinstance(alpha, (tuple, list, np.ndarray)):
            self.alphas = tuple(float(a) for a in alpha)
        else:
            self.alphas = (float(alpha),)
        self.alpha = self.alphas[0]
        self._scale = None

    @staticmethod
    def _per_target_sqrt_sums(y, margin, w):
        r = (margin - y[:, None]) if margin.ndim == 2 else (margin - y)
        ww = np.ones(r.shape[0], dtype=np.float64) if w is None else w
        if r.ndim == 2:
            s = (ww[:, None] * np.sqrt(np.abs(r))).sum(axis=0)
        else:
            s = np.array([(ww * np.sqrt(np.abs(r))).sum()])
        return np.append(s, ww.sum())

    def scale_stats(self, y, margin, w):
        return self._per_target_sqrt_sums(y, margin, w)

    def set_scale(self, stats):
        if stats is None:
            self._scale = None
            return
        tot = float(stats[-1])
        s = np.asarray(stats[:-1], dtype=np.float64)
        self._scale = np.zeros_like(s) if tot <= _RT_EPS else (s / tot) ** 2

    def grad_hess(self, y, margin, w):
        two_d = margin.ndim == 2
        r = (margin - y[:, None]) if two_d else (margin - y)
        if self._scale is not None:
            S = self._scale
        else:
            st = self._per_target_sqrt_sums(y, margin, w)
            tot = float(st[-1])
            S = (np.zeros_like(st[:-1]) if tot <= _RT_EPS
                 else (st[:-1] / tot) ** 2)
        al = np.asarray(self.alphas, dtype=np.float64)
        if two_d:
            Sv, av = S[None, :], al[None, :]
        else:
            Sv, av = float(S[0]), float(al[0])
        pos = Sv > 0.0 if two_d else (np.full(r.shape, Sv > 0.0))
        x = r / np.where(Sv > 0.0, self._C * Sv, 1.0)
        tanh_x = np.tanh(x)
        ratio = np.where(x == 0.0, 1.0,
                         tanh_x / np.where(x == 0.0, 1.0, x))
        ratio = np.maximum(ratio, self._MIN_RATIO)
        g = 0.5 * Sv * (tanh_x + 1.0 - 2.0 * av)
        h = (0.5 / self._C) * ratio
        g = np.where(pos, g, 0.0)
        h = np.where(pos, h, 0.0)
        if w is not None:
            ww = w[:, None] if two_d else w
            g, h = g * ww, h * ww
        return g, h

    @staticmethod
    def _quantile_r6(y, alpha, w=None):
        """Reference common::Quantile / WeightedQuantile
        (src/common/stats.h:34-103): unweighted = x(ceil-based R-6
        interpolation on alpha*(n+1)); weighted = step function at the
        weight-CDF threshold, no interpolation."""
        y = np.asarray(y, dtype=np.float64)
        if w is not None:
            order = np.argsort(y, kind="stable")
            cw = np.cumsum(np.asarray(w, dtype=np.float64)[order])
            thresh = cw[-1] * alpha
            idx = min(int(np.searchsorted(cw, thresh, side="left")),
                      len(y) - 1)
            return float(y[order][idx])
        n = len(y)
        ys = np.sort(y, kind="stable")
        if alpha <= 1.0 / (n + 1):
            return float(ys[0])
        if alpha >= n / (n + 1.0):
            return float(ys[-1])
        x = alpha * (n + 1.0)
        k = int(np.floor(x) - 1)
        d = (x - 1.0) - k
        return float(ys[k] + d * (ys[k + 1] - ys[k]))

    def base_score(self, y, w):
        return self._quantile_r6(y, self.alpha, w)

    def base_score_vec(self, y, w) -> np.ndarray:
        # reference InitEstimation (quantile_obj.cu:200-265): one label
        # quantile per alpha; margins are direct (no ProbToMargin)
        return np.array([self._quantile_r6(y, a, w) for a in self.alphas])

    def pred_transform(self, margin):
        # non-crossing: sort each row's predictions ascending
        # (quantile_obj.cu:177-198 insertion sort)
        if margin.ndim == 2 and margin.shape[1] > 1:
            return np.sort(margin, axis=1, kind="stable")
        return margin

    def default_metric(self):
        return "quantile@" + ",".join(str(a) for a in self.alphas)


class Poisson(Objective):
    """count:poisson (src/objective/poisson_obj.cc:80); margin = log(mean)."""

    name = "count:poisson"
    label_range = (0.0, float("inf"), False)

    def __init__(self, max_delta_step: float = 0.7):
        self.max_delta_step = max_delta_step

    def grad_hess(self, y, margin, w):
        mu = np.exp(margin)
        g = mu - y
        h = np.exp(margin + self.max_delta_step)
        if w is not None:
            g, h = g * w, h * w
        return g, h

    def base_score(self, y, w):
        ww = np.ones_like(y, dtype=np.float64) if w is None else w
        return float(np.log(max((y * ww).sum() / ww.sum(), _EPS)))

    def pred_transform(self, margin):
        return np.exp(margin)

    def default_metric(self):
        return "poisson-nloglik"


class Gamma(Objective):
    """reg:gamma deviance (regression_loss.h:141); margin = log(mean)."""

    name = "reg:gamma"
    label_range = (0.0, float("inf"), True)

    def grad_hess(self, y, margin, w):
        mu = np.exp(margin)
        g = 1.0 - y / mu
        h = y / mu
        if w is not None:
            g, h = g * w, h * w
        return g, h

    def base_score(self, y, w):
        ww = np.ones_like(y, dtype=np.float64) if w is None else w
        return float(np.log(max((y * ww).sum() / ww.sum(), _EPS)))

    def pred_transform(self, margin):
        return np.exp(margin)

    def default_metric(self):
        return "gamma-nloglik"


class Tweedie(Objective):
    """reg:tweedie (src/objective/tweedie_obj.cc:89); margin = log(mean)."""

    name = "reg:tweedie"
    label_range = (0.0, float("inf"), False)

    def __init__(self, rho: float = 1.5):
        self.rho = rho

    def grad_hess(self, y, margin, w):
        rho = self.rho
        g = -y * np.exp((1 - rho) * margin) + np.exp((2 - rho) * margin)
        h = -y * (1 - rho) * np.exp((1 - rho) * margin) + (2 - rho) * np.exp((2 - rho) * margin)
        if w is not None:
            g, h = g * w, h * w
        return g, h

    def base_score(self, y, w):
        ww = np.ones_like(y, dtype=np.float64) if w is None else w
        return float(np.log(max((y * ww).sum() / ww.sum(), _EPS)))

    def pred_transform(self, margin):
        return np.exp(margin)

    def default_metric(self):
        return f"tweedie-nloglik@{self.rho}"


_RT_EPS = 1e-6          # reference kRtEps (include/xgboost/base.h:309)


def _softplus(x):
    """Numerically stable ln(1 + e^x) (reference common/math.h:91)."""
    return np.logaddexp(0.0, x)


def _softplus_inv(x):
    """Inverse softplus with the reference's kRtEps floor
    (common/math.h:99): max(x, eps) + ln(-expm1(-max(x, eps)))."""
    x = np.maximum(x, _RT_EPS)
    return x + np.log(-np.expm1(-x))


class Expectile(Objective):
    """reg:expectileerror asymmetric L2 (regression_obj.cu:340-500
    ExpectileRegression): weight_scale = (1 - alpha) when pred >= label,
    alpha otherwise — alpha near 1 penalizes UNDER-prediction, so
    ascending alphas give ascending expectiles.  grad = weight_scale *
    diff, hess = weight_scale (the reference's half-loss
    parameterization; its `expectile` eval metric reports
    weight_scale * diff^2).

    ``alpha`` may be a VECTOR (reference expectile_alpha): one model
    trains all alphas at once with the SoftPlus-stacked monotone
    composition (regression_obj.cu:388-405) — raw margin 0 is the first
    expectile, raw margin k >= 1 parameterizes the GAP to the previous
    one as kRtEps + SoftPlus(m_k), so predicted expectiles are
    non-decreasing by construction.  Target j's gradient sums the loss
    terms of every alpha k >= j (each stacked prediction depends on all
    earlier raw margins), scaled by d pred/d m_j = sigmoid(m_j) (1 for
    j = 0) with a diagonal Gauss-Newton hessian scale^2 * hess_sum."""

    name = "reg:expectileerror"

    def __init__(self, alpha=0.5):
        if isinstance(alpha, (tuple, list, np.ndarray)):
            self.alphas = tuple(float(a) for a in alpha)
        else:
            self.alphas = (float(alpha),)
        self.alpha = self.alphas[0]

    @staticmethod
    def _stack_preds(margin):
        """Cumulative stacked predictions from raw margins (n, K):
        pred_0 = m_0; pred_k = pred_{k-1} + kRtEps + SoftPlus(m_k).
        The ONE NumPy implementation of the PredTransform stacking —
        metrics and serialization reuse it rather than re-deriving."""
        out = margin.astype(np.float64, copy=True)
        out[:, 1:] = _RT_EPS + _softplus(margin[:, 1:])
        return np.cumsum(out, axis=1)

    def grad_hess(self, y, margin, w):
        if margin.ndim == 2 and margin.shape[1] > 1:
            # vector path: reference GetGradient kernel
            # (regression_obj.cu:381-405), vectorized over rows
            al = np.asarray(self.alphas, dtype=np.float64)[None, :]
            pred = self._stack_preds(margin)
            diff = pred - y[:, None]
            ws = np.where(diff >= 0, 1.0 - al, al)
            gs = ws * diff
            hs = ws.copy()
            if w is not None:
                gs *= w[:, None]
                hs *= w[:, None]
            # target j accumulates alphas k >= j (suffix sums over k)
            grad_sum = np.cumsum(gs[:, ::-1], axis=1)[:, ::-1]
            hess_sum = np.cumsum(hs[:, ::-1], axis=1)[:, ::-1]
            scale = 1.0 / (1.0 + np.exp(-margin))     # d SoftPlus = sigmoid
            scale[:, 0] = 1.0
            return scale * grad_sum, scale * scale * hess_sum
        mm = margin[:, 0] if margin.ndim == 2 else margin
        err = mm - y
        k = np.where(err >= 0, 1.0 - self.alpha, self.alpha)
        g = k * err
        h = k
        if w is not None:
            g, h = g * w, h * w
        return g, h

    @staticmethod
    def margins_from_expectiles(out: np.ndarray) -> np.ndarray:
        """Expectile-space intercepts -> raw gap margins: clamp monotone
        non-decreasing, then ProbToMargin (regression_obj.cu:478-485,
        SoftPlusInv of the gap minus kRtEps).  Shared by the local
        booster, SparkBooster._base_score, and reference-JSON import so
        the conversion cannot drift between them."""
        out = np.asarray(out, dtype=np.float64).copy()
        np.maximum.accumulate(out, out=out)
        margin = out.copy()
        if len(out) > 1:
            margin[1:] = _softplus_inv(np.diff(out) - _RT_EPS)
        return margin

    def base_score(self, y, w):
        # reference InitEstimation (regression_obj.cu:409-455): label
        # mean + one unregularized Newton step per alpha, clamped
        # monotone; scalar form here (the vector form — plus the
        # ProbToMargin raw-space conversion — lives in
        # SparkBooster._base_score, which has the distributed frame)
        ww = np.ones_like(y, dtype=np.float64) if w is None else w
        mean = float((y * ww).sum() / ww.sum())
        d = mean - y
        ws = np.where(d >= 0, 1.0 - self.alpha, self.alpha) * ww
        g, h = float((ws * d).sum()), float(ws.sum())
        return mean + (-g / max(h, _RT_EPS))

    def base_score_vec(self, y, w) -> np.ndarray:
        """Vector InitEstimation + ProbToMargin in NumPy (local-trainer
        twin of SparkBooster._base_score's distributed branch): raw
        gap-margin intercepts, one per alpha.  Without this a vector
        fit would initialize every GAP margin at the first expectile's
        OUTPUT-space value — no Newton step, no clamp, wrong domain."""
        ww = np.ones_like(y, dtype=np.float64) if w is None else w
        mean = float((y * ww).sum() / ww.sum())
        d = mean - y
        out = np.empty(len(self.alphas))
        for i, a in enumerate(self.alphas):
            ws = np.where(d >= 0, 1.0 - a, a) * ww
            out[i] = mean - float((ws * d).sum()) / max(float(ws.sum()),
                                                        _RT_EPS)
        return self.margins_from_expectiles(out)

    def pred_transform(self, margin):
        # reference PredTransform (regression_obj.cu:458-476): stacked
        # cumulative expectiles; scalar margin is already the prediction
        if margin.ndim == 2 and margin.shape[1] > 1:
            return self._stack_preds(margin)
        return margin

    def default_metric(self):
        # reference ExpectileRegression::DefaultEvalMetric returns
        # "expectile" configured with expectile_alpha
        # (regression_obj.cu:484); without it early stopping would be
        # driven by the base-class "rmse" — the wrong loss
        return "expectile@" + ",".join(str(a) for a in self.alphas)


class SoftProb(Objective):
    """multi:softprob (src/objective/multiclass_obj.cu:234-238).

    Vector margin (n, K); grad/hess per class.
    """

    name = "multi:softprob"
    is_multiclass = True

    def __init__(self, num_class: int):
        self.num_class = num_class
        # reference multiclass_obj CheckLabel: label in [0, num_class)
        self.label_range = (0.0, float(num_class) - 1.0, False)

    def grad_hess(self, y, margin, w):
        m = margin - margin.max(axis=1, keepdims=True)
        e = np.exp(m)
        p = e / e.sum(axis=1, keepdims=True)
        yk = np.zeros_like(p)
        yk[np.arange(len(y)), y.astype(np.int64)] = 1.0
        g = p - yk
        h = np.maximum(2.0 * p * (1.0 - p), _EPS)
        if w is not None:
            g, h = g * w[:, None], h * w[:, None]
        return g, h

    def base_score(self, y, w):
        return 0.5  # reference default base_score for multiclass

    def pred_transform(self, margin):
        m = margin - margin.max(axis=1, keepdims=True)
        e = np.exp(m)
        return e / e.sum(axis=1, keepdims=True)

    def default_metric(self):
        return "mlogloss"


class SoftMax(SoftProb):
    """multi:softmax — argmax transform."""

    name = "multi:softmax"

    def pred_transform(self, margin):
        return margin.argmax(axis=1).astype(np.float64)

    def default_metric(self):
        return "merror"


class LambdaRankNDCG(Objective):
    """rank:ndcg / rank:pairwise — LambdaRank pairwise gradients within
    query groups (reference src/objective/lambdarank_obj.{h,cc} +
    src/common/ranking_utils.h).  Reference semantics implemented
    exactly (round-11 rewrite — the earlier implementation predated a
    line-read of LambdaGrad and diverged at the DEFAULTS):

    - pair construction (MakePairs, lambdarank_obj.h:222-283):
      ``topk`` (the DEFAULT) builds DETERMINISTIC exhaustive pairs
      (i, j) over the model-ranked list for i < min(n, NumPair), j > i;
      ``mean`` samples NumPair partners per document from outside its
      label bucket.  NumPair defaults to 32 for topk, 1 for mean
      (ranking_utils.h:66-67).
    - LambdaGrad (lambdarank_obj.h:93-150): sigmoid = sig(s_high-s_low),
      delta = |DeltaNDCG| with MODEL-rank discounts and the
      TRUNCATED-at-TopK inverse IDCG; with
      ``lambdarank_score_normalization`` (default true) delta is divided
      by (|s_high - s_low| + 0.01) unless the group's scores are all
      equal; lambda = (sig - 1) * delta and hessian =
      max(sig*(1-sig), 1e-16) * delta * 2.
    - group normalization (``lambdarank_normalization``, default true,
      lambdarank_obj.cc:228-243): topk scales the group's gradients by
      log2(1 + sum_lambda)/sum_lambda (sum_lambda = sum of -2*lambda);
      mean scales by 1/NumPair.
    - unbiased LambdaMART (Hu et al. WWW'19; lambdarank_obj.cc:204-221,
      :40-86): lambdas divide by t+[idx_high]*t-[idx_low] indexed by
      ORIGINAL list position (input assumed label-sorted), pair costs
      log(1/(1-sig))*delta accumulate into per-position li/lj, and the
      bias tables update CUMULATIVELY as t_i = (li_i/li_0)^(1/(1+eta))
      with eta = lambdarank_bias_norm (default 1.0).

    Group weights (lambdarank_obj.cc:376-387 ``w = h_weight[g]`` +
    ranking_utils.cc:37-44 ``weight_norm_ = n_groups / sum_weights``):
    the reference multiplies each group's gradients by
    w_group * (n_groups / sum w_group).  This engine applies the
    per-row weight column inside :meth:`grad_hess_group` (identical to
    w_group when weights are constant within a group, the ranking
    contract) and the trainer sets :attr:`weight_norm` to the GLOBAL
    n_groups / sum-of-group-weights factor once per fit (the
    RankingCache computes it once at construction; weights are
    immutable during training).  Unweighted data leaves weight_norm at
    exactly 1.0 — no behavior change.
    """

    name = "rank:ndcg"
    needs_qid = True
    use_ndcg_weight = True

    def __init__(self, num_pair: int | None = None, use_ndcg_weight: bool = True,
                 exp_gain: bool = True, unbiased: bool = False,
                 bias_norm: float = 1.0, pair_method: str = "topk",
                 normalization: bool = True,
                 score_normalization: bool = True):
        self.pair_method = pair_method
        self._num_pair = num_pair
        self.use_ndcg_weight = use_ndcg_weight
        self.exp_gain = exp_gain
        self.unbiased = unbiased
        self.bias_norm = bias_norm
        self.normalization = normalization
        self.score_normalization = score_normalization
        # n_groups / sum(group weights) (ranking_utils.cc:37-44); the
        # trainer computes it once per fit from the training frame —
        # exactly 1.0 for unweighted data
        self.weight_norm = 1.0
        T = self.bias_table_size()
        self.t_plus = np.ones(T)
        self.t_minus = np.ones(T)
        self._li_cum = np.zeros(T)       # cumulative across rounds (eq.30)
        self._lj_cum = np.zeros(T)
        self._li_round = np.zeros(T)     # this round's costs (allreduced)
        self._lj_round = np.zeros(T)

    def num_pairs(self) -> int:
        """NumPair (ranking_utils.h:102-115): explicit value, else the
        method default — DefaultK() = 32 for topk, DefaultSamplePairs()
        = 1 for mean."""
        if self._num_pair is not None:
            return int(self._num_pair)
        return 32 if self.pair_method == "topk" else 1

    def bias_table_size(self) -> int:
        """MaxPositionSize (ranking_utils.h:224-232): the truncation
        level for topk, else a hardcoded 32 (bias decays fast)."""
        return self.num_pairs() if self.pair_method == "topk" else 32

    # -- per-subclass pair weight ------------------------------------------
    def _make_delta(self, y, order, n):
        """Returns delta(rank_high, rank_low) -> |metric change| for a
        swap, built once per group.  NDCG: DeltaNDCG
        (lambdarank_obj.h:42-60) with the TopK-truncated inverse IDCG
        (ranking_utils.cc:88-109)."""
        gain = (2.0 ** y - 1.0) if self.exp_gain else y.astype(np.float64)
        disc = 1.0 / np.log2(np.arange(n) + 2.0)
        topk = self.num_pairs() if self.pair_method == "topk" else n
        top = min(n, topk)
        idcg = float(np.sort(gain)[::-1][:top].dot(disc[:top]))
        inv_idcg = 0.0 if idcg == 0.0 else 1.0 / idcg
        gr = gain[order]                   # gain at each rank position

        def delta(rank_high, rank_low):
            g_h, g_l = gr[rank_high], gr[rank_low]
            d_h, d_l = disc[rank_high], disc[rank_low]
            return ((g_h * d_h + g_l * d_l)
                    - (g_l * d_h + g_h * d_l)) * inv_idcg

        return delta

    # -- pair generation ----------------------------------------------------
    def _iter_pairs(self, y, order, n, seed):
        """Yield (rank_i, rank_j) pairs per MakePairs
        (lambdarank_obj.h:222-283)."""
        if self.pair_method == "topk":
            k = min(n, self.num_pairs())
            for i in range(k):
                for j in range(i + 1, n):
                    yield i, j
            return
        # mean: label buckets on the rank list, NumPair samples per doc
        # from outside its bucket (different RNG engine than the
        # reference's minstd_rand — the sampling LAW is what matters)
        y_rank = y[order]
        ys = np.argsort(-y_rank, kind="stable")   # rank positions by label
        rng = np.random.default_rng(seed)
        i = 0
        while i < n:
            j = i + 1
            while j < n and y_rank[ys[j]] == y_rank[ys[i]]:
                j += 1
            n_lefts, n_rights = i, n - j
            if n_lefts + n_rights == 0:
                i = j
                continue
            for _ in range(self.num_pairs()):
                for p_idx in range(i, j):
                    ridx = int(rng.integers(0, n_lefts + n_rights))
                    if ridx >= n_lefts:
                        ridx = ridx - i + j
                    yield int(ys[p_idx]), int(ys[ridx])
            i = j

    # -- position-bias plumbing (unbiased) -----------------------------------
    def _debias(self, idx_high: int, idx_low: int):
        T = len(self.t_plus)
        if idx_high < T and idx_low < T:
            tp, tm = self.t_plus[idx_high], self.t_minus[idx_low]
            if tp >= _EPS and tm >= _EPS:
                return tp * tm
        return None

    def take_round_costs(self) -> np.ndarray:
        """Drain this round's local (li, lj) cost accumulators — the
        caller allreduces them across workers before
        apply_position_bias."""
        out = np.concatenate([self._li_round, self._lj_round])
        T = len(self.t_plus)
        self._li_round = np.zeros(T)
        self._lj_round = np.zeros(T)
        return out

    def apply_position_bias(self, costs: np.ndarray):
        """UpdatePositionBias (lambdarank_obj.cc:40-86): costs
        accumulate ACROSS rounds; t_i = (li_i/li_0)^regularizer with
        regularizer = 1/(1 + lambdarank_bias_norm)."""
        T = len(self.t_plus)
        self._li_cum += costs[:T]
        self._lj_cum += costs[T:]
        reg = 1.0 / (1.0 + self.bias_norm)
        if self._li_cum[0] >= _EPS:
            self.t_plus = (self._li_cum / self._li_cum[0]) ** reg
        if self._lj_cum[0] >= _EPS:
            self.t_minus = (self._lj_cum / self._lj_cum[0]) ** reg

    def base_score(self, y, w):
        # FitIntercept (lambdarank_obj.cc:99): the stump from pair
        # gradients at margin 0 is EXACTLY 0 — every pair contributes
        # +lambda and -lambda — so the intercept is 0.0
        return 0.0

    def grad_hess(self, y, margin, w):
        # fallback: single global group
        return self.grad_hess_group(y, margin, w, seed=0)

    def grad_hess_group(self, y, margin, w, seed: int = 0):
        n = len(y)
        g = np.zeros(n)
        h = np.zeros(n)
        if n < 2:
            return g, h + _EPS
        order = np.argsort(-margin, kind="stable")   # rank -> row index
        delta_fn = self._make_delta(y, order, n)
        s = margin
        best = s[order[0]]
        worst = s[order[-1]]
        norm_by_diff = self.score_normalization and best != worst
        sum_lambda = 0.0
        for ri, rj in self._iter_pairs(y, order, n, seed):
            rank_high, rank_low = ri, rj
            if y[order[rank_high]] == y[order[rank_low]]:
                continue
            if y[order[rank_high]] < y[order[rank_low]]:
                rank_high, rank_low = rank_low, rank_high
            idx_high = int(order[rank_high])
            idx_low = int(order[rank_low])
            d = s[idx_high] - s[idx_low]
            sig = 1.0 / (1.0 + np.exp(-d))
            delta = abs(delta_fn(rank_high, rank_low))
            if norm_by_diff:
                delta /= (abs(d) + 0.01)
            lam = (sig - 1.0) * delta
            hess = max(sig * (1.0 - sig), _EPS) * delta * 2.0
            if self.unbiased:
                tt = self._debias(idx_high, idx_low)
                if tt is not None:
                    lam /= tt
                    hess /= tt
                T = len(self.t_plus)
                if idx_high < T and idx_low < T:
                    cost = float(np.log(1.0 / (1.0 - sig))) * delta
                    if self.t_minus[idx_low] >= _EPS:
                        self._li_round[idx_high] += cost / self.t_minus[idx_low]
                    if self.t_plus[idx_high] >= _EPS:
                        self._lj_round[idx_low] += cost / self.t_plus[idx_high]
            g[idx_high] += lam
            g[idx_low] -= lam
            h[idx_high] += hess
            h[idx_low] += hess
            sum_lambda += -2.0 * lam
        if self.normalization:
            if self.pair_method == "mean":
                norm = 1.0 / self.num_pairs()
            elif sum_lambda > 0.0:
                norm = np.log2(1.0 + sum_lambda) / sum_lambda
            else:
                norm = 1.0
            if norm != 1.0:
                g *= norm
                h *= norm
        if w is not None:
            g, h = g * w, h * w
        if self.weight_norm != 1.0:
            # gpair * w * w_norm (lambdarank_obj.cc:245-249): the global
            # group-weight normalization scales grad AND hess
            g, h = g * self.weight_norm, h * self.weight_norm
        return g, np.maximum(h, _EPS)

    def default_metric(self):
        return "ndcg"


class LambdaRankPairwise(LambdaRankNDCG):
    """rank:pairwise — LambdaGrad with delta = 1
    (LambdaRankGetGradientPairwise, lambdarank_obj.cc:612-650)."""

    name = "rank:pairwise"

    def __init__(self, num_pair: int | None = None, unbiased: bool = False,
                 bias_norm: float = 1.0, pair_method: str = "topk",
                 normalization: bool = True,
                 score_normalization: bool = True):
        super().__init__(num_pair=num_pair, use_ndcg_weight=False,
                         unbiased=unbiased, bias_norm=bias_norm,
                         pair_method=pair_method,
                         normalization=normalization,
                         score_normalization=score_normalization)

    def _make_delta(self, y, order, n):
        return lambda rank_high, rank_low: 1.0

    def default_metric(self):
        return "map"


class LambdaRankMAP(LambdaRankNDCG):
    """rank:map — pairwise lambdas weighted by |DeltaMAP|
    (lambdarank_obj.h:62-83 + MAPStat lambdarank_obj.cc:446-476):
    n_rel[k] = cumulative relevant count along the model rank list,
    acc[k] = cumulative label/rank; the swap delta is an O(1)
    expression over those prefixes.  Labels binarized at > 0."""

    name = "rank:map"

    def __init__(self, num_pair: int | None = None, unbiased: bool = False,
                 bias_norm: float = 1.0, pair_method: str = "topk",
                 normalization: bool = True,
                 score_normalization: bool = True):
        super().__init__(num_pair=num_pair, use_ndcg_weight=False,
                         unbiased=unbiased, bias_norm=bias_norm,
                         pair_method=pair_method,
                         normalization=normalization,
                         score_normalization=score_normalization)

    def _make_delta(self, y, order, n):
        rel = (y > 0).astype(np.float64)
        rel_rank = rel[order]
        n_rel = np.cumsum(rel_rank)                 # MAPStat n_rel
        acc = np.cumsum(rel_rank / np.arange(1, n + 1))   # MAPStat acc
        total = n_rel[-1]

        def delta(rank_high, rank_low):
            # the reference's delta_map re-orders POSITIONALLY before
            # DeltaMAP (lambdarank_obj.cc:512-517): rank_high must be
            # the EARLIER rank, with the labels following the swap
            y_high, y_low = 1.0, 0.0        # post label-swap convention
            if rank_high > rank_low:
                rank_high, rank_low = rank_low, rank_high
                y_high, y_low = y_low, y_high
            if total == 0.0:
                return 0.0
            r_h = rank_high + 1.0
            r_l = rank_low + 1.0
            m = n_rel[rank_low]
            nn = n_rel[rank_high]
            b = (acc[rank_low - 1] if rank_low >= 1 else 0.0) - acc[rank_high]
            if y_high < y_low:
                a = m / r_l - (nn + 1.0) / r_h
                return (a - b) / total
            a = nn / r_h - m / r_l
            return (a + b) / total

        return delta

    def default_metric(self):
        return "map"


class AFT(Objective):
    """survival:aft — accelerated failure time with interval censoring
    (reference `src/objective/aft_obj.cu:148`, loss derivations
    `src/common/survival_util.h`; distributions
    `src/common/probability_distribution.h:31`).

    Labels are an interval [y_lower, y_upper] in the time domain:
    uncensored y_lower == y_upper; right-censored y_upper = +inf;
    left-censored y_lower <= 0; interval-censored otherwise.
    With z = (ln y - margin) / sigma:
      uncensored  loss = -ln( f(z) / (sigma * y) )
      censored    loss = -ln( F(z_u) - F(z_l) )
    Gradients follow by the chain rule (dz/dmargin = -1/sigma); clipped
    like the reference (survival_util.h kMin/kMaxGradient, kMinHessian).
    """

    name = "survival:aft"
    needs_bounds = True

    _G_CLIP = 15.0
    _H_MIN = 1e-16
    _H_MAX = 15.0
    _EPS_D = 1e-12

    def __init__(self, dist: str = "normal", sigma: float = 1.0):
        from xgboost_spark.functions.distributions import get_distribution
        self.dist = get_distribution(dist)
        self.sigma = float(sigma)

    def _z(self, y, margin):
        # clip to the range where pdf/cdf are numerically meaningful —
        # avoids inf*0 in the distribution kernels for open-ended bounds
        with np.errstate(divide="ignore"):
            return np.clip((np.log(y) - margin) / self.sigma, -37.0, 37.0)

    def loss_bounds(self, yl: np.ndarray, yu: np.ndarray, margin: np.ndarray) -> np.ndarray:
        d = self.dist
        s = self.sigma
        uncens = np.isclose(yl, yu) & (yl > 0)
        has_l = yl > 0
        has_u = np.isfinite(yu)
        zl = np.where(has_l, self._z(np.maximum(yl, _EPS), margin), -37.0)
        zu = np.where(has_u, self._z(np.maximum(yu, _EPS), margin), 37.0)
        # stable log-space identities: ln S = ln f - ln hazard,
        # ln F = ln f - ln rev_hazard — no tail underflow
        loss_r = -(d.log_pdf(zl) - np.log(np.maximum(d.hazard(zl), 1e-300)))
        loss_l = -(d.log_pdf(zu) - np.log(np.maximum(d.rev_hazard(zu), 1e-300)))
        D = np.maximum(d.cdf(zu) - d.cdf(zl), self._EPS_D)
        loss_i = -np.log(D)
        loss_u = -d.log_pdf(zl) + np.log(s * np.maximum(yl, _EPS))
        loss = np.where(uncens, loss_u,
                        np.where(~has_u, loss_r,
                                 np.where(~has_l, loss_l, loss_i)))
        return loss

    def grad_hess_bounds(self, yl: np.ndarray, yu: np.ndarray,
                         margin: np.ndarray, w: np.ndarray | None):
        d = self.dist
        s = self.sigma
        uncens = np.isclose(yl, yu) & (yl > 0)
        zl = np.where(yl > 0, self._z(np.maximum(yl, _EPS), margin), -37.0)
        zu = np.where(np.isfinite(yu), self._z(np.maximum(yu, _EPS), margin), 37.0)
        has_l = yl > 0
        has_u = np.isfinite(yu)
        # uncensored: stable log-pdf forms (pdf ratios underflow in tails)
        g_u = d.dlog_pdf(zl) / s            # = f'/(sigma f); dz/dm = -1/sigma
        h_u = d.neg_d2_log_pdf(zl) / (s * s)
        # right-censored (loss = -ln S(zl)): hazard form, tail-stable
        hz = d.hazard(zl)
        g_r = -hz / s
        h_r = hz * (d.dlog_pdf(zl) + hz) / (s * s)
        # left-censored (loss = -ln F(zu)): reverse-hazard form
        rhz = d.rev_hazard(zu)
        g_l = rhz / s
        h_l = rhz * (rhz - d.dlog_pdf(zu)) / (s * s)
        # interval-censored: D = F(zu) - F(zl) (finite bounds, moderate z)
        f_l = d.pdf(zl)
        f_u = d.pdf(zu)
        D = np.maximum(d.cdf(zu) - d.cdf(zl), self._EPS_D)
        g_i = (f_u - f_l) / (s * D)
        h_i = ((f_l - f_u) ** 2 - (d.grad_pdf(zu) - d.grad_pdf(zl)) * D) / (s * s * D * D)
        g = np.where(uncens, g_u,
                     np.where(~has_u, g_r, np.where(~has_l, g_l, g_i)))
        h = np.where(uncens, h_u,
                     np.where(~has_u, h_r, np.where(~has_l, h_l, h_i)))
        g = np.clip(g, -self._G_CLIP, self._G_CLIP)
        h = np.clip(h, self._H_MIN, self._H_MAX)
        if w is not None:
            g = g * w
            h = h * w
        return g, h

    def grad_hess(self, y, margin, w):
        # degenerate path: point labels = uncensored intervals
        return self.grad_hess_bounds(y, y, margin, w)

    def base_score_bounds(self, yl, yu, w) -> float:
        # the reference's AFTObj does NOT override InitEstimation, so
        # the intercept is the plain DefaultBaseScore 0.5 (objective.cc:
        # 34-38, objective.h:32) — not a Newton stump
        return 0.5

    def pred_transform(self, margin):
        return np.exp(margin)

    def default_metric(self):
        return "aft-nloglik"


class CoxPH(Objective):
    """survival:cox — Cox proportional hazards, Breslow partial
    likelihood (reference `regression_obj.cu:598-604`; requires
    label-sorted data, `include/xgboost/data.h:151,214`).

    Label encoding follows the reference: y > 0 is an observed event at
    time y; y < 0 is right-censoring at time |y|.  With risk-set sums
    S(t) = sum_{j: t_j >= t} w_j e^{m_j}:
      g_k = w_k e^{m_k} R(t_k) - delta_k w_k
      h_k = w_k e^{m_k} R(t_k) - (w_k e^{m_k})^2 R2(t_k)
    where R(t) = sum_{event times t' <= t} W_ev(t')/S(t') and R2 uses
    S(t')^2.  Computed exactly via sorted prefix/suffix scans.
    """

    name = "survival:cox"
    needs_global_sort = True

    @staticmethod
    def risk_stats(t_unique_sorted: np.ndarray, e_t: np.ndarray, dw_t: np.ndarray):
        """Per-distinct-time Breslow terms.

        e_t: sum of w*exp(m) at each time; dw_t: event weight at each
        time.  Returns (R, R2) arrays aligned with t_unique_sorted
        (ascending).  Shared by the NumPy kernel and the Spark pass.
        """
        S = np.cumsum(e_t[::-1])[::-1]            # suffix sums: risk set size
        S = np.maximum(S, _EPS)
        rr = np.where(dw_t > 0, dw_t / S, 0.0)
        rr2 = np.where(dw_t > 0, dw_t / (S * S), 0.0)
        return np.cumsum(rr), np.cumsum(rr2)

    def grad_hess_global(self, y: np.ndarray, margin: np.ndarray, w: np.ndarray | None):
        n = len(y)
        if w is None:
            w = np.ones(n)
        t = np.abs(y)
        delta = (y > 0).astype(np.float64)
        em = w * np.exp(margin - margin.max())     # stabilized; R*em rescales below
        scale = np.exp(margin.max())
        tu, inv = np.unique(t, return_inverse=True)
        e_t = np.bincount(inv, weights=em, minlength=len(tu)) * scale
        dw_t = np.bincount(inv, weights=delta * w, minlength=len(tu))
        R, R2 = self.risk_stats(tu, e_t, dw_t)
        emk = w * np.exp(margin)
        g = emk * R[inv] - delta * w
        h = np.maximum(emk * R[inv] - emk * emk * R2[inv], 1e-16)
        return g, h

    def loss_global(self, y: np.ndarray, margin: np.ndarray, w: np.ndarray | None) -> float:
        """Negative partial log-likelihood (cox-nloglik numerator)."""
        n = len(y)
        if w is None:
            w = np.ones(n)
        t = np.abs(y)
        delta = y > 0
        tu, inv = np.unique(t, return_inverse=True)
        e_t = np.bincount(inv, weights=w * np.exp(margin), minlength=len(tu))
        S = np.maximum(np.cumsum(e_t[::-1])[::-1], _EPS)
        return float(-(w[delta] * (margin[delta] - np.log(S[inv[delta]]))).sum())

    def grad_hess(self, y, margin, w):  # pragma: no cover - guarded upstream
        raise RuntimeError("survival:cox gradients need globally sorted data; "
                           "use grad_hess_global")

    def base_score(self, y, w):
        # FitIntercept (regression_obj.cu:517): one Newton stump from
        # the Breslow gradients at margin 0 (PredTransform exp and the
        # learner's ProbToMargin log cancel)
        g, h = self.grad_hess_global(y, np.zeros_like(y, dtype=np.float64), w)
        return float(-g.sum() / max(h.sum(), _RT_EPS_F))

    def pred_transform(self, margin):
        return np.exp(margin)   # hazard ratio (reference cox PredTransform)

    def default_metric(self):
        return "cox-nloglik"


class CustomObjective(Objective):
    """User-supplied objective (reference custom-objective surface:
    `Learner::BoostOneIter` `include/xgboost/learner.h:90`, Python
    ``xgb.train(obj=...)`` `training.py:53`): a callable
    ``fn(y, margin, weight) -> (grad, hess)`` evaluated rowwise inside
    the Arrow-batched gradient pass — the engine's UDF surface.

    ``pred_transform`` / ``base_score`` / ``default_metric`` may be
    overridden via constructor args; defaults are identity / Newton
    stump on the callable / rmse.
    """

    name = "custom"

    def __init__(self, fn, pred_transform_fn=None, base_score_value=None,
                 metric: str = "rmse"):
        self._fn = fn
        self._pt = pred_transform_fn
        self._bs = base_score_value
        self._metric = metric

    def grad_hess(self, y, margin, w):
        g, h = self._fn(y, margin, w)
        return np.asarray(g, dtype=np.float64), np.asarray(h, dtype=np.float64)

    def base_score(self, y, w):
        if self._bs is not None:
            return float(self._bs)
        return super().base_score(y, w)

    def pred_transform(self, margin):
        return self._pt(margin) if self._pt is not None else margin

    def default_metric(self):
        return self._metric


#: objectives whose model-JSON intercept lives in log space / logit space
#: (reference ObjFunction::ProbToMargin, applied at model load —
#: src/learner.cc:397; the JSON stores base_score post-transform)
_LOGIT_LINK = {"binary:logistic", "reg:logistic", "binary:logitraw"}
_LOG_LINK = {"count:poisson", "reg:gamma", "reg:tweedie", "survival:aft"}


def prob_to_margin(objective: str, v: float) -> float:
    """Output-space intercept -> margin space (reference ProbToMargin)."""
    import math
    if objective in _LOGIT_LINK:
        v = min(max(v, _EPS), 1.0 - _EPS)
        return math.log(v / (1.0 - v))
    if objective in _LOG_LINK:
        return math.log(max(v, _EPS))
    return v


def margin_to_prob(objective: str, v: float) -> float:
    """Margin-space intercept -> output space (inverse of prob_to_margin);
    used when SAVING so the JSON matches the reference's convention."""
    import math
    if objective in _LOGIT_LINK:
        return 1.0 / (1.0 + math.exp(-v))
    if objective in _LOG_LINK:
        return math.exp(v)
    return v


def get_objective(name: str, params=None) -> Objective:
    """Objective registry (reference XGBOOST_REGISTER_OBJECTIVE)."""
    if isinstance(name, Objective):
        return name
    if callable(name):
        return CustomObjective(name)
    p = params
    table: dict[str, callable] = {
        "reg:squarederror": SquaredError,
        "reg:squaredlogerror": SquaredLogError,
        "reg:logistic": RegLogistic,
        "binary:logistic": lambda: Logistic(p.scale_pos_weight if p else 1.0),
        "binary:logitraw": LogitRaw,
        "binary:hinge": Hinge,
        "reg:pseudohubererror": lambda: PseudoHuber(p.huber_slope if p else 1.0),
        "reg:absoluteerror": AbsoluteError,
        "reg:quantileerror": lambda: QuantileError(p.quantile_alpha if p else 0.5),
        "count:poisson": lambda: Poisson(p.max_delta_step if p and p.max_delta_step else 0.7),
        "reg:gamma": Gamma,
        "reg:tweedie": lambda: Tweedie(p.tweedie_variance_power if p else 1.5),
        "reg:expectileerror": lambda: Expectile(p.expectile_alphas if p else 0.5),
        "multi:softprob": lambda: SoftProb(p.num_class if p else 2),
        "multi:softmax": lambda: SoftMax(p.num_class if p else 2),
        "rank:ndcg": lambda: LambdaRankNDCG(
            p.lambdarank_num_pair_per_sample if p else None,
            True, p.ndcg_exp_gain if p else True,
            unbiased=p.lambdarank_unbiased if p else False,
            bias_norm=p.lambdarank_bias_norm if p else 1.0,
            pair_method=p.lambdarank_pair_method if p else "topk",
            normalization=p.lambdarank_normalization if p else True,
            score_normalization=(p.lambdarank_score_normalization
                                 if p else True),
        ),
        "rank:pairwise": lambda: LambdaRankPairwise(
            p.lambdarank_num_pair_per_sample if p else None,
            unbiased=p.lambdarank_unbiased if p else False,
            bias_norm=p.lambdarank_bias_norm if p else 1.0,
            pair_method=p.lambdarank_pair_method if p else "topk",
            normalization=p.lambdarank_normalization if p else True,
            score_normalization=(p.lambdarank_score_normalization
                                 if p else True),
        ),
        "rank:map": lambda: LambdaRankMAP(
            p.lambdarank_num_pair_per_sample if p else None,
            pair_method=p.lambdarank_pair_method if p else "topk",
            normalization=p.lambdarank_normalization if p else True,
            score_normalization=(p.lambdarank_score_normalization
                                 if p else True),
        ),
        "survival:aft": lambda: AFT(p.aft_loss_distribution if p else "normal",
                                    p.aft_loss_distribution_scale if p else 1.0),
        "survival:cox": CoxPH,
    }
    if name == "reg:linear":
        # reference regression_obj.cu:271-276: registered as a
        # deprecated alias of reg:squarederror, warning included
        import warnings
        warnings.warn("reg:linear is now deprecated in favor of "
                      "reg:squarederror.")
        return SquaredError()
    if name not in table:
        raise ValueError(f"unknown objective {name!r}")
    cls = table[name]
    try:
        return cls()
    except TypeError:
        return cls()  # pragma: no cover
