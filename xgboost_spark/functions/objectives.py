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


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


class Objective:
    """Base: scalar-output, rowwise objective."""

    name: str = ""
    # leaves of trees trained on this objective get refreshed to a
    # residual quantile (reference "adaptive tree", regression_obj.cu:745)
    adaptive_alpha: float | None = None
    needs_qid: bool = False

    def grad_hess(self, y: np.ndarray, margin: np.ndarray, w: np.ndarray | None):
        raise NotImplementedError

    def base_score(self, y: np.ndarray, w: np.ndarray | None) -> float:
        """Initial margin — Newton stump fit (reference src/tree/fit_stump.h:34)."""
        g, h = self.grad_hess(y, np.zeros_like(y, dtype=np.float64), w)
        return float(-g.sum() / max(h.sum(), _EPS))

    def pred_transform(self, margin: np.ndarray) -> np.ndarray:
        return margin

    def default_metric(self) -> str:
        return "rmse"


class SquaredError(Objective):
    """reg:squarederror (reference src/objective/regression_loss.h:31)."""

    name = "reg:squarederror"

    def grad_hess(self, y, margin, w):
        g = margin - y
        h = np.ones_like(y, dtype=np.float64)
        if w is not None:
            g, h = g * w, h * w
        return g, h


class SquaredLogError(Objective):
    """reg:squaredlogerror (regression_loss.h:58). Requires y > -1."""

    name = "reg:squaredlogerror"

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

    def grad_hess(self, y, margin, w):
        yy = 2.0 * y - 1.0
        active = yy * margin < 1.0
        g = np.where(active, -yy, 0.0)
        h = np.where(active, 1.0, _EPS)
        if w is not None:
            g, h = g * w, h * w
        return g, h

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

    def base_score(self, y, w):
        return 0.5  # reference default when not fit

    def default_metric(self):
        return "mphe"


class AbsoluteError(Objective):
    """reg:absoluteerror (regression_obj.cu:745-753) — adaptive-leaf MAE.

    Constant hessian 1 with sign gradient; leaves refreshed to the median
    residual after growth (``adaptive_alpha=0.5``).
    """

    name = "reg:absoluteerror"
    adaptive_alpha = 0.5

    def grad_hess(self, y, margin, w):
        g = np.sign(margin - y)
        h = np.ones_like(y, dtype=np.float64)
        if w is not None:
            g, h = g * w, h * w
        return g, h

    def base_score(self, y, w):
        return float(np.median(y))

    def default_metric(self):
        return "mae"


class QuantileError(Objective):
    """reg:quantileerror pinball loss (src/objective/quantile_obj.cu:272)."""

    name = "reg:quantileerror"

    def __init__(self, alpha: float = 0.5):
        self.alpha = alpha
        self.adaptive_alpha = alpha

    def grad_hess(self, y, margin, w):
        err = margin - y
        # grad of pinball wrt margin: alpha if margin>=y else alpha-1
        g = np.where(err >= 0, self.alpha, self.alpha - 1.0)
        h = np.ones_like(y, dtype=np.float64)
        if w is not None:
            g, h = g * w, h * w
        return g, h

    def base_score(self, y, w):
        return float(np.quantile(y, self.alpha))

    def default_metric(self):
        return f"quantile@{self.alpha}"


class Poisson(Objective):
    """count:poisson (src/objective/poisson_obj.cc:80); margin = log(mean)."""

    name = "count:poisson"

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


class Expectile(Objective):
    """reg:expectileerror asymmetric L2 (regression_obj.cu:497-512)."""

    name = "reg:expectileerror"

    def __init__(self, alpha: float = 0.5):
        self.alpha = alpha

    def grad_hess(self, y, margin, w):
        err = margin - y
        k = np.where(err >= 0, self.alpha, 1.0 - self.alpha)
        g = 2.0 * k * err
        h = 2.0 * k
        if w is not None:
            g, h = g * w, h * w
        return g, h


class SoftProb(Objective):
    """multi:softprob (src/objective/multiclass_obj.cu:234-238).

    Vector margin (n, K); grad/hess per class.
    """

    name = "multi:softprob"
    is_multiclass = True

    def __init__(self, num_class: int):
        self.num_class = num_class

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
    query groups (reference src/objective/lambdarank_obj.cc:662-670).

    ``grad_hess_group`` is called per qid group (the trainer routes rows
    through a per-group kernel); pair construction is mean-sampled with a
    deterministic seed, matching the reference's `mean` pair method.
    """

    name = "rank:ndcg"
    needs_qid = True

    def __init__(self, num_pair: int = 1, use_ndcg_weight: bool = True, exp_gain: bool = True):
        self.num_pair = num_pair
        self.use_ndcg_weight = use_ndcg_weight
        self.exp_gain = exp_gain

    def base_score(self, y, w):
        return 0.5

    def grad_hess(self, y, margin, w):
        # fallback: single global group
        return self.grad_hess_group(y, margin, w, seed=0)

    def grad_hess_group(self, y, margin, w, seed: int = 0):
        n = len(y)
        g = np.zeros(n)
        h = np.zeros(n)
        if n < 2:
            return g, h + _EPS
        gain = (2.0 ** y - 1.0) if self.exp_gain else y.astype(np.float64)
        order = np.argsort(-margin, kind="stable")
        ranks = np.empty(n, dtype=np.int64)
        ranks[order] = np.arange(n)
        inv_discount = 1.0 / np.log2(ranks + 2.0)
        idcg = float(np.sort(gain)[::-1][: n].dot(1.0 / np.log2(np.arange(n) + 2.0)))
        idcg = max(idcg, _EPS)
        rng = np.random.default_rng(seed)
        for _ in range(self.num_pair):
            j = rng.integers(0, n, size=n)
            for i in range(n):
                k = j[i]
                if y[i] == y[k]:
                    continue
                hi, lo = (i, k) if y[i] > y[k] else (k, i)
                d = margin[hi] - margin[lo]
                p = 1.0 / (1.0 + np.exp(d))
                lam = p
                hess = max(p * (1.0 - p), _EPS)
                if self.use_ndcg_weight:
                    dg = abs(gain[hi] - gain[lo]) * abs(inv_discount[ranks[hi]] - inv_discount[ranks[lo]]) / idcg
                    lam *= dg
                    hess *= dg
                g[hi] -= lam
                g[lo] += lam
                h[hi] += hess
                h[lo] += hess
        if w is not None:
            g, h = g * w, h * w
        return g, np.maximum(h, _EPS)

    def default_metric(self):
        return "ndcg"


class LambdaRankPairwise(LambdaRankNDCG):
    name = "rank:pairwise"

    def __init__(self, num_pair: int = 1):
        super().__init__(num_pair=num_pair, use_ndcg_weight=False)

    def default_metric(self):
        return "map"


def get_objective(name: str, params=None) -> Objective:
    """Objective registry (reference XGBOOST_REGISTER_OBJECTIVE)."""
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
        "reg:quantileerror": lambda: QuantileError(p.quantile_alpha[0] if p else 0.5),
        "count:poisson": lambda: Poisson(p.max_delta_step if p and p.max_delta_step else 0.7),
        "reg:gamma": Gamma,
        "reg:tweedie": lambda: Tweedie(p.tweedie_variance_power if p else 1.5),
        "reg:expectileerror": lambda: Expectile(p.quantile_alpha[0] if p else 0.5),
        "multi:softprob": lambda: SoftProb(p.num_class if p else 2),
        "multi:softmax": lambda: SoftMax(p.num_class if p else 2),
        "rank:ndcg": lambda: LambdaRankNDCG(
            p.lambdarank_num_pair_per_sample if p else 1, True, p.ndcg_exp_gain if p else True
        ),
        "rank:pairwise": lambda: LambdaRankPairwise(p.lambdarank_num_pair_per_sample if p else 1),
    }
    if name not in table:
        raise ValueError(f"unknown objective {name!r}")
    cls = table[name]
    try:
        return cls()
    except TypeError:
        return cls()  # pragma: no cover
