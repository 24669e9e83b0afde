"""Probability distributions for AFT survival loss.

Vectorized NumPy forms of the reference's distribution kernels
(`src/common/probability_distribution.h:31` — normal / logistic /
extreme): pdf f(z), cdf F(z), and the first/second pdf derivatives
needed for AFT gradients (`src/objective/aft_obj.cu:148`,
`src/common/survival_util.h`).

The extreme distribution is the standard Gumbel *minimum* form
(log-Weibull): F(z) = 1 - exp(-e^z).
erf is evaluated with the Abramowitz & Stegun 7.1.26 polynomial
(|err| < 1.5e-7) — scipy is not a dependency.
"""

from __future__ import annotations

import numpy as np

_SQRT2 = np.sqrt(2.0)
_INV_SQRT_2PI = 1.0 / np.sqrt(2.0 * np.pi)


def _erfc_pos(x: np.ndarray) -> np.ndarray:
    """erfc(x) for x >= 0 in product form (A&S 7.1.26): keeps relative
    accuracy down to ~1e-7 before the polynomial's absolute error bites."""
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
               + t * (-1.453152027 + t * 1.061405429))))
    return poly * np.exp(-x * x)


def _erf(x: np.ndarray) -> np.ndarray:
    # Abramowitz & Stegun 7.1.26, max abs error 1.5e-7
    sign = np.sign(x)
    return sign * (1.0 - _erfc_pos(np.abs(x)))


class NormalDist:
    name = "normal"

    @staticmethod
    def pdf(z):
        return _INV_SQRT_2PI * np.exp(-0.5 * z * z)

    @staticmethod
    def cdf(z):
        return 0.5 * (1.0 + _erf(z / _SQRT2))

    @staticmethod
    def grad_pdf(z):
        """f'(z)"""
        return -z * NormalDist.pdf(z)

    @staticmethod
    def hess_pdf(z):
        """f''(z)"""
        return (z * z - 1.0) * NormalDist.pdf(z)

    @staticmethod
    def log_pdf(z):
        return -0.5 * z * z - 0.5 * np.log(2.0 * np.pi)

    @staticmethod
    def dlog_pdf(z):
        """d ln f / dz = f'/f — stable at extreme z where pdf underflows."""
        return -z

    @staticmethod
    def neg_d2_log_pdf(z):
        """-(d^2 ln f / dz^2) = (f'/f)^2 - f''/f"""
        return np.ones_like(z)

    @staticmethod
    def hazard(z):
        """f(z)/S(z), tail-stable (S = survival = 1 - F).
        z <= 5: erfc product form; z > 5: Mills-ratio asymptotic."""
        z = np.asarray(z, dtype=np.float64)
        safe = np.minimum(z, 5.0)
        S = 0.5 * _erfc_pos(np.maximum(safe, 0.0) / _SQRT2)
        S = np.where(safe < 0, NormalDist.cdf(-safe), S)
        direct = NormalDist.pdf(safe) / np.maximum(S, 1e-300)
        zz = np.maximum(z, 5.0)
        asym = zz / (1.0 - 1.0 / zz**2 + 3.0 / zz**4 - 15.0 / zz**6)
        return np.where(z > 5.0, asym, direct)

    @staticmethod
    def rev_hazard(z):
        """f(z)/F(z); symmetric dist => hazard(-z)."""
        return NormalDist.hazard(-np.asarray(z, dtype=np.float64))


class LogisticDist:
    name = "logistic"

    @staticmethod
    def cdf(z):
        return 1.0 / (1.0 + np.exp(-z))

    @staticmethod
    def pdf(z):
        s = LogisticDist.cdf(z)
        return s * (1.0 - s)

    @staticmethod
    def grad_pdf(z):
        s = LogisticDist.cdf(z)
        f = s * (1.0 - s)
        return f * (1.0 - 2.0 * s)

    @staticmethod
    def hess_pdf(z):
        s = LogisticDist.cdf(z)
        f = s * (1.0 - s)
        return f * (1.0 - 2.0 * s) ** 2 - 2.0 * f * f

    @staticmethod
    def log_pdf(z):
        return -(np.logaddexp(0.0, -z) + np.logaddexp(0.0, z))

    @staticmethod
    def dlog_pdf(z):
        return 1.0 - 2.0 * LogisticDist.cdf(z)

    @staticmethod
    def neg_d2_log_pdf(z):
        return 2.0 * LogisticDist.pdf(z)

    @staticmethod
    def hazard(z):
        return LogisticDist.cdf(z)        # f/S = s(1-s)/(1-s) = s

    @staticmethod
    def rev_hazard(z):
        return LogisticDist.cdf(-z)       # f/F = 1-s


class ExtremeDist:
    name = "extreme"

    @staticmethod
    def cdf(z):
        return 1.0 - np.exp(-np.exp(np.minimum(z, 35.0)))

    @staticmethod
    def pdf(z):
        zc = np.minimum(z, 35.0)
        w = np.exp(zc)
        return w * np.exp(-w)

    @staticmethod
    def grad_pdf(z):
        zc = np.minimum(z, 35.0)
        w = np.exp(zc)
        return (1.0 - w) * ExtremeDist.pdf(z)

    @staticmethod
    def hess_pdf(z):
        zc = np.minimum(z, 35.0)
        w = np.exp(zc)
        return (w * w - 3.0 * w + 1.0) * ExtremeDist.pdf(z)

    @staticmethod
    def log_pdf(z):
        zc = np.minimum(z, 35.0)
        return zc - np.exp(zc)

    @staticmethod
    def dlog_pdf(z):
        return 1.0 - np.exp(np.minimum(z, 35.0))

    @staticmethod
    def neg_d2_log_pdf(z):
        return np.exp(np.minimum(z, 35.0))

    @staticmethod
    def hazard(z):
        return np.exp(np.minimum(z, 35.0))     # f/S = w e^-w / e^-w = w

    @staticmethod
    def rev_hazard(z):
        w = np.exp(np.minimum(z, 35.0))
        return w * np.exp(-w) / np.maximum(-np.expm1(-w), 1e-300)


def get_distribution(name: str):
    table = {"normal": NormalDist, "logistic": LogisticDist, "extreme": ExtremeDist}
    if name not in table:
        raise ValueError(f"unknown aft_loss_distribution {name!r}")
    return table[name]
