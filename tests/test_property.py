"""Hypothesis property tests for the pure numeric kernels, mirroring the
reference's randomized test strategy (tests/python/test_updaters.py uses
hypothesis the same way).  Everything here is NumPy-local — no Spark
session — so hundreds of generated cases stay fast.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from xgboost_spark import core
from xgboost_spark.functions import objectives as obj

finite = st.floats(-50, 50, allow_nan=False, allow_infinity=False)


def brute_force_best(hg, hh, lam, alpha, mcw):
    """Exhaustive split enumeration (loops), both missing directions,
    using the same gain kernel — pins the vectorized cumsum enumeration
    in core.split_search against the obvious O(F·B) reference loop."""
    F_, Bp1 = hg.shape
    B = Bp1 - 1
    best_gain, found = -np.inf, False
    for f in range(F_):
        gtot, htot = hg[f].sum(), hh[f].sum()
        parent = core.calc_gain(gtot, htot, lam, alpha)
        for b in range(B - 1):
            for miss_left in (False, True):
                gl = hg[f, : b + 1].sum() + (hg[f, B] if miss_left else 0.0)
                hl = hh[f, : b + 1].sum() + (hh[f, B] if miss_left else 0.0)
                gr, hr = gtot - gl, htot - hl
                if hl < mcw or hr < mcw:
                    continue
                gain = (core.calc_gain(gl, hl, lam, alpha)
                        + core.calc_gain(gr, hr, lam, alpha) - parent)
                if gain > best_gain:
                    best_gain, found = gain, True
    return best_gain if found else None


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 4), st.integers(3, 8),
       st.floats(0.0, 10.0), st.floats(0.0, 2.0), st.floats(0.0, 3.0),
       st.integers(0, 2**31 - 1))
def test_split_search_matches_bruteforce(n_feat, n_bin, lam, alpha, mcw, seed):
    rng = np.random.default_rng(seed)
    hg = rng.normal(scale=3.0, size=(1, n_feat, n_bin + 1))
    hh = np.abs(rng.normal(size=(1, n_feat, n_bin + 1))) + 0.01
    # per-feature totals must agree (every feature sees the same rows)
    tg, th = hg[0, 0].sum(), hh[0, 0].sum()
    for f in range(1, n_feat):
        hg[0, f] += (tg - hg[0, f].sum()) / (n_bin + 1)
        hh[0, f] *= th / hh[0, f].sum()
    res = core.split_search(hg, hh, reg_lambda=lam, reg_alpha=alpha,
                            min_child_weight=mcw, gamma=-1e12)[0]
    bf = brute_force_best(hg[0], hh[0], lam, alpha, mcw)
    # reference split validity (driver.h IsValidExpandEntry): a split
    # must beat kRtEps (1e-6) REGARDLESS of gamma — so the brute-force
    # optimum and the engine agree exactly on the valid region
    if res is None:
        assert bf is None or bf <= 1e-6 * (1 + 1e-9)
    else:
        assert res.gain > 1e-6
        assert res.gain == pytest.approx(bf, rel=1e-8, abs=1e-8)


# (objective, label strategy, margin strategy, hess / d(grad)/dm factor)
# Poisson's factor is exp(max_delta_step): the reference deliberately
# inflates the hessian for stability (poisson_obj, max_delta_step=0.7)
SMOOTH = [
    (obj.SquaredError(), finite, finite, 1.0),
    (obj.Logistic(), st.floats(0.0, 1.0), st.floats(-20, 20), 1.0),
    (obj.PseudoHuber(), finite, finite, 1.0),
    (obj.Poisson(), st.floats(0.0, 50.0), st.floats(-5, 5), float(np.exp(0.7))),
    (obj.Gamma(), st.floats(0.01, 50.0), st.floats(-5, 5), 1.0),
    (obj.Tweedie(), st.floats(0.0, 50.0), st.floats(-5, 5), 1.0),
    (obj.Expectile(), finite, finite, 1.0),
]


@settings(max_examples=40, deadline=None)
@given(st.integers(0, len(SMOOTH) - 1), st.data())
def test_hessian_is_gradient_derivative(idx, data):
    """hess must equal d(grad)/d(margin): the Newton step the whole
    trainer is built on (reference regression_loss.h kernels)."""
    o, y_st, m_st, factor = SMOOTH[idx]
    y = np.array([data.draw(y_st)])
    m = np.array([data.draw(m_st)])
    eps = 1e-5 * max(1.0, abs(float(m[0])))
    g_plus, _ = o.grad_hess(y, m + eps, None)
    g_minus, _ = o.grad_hess(y, m - eps, None)
    _, h = o.grad_hess(y, m, None)
    num_h = (g_plus - g_minus) / (2 * eps)
    # some objectives clamp the hessian away from 0 for stability; only
    # check where the numeric derivative itself is in the clamped range
    if num_h[0] > 1e-6:
        assert h[0] == pytest.approx(factor * num_h[0], rel=2e-3, abs=2e-4)


@settings(max_examples=40, deadline=None)
@given(st.integers(0, len(SMOOTH) - 1), st.floats(0.1, 10.0), st.data())
def test_instance_weight_scales_grad_and_hess(idx, w, data):
    o, y_st, m_st, _factor = SMOOTH[idx]
    y = np.array([data.draw(y_st)])
    m = np.array([data.draw(m_st)])
    g1, h1 = o.grad_hess(y, m, None)
    gw, hw = o.grad_hess(y, m, np.array([w]))
    assert gw[0] == pytest.approx(w * g1[0], rel=1e-9, abs=1e-12)
    assert hw[0] == pytest.approx(w * h1[0], rel=1e-9, abs=1e-12)


@settings(max_examples=100, deadline=None)
@given(st.floats(-30, 30), st.floats(0.01, 30), st.floats(0.0, 10),
       st.floats(0.0, 5))
def test_calc_weight_l1_soft_threshold(G, H, lam, alpha):
    """L1: |G| <= alpha zeroes the leaf; otherwise alpha shrinks the
    numerator toward zero (reference param.h ThresholdL1)."""
    w = core.calc_weight(G, H, lam, reg_alpha=alpha)
    if abs(G) <= alpha:
        assert w == 0.0
    else:
        expect = -(G - np.sign(G) * alpha) / (H + lam)
        assert w == pytest.approx(expect, rel=1e-12)
        assert abs(w) <= abs(core.calc_weight(G, H, lam, reg_alpha=0.0)) + 1e-15


@settings(max_examples=50, deadline=None)
@given(st.lists(st.floats(-100, 100, allow_nan=False, allow_infinity=False,
                          width=32), min_size=1, max_size=40),
       st.floats(0.1, 10.0))
def test_base_score_squarederror_is_weighted_mean(ys, w):
    y = np.asarray(ys, dtype=np.float64)
    o = obj.SquaredError()
    assert o.base_score(y, None) == pytest.approx(float(y.mean()), abs=1e-9)
    ww = np.full_like(y, w)
    assert o.base_score(y, ww) == pytest.approx(float(y.mean()), abs=1e-9)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.floats(-1e6, 1e6, allow_nan=False, width=32),
                min_size=2, max_size=200),
       st.integers(2, 32))
def test_make_cuts_bin_values_invariants(xs, max_bin):
    """Cuts are strictly increasing and cover max; every finite value
    bins into (prev_cut, cut]; NaN maps to the missing bin — the
    SearchBin contract (hist_util.h:122)."""
    x = np.asarray(xs, dtype=np.float64)
    cuts = core.make_cuts(x, max_bin)
    assert np.all(np.diff(cuts) > 0)
    assert cuts[-1] > x.max()                       # final boundary bumped
    b = core.bin_values(x, cuts)
    assert b.min() >= 0 and b.max() < len(cuts)
    lo = np.concatenate([[-np.inf], cuts[:-1]])
    assert np.all(x > lo[b]) and np.all(x <= cuts[b])
    withnan = np.append(x, np.nan)
    bn = core.bin_values(withnan, cuts)
    assert bn[-1] == core.MISSING_BIN


@settings(max_examples=40, deadline=None)
@given(st.lists(st.floats(-1e6, 1e6, allow_nan=False, width=32),
                min_size=4, max_size=200),
       st.integers(2, 16))
def test_binning_preserves_order(xs, max_bin):
    """Quantization is monotone: x1 <= x2 implies bin(x1) <= bin(x2)."""
    x = np.sort(np.asarray(xs, dtype=np.float64))
    cuts = core.make_cuts(x, max_bin)
    b = core.bin_values(x, cuts)
    assert np.all(np.diff(b.astype(np.int32)) >= 0)


@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2),
       st.integers(0, 2 ** 31 - 1))
@settings(max_examples=25, deadline=None)
def test_png_gif_lossless_roundtrip(h, w, kind, seed):
    import numpy as np
    from xgboost_spark.operators.multimodal import (decode_gif, decode_png,
                                                    encode_gif, encode_png)
    rng = np.random.default_rng(seed)
    if kind == 0:        # grayscale PNG
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        assert (decode_png(encode_png(img))[:, :, 0] == img).all()
    elif kind == 1:      # RGB PNG
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert (decode_png(encode_png(img)) == img).all()
    else:                # GIF indices
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        assert (decode_gif(encode_gif(img))[:, :, 0] == img).all()


@given(st.integers(1, 33), st.integers(1, 33), st.booleans(),
       st.integers(0, 2 ** 31 - 1))
@settings(max_examples=15, deadline=None)
def test_jpeg_shape_and_range_invariants(h, w, sub, seed):
    import numpy as np
    from xgboost_spark.operators.jpeg import decode_jpeg, encode_jpeg
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90, subsample=sub))
    assert out.shape == (h, w, 3) and out.dtype == np.uint8
    # lossy, but a CONSTANT image must survive almost exactly
    flat = np.full((h, w, 3), 137, dtype=np.uint8)
    oflat = decode_jpeg(encode_jpeg(flat, quality=90, subsample=sub))
    assert np.abs(oflat.astype(int) - 137).max() <= 4
    # progressive carries the SAME quantized coefficients, so its
    # decode must be pixel-identical to the baseline decode
    from xgboost_spark.operators.jpeg import encode_jpeg_progressive
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=90, subsample=sub))
    assert (prog == out).all()


@settings(max_examples=150, deadline=None)
@given(st.integers(2, 30), st.integers(2, 18),
       st.floats(0.3, 0.95), st.integers(0, 2**31 - 1))
def test_similarity_join_prefix_filter_is_complete(vocab_n, n_docs, t, seed):
    """The pigeonhole guarantee behind operators/dedup.similarity_join:
    under ANY common total token order, two sets with Jaccard >= t must
    share a token inside each side's first |d| - ceil(t*|d|) + 1 tokens
    (AllPairs, Bayardo WWW'07).  Exercises the exact float-ceil prefix
    arithmetic the Spark implementation and its DuckDB oracle use."""
    import math
    from collections import Counter

    rng = np.random.default_rng(seed)
    docs = []
    for _ in range(n_docs):
        k = int(rng.integers(1, vocab_n + 1))
        docs.append(frozenset(rng.choice(vocab_n, size=k).tolist()))
    dfc = Counter(tok for d in docs for tok in d)
    key = lambda x: (dfc[x], x)  # df asc, token asc — the impl's order
    prefixes = []
    for d in docs:
        toks = sorted(d, key=key)
        p = len(d) - math.ceil(t * len(d)) + 1
        prefixes.append(set(toks[: int(p)]))
    for i in range(n_docs):
        for j in range(i + 1, n_docs):
            a, b = docs[i], docs[j]
            jac = len(a & b) / len(a | b)
            if jac >= t:
                assert prefixes[i] & prefixes[j], (sorted(a), sorted(b), t)


# ---------------------------------------------------------------------------
# vectorized traversal vs a scalar replay of the published routing rules
# ---------------------------------------------------------------------------

def _random_tree_arrays(rng, n_feat, max_depth, strict):
    """Random binary tree in the broadcastable-dict layout: thresholds
    drawn float32-exact so strict-mode probes can tie exactly."""
    left, right, feature, split, dflt = [], [], [], [], []

    def grow(depth):
        nid = len(left)
        left.append(-1); right.append(-1)
        feature.append(int(rng.integers(0, n_feat)))
        split.append(float(np.float32(rng.normal() * 10)))
        dflt.append(bool(rng.integers(0, 2)))
        if depth < max_depth and rng.random() < 0.8:
            l = grow(depth + 1)
            r = grow(depth + 1)
            left[nid], right[nid] = l, r
        return nid

    grow(0)
    a = {
        "left": np.array(left, dtype=np.int32),
        "right": np.array(right, dtype=np.int32),
        "feature": np.array(feature, dtype=np.int32),
        "split_value": np.array(split, dtype=np.float64),
        "split_bin": np.zeros(len(left), dtype=np.int32),
        "default_left": np.array(dflt, dtype=bool),
        "leaf_value": np.zeros(len(left), dtype=np.float64),
    }
    if strict:
        a["tie_strict"] = True
    return a


def _scalar_leaf(a, row, strict):
    """Per-row replay of the routing rules: engine '<=' on doubles, or
    the reference predictor's strict float32 '<'
    (src/predictor/predict_fn.h:22) with NaN -> default child."""
    nid = 0
    while a["left"][nid] != -1:
        x = row[a["feature"][nid]]
        if np.isnan(x):
            go_left = a["default_left"][nid]
        elif strict:
            go_left = np.float32(x) < np.float32(a["split_value"][nid])
        else:
            go_left = x <= a["split_value"][nid]
        nid = a["left"][nid] if go_left else a["right"][nid]
    return nid


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 5), st.integers(1, 6), st.booleans(),
       st.integers(0, 10_000))
def test_leaf_ids_match_scalar_routing(n_feat, max_depth, strict, seed):
    rng = np.random.default_rng(seed)
    a = _random_tree_arrays(rng, n_feat, max_depth, strict)
    n = 64
    X = rng.normal(size=(n, n_feat)) * 10
    # force ties: copy node thresholds verbatim into probe cells, plus
    # one-ulp float32 neighbors (above and below) and NaN missings
    th = a["split_value"][a["left"] != -1]
    if len(th):
        pick = rng.integers(0, len(th), size=n // 2)
        X[: n // 2, 0] = th[pick]
        f32 = np.float32(th[pick[: n // 4]])
        X[n // 2: n // 2 + n // 4, 0] = np.nextafter(
            f32, np.float32(np.inf)).astype(np.float64)[: n // 4]
    X[rng.random((n, n_feat)) < 0.15] = np.nan
    got = core.leaf_ids_from_arrays(a, X, binned=False)
    want = np.array([_scalar_leaf(a, X[i], strict) for i in range(n)])
    assert np.array_equal(got, want)
