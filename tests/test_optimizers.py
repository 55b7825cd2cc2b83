"""Optimizer tests: exact parity with the reference update formulas.

Each optimizer is run for several random gradient steps and compared against
a NumPy transcription of the reference's Eigen expressions
(Adam.hpp:75-96, AdaGrad.hpp:60-65, RMSProp.hpp:71-73).
"""

import numpy as np
import pytest

from svgdcpp_tpu import AdaGrad, Adam, RMSProp, SVGDError

DIM, N = 3, 5
LR, EPS = 0.1, 1e-8


def run_steps(opt, grads):
    state = opt.init(np.float64)
    out = []
    for g in grads:
        state, inc = opt.step(state, g)
        out.append(np.asarray(inc))
    return out


def test_adagrad_matches_reference(rng):
    grads = [rng.normal(size=(N, DIM)) for _ in range(5)]
    incs = run_steps(AdaGrad(DIM, N, LR, EPS), grads)
    s = np.zeros((N, DIM))
    for g, inc in zip(grads, incs):
        s += g * g
        expected = LR * g / (EPS + np.sqrt(s))
        np.testing.assert_allclose(inc, expected, rtol=1e-12)


def test_rmsprop_matches_reference(rng):
    beta = 0.9
    grads = [rng.normal(size=(N, DIM)) for _ in range(5)]
    incs = run_steps(RMSProp(DIM, N, LR, beta, EPS), grads)
    s = np.zeros((N, DIM))
    for g, inc in zip(grads, incs):
        s = beta * s + (1 - beta) * g * g
        expected = LR * g / (EPS + np.sqrt(s))
        np.testing.assert_allclose(inc, expected, rtol=1e-12)


def test_adam_matches_reference(rng):
    b1, b2 = 0.9, 0.999
    grads = [rng.normal(size=(N, DIM)) for _ in range(5)]
    incs = run_steps(Adam(DIM, N, LR, b1, b2, EPS), grads)
    m = np.zeros((N, DIM))
    v = np.zeros((N, DIM))
    for t, (g, inc) in enumerate(zip(grads, incs), start=1):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        m_hat = m / (1 - b1**t)
        v_hat = v / (1 - b2**t)
        # epsilon BEFORE the sqrt'd v_hat — the reference's exact form
        # (Adam.hpp:82)
        expected = LR * m_hat / (EPS + np.sqrt(v_hat))
        np.testing.assert_allclose(inc, expected, rtol=1e-12)


def test_adam_rejects_bad_betas():
    with pytest.raises(SVGDError):
        Adam(DIM, N, LR, 1.0, 0.999)
    with pytest.raises(SVGDError):
        Adam(DIM, N, LR, 0.9, -0.1)


def test_rmsprop_rejects_bad_beta():
    with pytest.raises(SVGDError):
        RMSProp(DIM, N, LR, 1.5)


def test_stateful_oo_api(rng):
    # Initialize/Step parity surface (reference Optimizer.hpp:40-42)
    opt = AdaGrad(DIM, N, LR, EPS)
    opt.Initialize()
    g = rng.normal(size=(N, DIM))
    inc = np.asarray(opt.Step(g))
    expected = LR * g / (EPS + np.sqrt(g * g))
    np.testing.assert_allclose(inc, expected, rtol=1e-12)
