"""Tensor-Chebyshev basis tests (reference anchor: cheb_utils.hpp
ChebBasis approx/eval/grad/integ)."""

import numpy as np
import pytest

from sctl_tpu.linalg import cheb


def f3(x):
    return np.sin(2 * x[:, 0]) * np.exp(x[:, 1]) + x[:, 2] ** 3


def test_approx_eval_3d():
    q = 12
    box = [(0, 1), (-1, 1), (0.5, 2)]
    pts = cheb.cheb_nodes(q, box)
    coeffs = cheb.approx(f3(pts), q, 3)
    rng = np.random.default_rng(0)
    test_pts = np.stack([rng.uniform(lo, hi, 50)
                         for lo, hi in box], axis=-1)
    got = cheb.evaluate(coeffs, q, test_pts, box)
    np.testing.assert_allclose(got, f3(test_pts), atol=1e-9)


def test_grad():
    q = 14
    box = [(0, 1), (0, 1)]
    pts = cheb.cheb_nodes(q, box)
    f = lambda x: np.sin(3 * x[:, 0]) * np.cos(2 * x[:, 1])
    coeffs = cheb.approx(f(pts), q, 2)
    g = cheb.grad_coeffs(coeffs, q, box)
    rng = np.random.default_rng(1)
    tp = rng.uniform(0.1, 0.9, size=(30, 2))
    gx = cheb.evaluate(g[0], q, tp, box)
    gy = cheb.evaluate(g[1], q, tp, box)
    np.testing.assert_allclose(
        gx, 3 * np.cos(3 * tp[:, 0]) * np.cos(2 * tp[:, 1]), atol=1e-8)
    np.testing.assert_allclose(
        gy, -2 * np.sin(3 * tp[:, 0]) * np.sin(2 * tp[:, 1]), atol=1e-8)


def test_integrate():
    q = 16
    box = [(0, 2), (0, 1)]
    pts = cheb.cheb_nodes(q, box)
    f = lambda x: np.exp(x[:, 0]) * x[:, 1]
    coeffs = cheb.approx(f(pts), q, 2)
    got = cheb.integrate(coeffs, q, box)
    exact = (np.exp(2) - 1) * 0.5
    assert abs(got - exact) < 1e-11


def test_vector_valued():
    q = 8
    box = [(0, 1)]
    pts = cheb.cheb_nodes(q, box)
    vals = np.stack([pts[:, 0] ** 2, np.cos(pts[:, 0])], axis=1)
    coeffs = cheb.approx(vals, q, 1)
    tp = np.linspace(0.05, 0.95, 9)[:, None]
    got = cheb.evaluate(coeffs, q, tp, box)
    np.testing.assert_allclose(got[:, 0], tp[:, 0] ** 2, atol=1e-12)
    np.testing.assert_allclose(got[:, 1], np.cos(tp[:, 0]), atol=1e-10)
