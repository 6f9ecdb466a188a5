"""Quadrature + Lagrange tests (reference anchors: test-quadrule.cpp,
InterpQuadRule::test quadrule.hpp:190, lagrange-interp test)."""

import numpy as np
import pytest

from sctl_tpu.linalg import (cheb_quad_rule, leg_quad_rule,
                             InterpQuadRule, interpolation_matrix,
                             derivative_matrix)
from sctl_tpu.linalg.quadrule import leg_poly


@pytest.mark.parametrize("n", [2, 5, 16, 33])
def test_leg_quad_exactness(n):
    """GL of order n integrates polynomials up to degree 2n-1 on [0,1]."""
    x, w = leg_quad_rule(n)
    for d in range(2 * n):
        exact = 1.0 / (d + 1)
        got = np.sum(w * x ** d)
        assert abs(got - exact) < 1e-14 * (d + 1), (n, d)


@pytest.mark.parametrize("n", [2, 5, 16, 33])
def test_cheb_quad_exactness(n):
    """Clenshaw-Curtis of n points integrates degree n-1 exactly."""
    x, w = cheb_quad_rule(n)
    assert abs(np.sum(w) - 1.0) < 1e-14
    for d in range(n):
        exact = 1.0 / (d + 1)
        got = np.sum(w * x ** d)
        assert abs(got - exact) < 1e-13, (n, d, got, exact)


def test_leg_poly():
    x = np.linspace(-1, 1, 11)
    P, dP = leg_poly(x, 4)
    np.testing.assert_allclose(P[2], 0.5 * (3 * x ** 2 - 1), atol=1e-14)
    np.testing.assert_allclose(P[3], 0.5 * (5 * x ** 3 - 3 * x),
                               atol=1e-14)
    np.testing.assert_allclose(dP[3], 0.5 * (15 * x ** 2 - 3),
                               atol=1e-13)


def test_lagrange_interp():
    src = np.cos(np.pi * np.arange(8) / 7)  # cheb nodes
    trg = np.linspace(-1, 1, 25)
    M = interpolation_matrix(src, trg)
    f = lambda x: x ** 5 - 2 * x ** 3 + x   # degree 5 < 8: exact
    np.testing.assert_allclose(f(src) @ M, f(trg), atol=1e-12)


def test_lagrange_interp_dd():
    src = np.cos(np.pi * np.arange(12) / 11)
    trg = np.linspace(-1, 1, 7)
    M64 = interpolation_matrix(src, trg)
    Mdd = interpolation_matrix(src, trg, dd=True)
    np.testing.assert_allclose(Mdd, M64, atol=1e-10)
    f = lambda x: x ** 9
    np.testing.assert_allclose(f(src) @ Mdd, f(trg), atol=1e-12)


def test_derivative_matrix():
    n = 12
    src = np.cos(np.pi * np.arange(n) / (n - 1))
    D = derivative_matrix(src)
    f = src ** 6
    df = 6 * src ** 5
    np.testing.assert_allclose(f @ D, df, atol=1e-9)


def test_interp_quad_rule_log_singularity():
    """Reference's InterpQuadRule::test pattern: build a quadrature for
    functions with log singularity {x^k, x^k log(x)} on (0,1); verify it
    integrates them to the requested accuracy with far fewer nodes than
    the adaptive discretization."""
    K = 8

    def integrands(x):
        x = np.asarray(x)
        cols = [x ** k for k in range(K)]
        cols += [x ** k * np.log(x) for k in range(K)]
        return np.stack(cols, axis=1)

    nds, wts, cond = InterpQuadRule.build(integrands, 0.0, 1.0,
                                          eps=1e-12)
    assert len(nds) <= 2 * K
    assert cond < 1e4
    # exact integrals: x^k -> 1/(k+1); x^k log x -> -1/(k+1)^2
    for k in range(K):
        got = np.sum(wts * nds ** k)
        assert abs(got - 1 / (k + 1)) < 1e-10, ("poly", k, got)
        got = np.sum(wts * nds ** k * np.log(nds))
        assert abs(got + 1 / (k + 1) ** 2) < 1e-10, ("log", k, got)


def test_interp_quad_rule_order_cap():
    def integrands(x):
        x = np.asarray(x)
        return np.stack([x ** k for k in range(12)], axis=1)

    nds, wts, cond = InterpQuadRule.build(integrands, 0.0, 1.0,
                                          eps=1e-14, order=6)
    assert len(nds) == 6
