"""Double-double arithmetic tests (QuadReal replacement; reference anchor:
math_utils.hpp:236-300 QuadReal operator coverage)."""

import numpy as np

from sctl_tpu import quadmath as qm


def test_dd_add_exactness():
    a = qm.DD(1.0)
    b = qm.DD(1e-25)
    c = a + b - a
    assert abs(float(c.hi) - 1e-25) < 1e-40


def test_dd_mul_div():
    x = qm.DD(np.pi)
    y = x * x / x
    assert abs(float((y - x).to_float64())) < 1e-30


def test_dd_sqrt():
    two = qm.DD(2.0)
    r = qm.dd_sqrt(two)
    err = (r * r - two).to_float64()
    assert abs(float(err)) < 1e-30


def test_dd_pi_sin_cos():
    pi = qm.dd_pi()
    s = qm.dd_sin(pi / qm.DD(6.0))
    assert abs(float((s - qm.DD(0.5)).to_float64())) < 1e-30
    c = qm.dd_cos(pi / qm.DD(3.0))
    assert abs(float((c - qm.DD(0.5)).to_float64())) < 1e-30
    # vectorized
    k = np.arange(8, dtype=np.float64)
    ang = qm.dd_mul(qm.DD(k), qm.dd_div(pi, qm.DD(4.0)))
    s, c = qm._dd_sincos(ang)
    ref_s, ref_c = np.sin(k * np.pi / 4), np.cos(k * np.pi / 4)
    np.testing.assert_allclose(s.to_float64(), ref_s, atol=1e-15)
    np.testing.assert_allclose(c.to_float64(), ref_c, atol=1e-15)


def test_dd_powi():
    x = qm.DD(1.0, 1e-16)  # 1+e, not representable in a single f64
    y = qm.dd_powi(x, 10)
    # (1+e)^10 = 1 + 10e + 45e^2 + ...; the 10e term is invisible in f64
    # arithmetic relative to 1 but must be exact in DD.
    resid = y - qm.DD(1.0) - qm.DD(1e-15)
    assert abs(float(resid.to_float64())) < 1e-29


def test_dd_solve():
    rng = np.random.default_rng(0)
    n = 8
    A = qm.DD(rng.normal(size=(n, n)))
    x_true = qm.DD(rng.normal(size=(n, 1)))
    b = qm.dd_matmul(A, x_true)
    x = qm.dd_solve(A, b)
    err = np.abs((x - x_true).to_float64()).max()
    assert err < 1e-25


def test_dd_compare():
    a = qm.DD(1.0, 1e-20)
    b = qm.DD(1.0, 0.0)
    assert bool(a > b) and bool(b < a) and not bool(a == b)


def test_mathutils():
    from sctl_tpu import mathutils as mu
    import jax.numpy as jnp
    assert mu.significant_bits(jnp.float64) == 53
    assert mu.significant_bits(qm.DD) == 104
    assert abs(float(mu.const_pi(jnp.float64)) - np.pi) < 1e-15
    v = mu.atoreal("0.1", qm.DD)
    assert abs(float((v * qm.DD(10.0) - qm.DD(1.0)).to_float64())) < 1e-30
