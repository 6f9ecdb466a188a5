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


def _exact_gemm_fractions(A_fr, B_fr):
    """Exact rational matmul of Fraction matrices (lists of lists)."""
    m, k = len(A_fr), len(A_fr[0])
    n = len(B_fr[0])
    return [[sum(A_fr[i][l] * B_fr[l][j] for l in range(k))
             for j in range(n)] for i in range(m)]


def test_ld_gemm_vs_exact_f64():
    """ld_gemm on f64 inputs with WIDE per-row dynamic range vs an
    exact rational reference (ADVICE r4: ld_gemm was dead code with
    no coverage; accuracy is normwise ~1e-27)."""
    from fractions import Fraction
    rng = np.random.default_rng(3)
    m, k, n = 12, 20, 9
    A = rng.normal(size=(m, k)) * np.exp2(
        rng.integers(-200, 200, size=(m, 1)).astype(np.float64))
    B = rng.normal(size=(k, n)) * np.exp2(
        rng.integers(-200, 200, size=(1, n)).astype(np.float64))
    C = qm.ld_gemm(A, B)
    A_fr = [[Fraction(float(A[i, l])) for l in range(k)]
            for i in range(m)]
    B_fr = [[Fraction(float(B[l, j])) for j in range(n)]
            for l in range(k)]
    C_ex = _exact_gemm_fractions(A_fr, B_fr)
    # accumulation is DD-exact to ~2^-94 normwise; the returned
    # LONGDOUBLE rounds each entry at 2^-64 of its own magnitude
    for i in range(m):
        row_scale = max(abs(float(C_ex[i][j])) for j in range(n))
        for j in range(n):
            err = abs(float(Fraction(float(np.float64(C[i, j])))
                            + Fraction(float(np.float64(
                                C[i, j] - np.float64(C[i, j]))))
                            - C_ex[i][j]))
            tol = 2.5e-19 * abs(float(C_ex[i][j])) + 1e-25 * row_scale
            assert err <= tol, (i, j, err / row_scale)


def test_ld_gemm_longdouble_inputs():
    """ld_gemm with LONGDOUBLE inputs (hi+lo split path) vs exact
    rationals: the cross terms must carry the low parts."""
    from fractions import Fraction
    rng = np.random.default_rng(4)
    m, k, n = 8, 16, 7
    Ah = rng.normal(size=(m, k))
    Al = rng.normal(size=(m, k)) * 1e-18
    Bh = rng.normal(size=(k, n))
    Bl = rng.normal(size=(k, n)) * 1e-18
    A = Ah.astype(np.longdouble) + Al.astype(np.longdouble)
    B = Bh.astype(np.longdouble) + Bl.astype(np.longdouble)
    C = qm.ld_gemm(A, B)

    def ld_fr(x):          # exact Fraction of one longdouble value
        hi = np.float64(x)
        lo = np.float64(x - np.longdouble(hi))
        return Fraction(float(hi)) + Fraction(float(lo))

    A_fr = [[ld_fr(A[i, l]) for l in range(k)] for i in range(m)]
    B_fr = [[ld_fr(B[l, j]) for j in range(n)] for l in range(k)]
    C_ex = _exact_gemm_fractions(A_fr, B_fr)
    scale = max(abs(float(C_ex[i][j]))
                for i in range(m) for j in range(n))
    for i in range(m):
        for j in range(n):
            hi = np.float64(C[i, j])
            lo = np.float64(C[i, j] - np.longdouble(hi))
            err = abs(float(Fraction(float(hi)) + Fraction(float(lo))
                            - C_ex[i][j]))
            # accumulation error ~1e-27 normwise; the longdouble
            # OUTPUT rounds at 2^-64 of each entry's own magnitude
            tol = 1.2e-19 * abs(float(C_ex[i][j])) + 1e-24 * scale
            assert err <= tol, (i, j, err / scale)


def test_ld_gemm_range_guard():
    """Row scales outside the exact-split range are rejected."""
    import pytest
    A = np.full((2, 4), 2.0**995)
    B = np.eye(4)
    with pytest.raises(AssertionError):
        qm.ld_gemm(A, B)
