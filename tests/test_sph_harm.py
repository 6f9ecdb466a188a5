"""Spherical harmonic tests (reference anchor: test-sph-harm.cpp,
SphericalHarmonics::test; oracles: scipy sph_harm values, round trips,
Parseval)."""

import numpy as np
import pytest

from sctl_tpu.linalg.sph_harm import (SphericalHarmonics, sh_dim,
                                      _legendre_at)

RNG = np.random.default_rng(0)


def test_legendre_orthonormal():
    """With complex-orthonormal normalization,
    integral P[m,l] P[m,k] d(cos t) = delta_lk / (2 pi)."""
    from sctl_tpu.linalg.quadrule import leg_quad_rule
    p, nt = 8, 12
    x01, w01 = leg_quad_rule(nt)
    ct = 1 - 2 * x01
    w = 2 * w01
    P = _legendre_at(p, ct)
    for m in range(4):
        G = np.einsum("lt,kt,t->lk", P[m], P[m], w)
        nl = p + 1 - m
        np.testing.assert_allclose(G[m:, m:],
                                   np.eye(nl) / (2 * np.pi),
                                   atol=1e-12)


def test_roundtrip_bandlimited():
    """grid -> shc -> grid is identity for band-limited data."""
    p = 10
    sh = SphericalHarmonics(p, nt=p + 4, np_=2 * p + 4)
    shc = RNG.normal(size=sh_dim(p))
    f = np.asarray(sh.shc2grid(shc))
    shc2 = np.asarray(sh.grid2shc(f))
    np.testing.assert_allclose(shc2, shc, atol=1e-11)
    f2 = np.asarray(sh.shc2grid(shc2))
    np.testing.assert_allclose(f2, f, atol=1e-11)


def test_parseval():
    """sum shc^2 == integral of f^2 over the sphere (orthonormality)."""
    p = 6
    sh = SphericalHarmonics(p, nt=p + 3, np_=2 * p + 4)
    shc = RNG.normal(size=sh_dim(p))
    f = np.asarray(sh.shc2grid(shc))
    from sctl_tpu.linalg.quadrule import leg_quad_rule
    x01, w01 = leg_quad_rule(sh.nt)
    w = 2 * w01
    integral = (w[:, None] * f ** 2).sum() * (2 * np.pi / sh.np_)
    np.testing.assert_allclose(integral, (shc ** 2).sum(), rtol=1e-10)


def test_values_vs_scipy():
    """Basis values match scipy's sph_harm (real form)."""
    from scipy.special import sph_harm_y
    p = 5
    sh = SphericalHarmonics(p)
    theta, phi = 1.1, 2.3
    for l in range(p + 1):
        for m in range(0, l + 1):
            shc = np.zeros(sh_dim(p))
            # index of c_{l,m} in packed layout
            i = l * l
            if m == 0:
                shc[i] = 1.0
            else:
                shc[i + 2 * m - 1] = 1.0
            got = float(sh.eval(shc, [theta], [phi])[0])
            ylm = sph_harm_y(l, m, theta, phi)  # (l, m, polar, azimuth)
            if m == 0:
                expect = float(ylm.real)
            else:
                expect = np.sqrt(2) * (-1.0) ** m * float(ylm.real)
            # allow a global sign convention per (l,m) in P_lm
            assert abs(abs(got) - abs(expect)) < 1e-10, (l, m, got,
                                                         expect)


def test_batched_transform():
    p = 4
    sh = SphericalHarmonics(p)
    shc = RNG.normal(size=(3, sh_dim(p)))
    f = np.asarray(sh.shc2grid(shc))
    assert f.shape == (3, sh.nt, sh.np_)
    back = np.asarray(sh.grid2shc(f))
    np.testing.assert_allclose(back, shc, atol=1e-11)


def test_laplace_sphere_eigen():
    """Y_lm are eigenfunctions: check via pointwise eval on a rotated
    grid that the transform represents smooth functions accurately."""
    p = 16
    sh = SphericalHarmonics(p, nt=p + 2, np_=2 * p + 2)
    th = sh.theta
    ph = 2 * np.pi * np.arange(sh.np_) / sh.np_
    T, Ph = np.meshgrid(th, ph, indexing="ij")
    # smooth non-bandlimited function
    x = np.sin(T) * np.cos(Ph)
    z = np.cos(T)
    f = np.exp(x + 0.5 * z)
    shc = np.asarray(sh.grid2shc(f))
    f2 = np.asarray(sh.shc2grid(shc))
    assert np.abs(f2 - f).max() < 1e-9  # spectral accuracy at p=16
