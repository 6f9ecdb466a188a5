"""Kernel library tests (reference anchors: kernel_functions.hpp
definitions; GenericKernel::Eval vs KernelMatrix self-consistency, the
fast-vs-direct oracle pattern of fmm-wrapper.txx:81)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sctl_tpu.ops import (
    KERNELS, Laplace3D_FxU, Laplace3D_DxU, Laplace3D_FxdU,
    Stokes3D_FxU, Stokes3D_FxUP,
    direct_eval, direct_eval_blocked, kernel_matrix,
)

RNG = np.random.default_rng(0)


def _rand_problem(nt=37, ns=53, kdim0=1):
    xt = RNG.normal(size=(nt, 3))
    xs = RNG.normal(size=(ns, 3)) + 5.0  # separated clusters
    nrm = RNG.normal(size=(ns, 3))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    f = RNG.normal(size=(ns, kdim0))
    return map(jnp.asarray, (xt, xs, nrm, f))


@pytest.mark.parametrize("name", list(KERNELS))
def test_apply_matches_matrix(name):
    """apply_pairwise (MXU form) == dense matrix contraction for every
    kernel in the library."""
    ker = KERNELS[name]
    xt, xs, nrm, f = _rand_problem(kdim0=ker.kdim0)
    u_fast = direct_eval(ker, xt, xs, f, ns=nrm)
    m = kernel_matrix(ker, xt, xs, ns=nrm)       # (S*k0, T*k1)
    u_ref = (np.asarray(f).reshape(1, -1) @ np.asarray(m)).reshape(
        xt.shape[0], ker.kdim1)
    np.testing.assert_allclose(np.asarray(u_fast), u_ref, rtol=1e-10,
                               atol=1e-12)


@pytest.mark.parametrize("name", list(KERNELS))
def test_blocked_matches_single(name):
    ker = KERNELS[name]
    xt, xs, nrm, f = _rand_problem(nt=173, ns=211, kdim0=ker.kdim0)
    u1 = direct_eval(ker, xt, xs, f, ns=nrm)
    u2 = direct_eval_blocked(ker, xt, xs, f, ns=nrm, block_t=64,
                             block_s=32)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u1),
                               rtol=1e-12, atol=1e-13)


def test_laplace_point_charge():
    """Closed form: unit charge at origin -> u = 1/(4 pi r)."""
    xt = jnp.asarray([[1.0, 0, 0], [0, 2.0, 0], [1.0, 1.0, 1.0]])
    xs = jnp.zeros((1, 3))
    f = jnp.ones((1, 1))
    u = direct_eval(Laplace3D_FxU, xt, xs, f)
    r = np.linalg.norm(np.asarray(xt), axis=1)
    np.testing.assert_allclose(np.asarray(u)[:, 0],
                               1 / (4 * np.pi * r), rtol=1e-12)


def test_laplace_gradient_consistency():
    """FxdU == finite-difference gradient of FxU."""
    xs = jnp.asarray(RNG.normal(size=(5, 3)))
    f = jnp.asarray(RNG.normal(size=(5, 1)))
    x0 = jnp.asarray([[3.0, 1.0, -2.0]])
    h = 1e-5
    grad_fd = []
    for d in range(3):
        e = np.zeros(3)
        e[d] = h
        up = direct_eval(Laplace3D_FxU, x0 + e, xs, f)
        dn = direct_eval(Laplace3D_FxU, x0 - e, xs, f)
        grad_fd.append(float((up - dn)[0, 0]) / (2 * h))
    # note FxdU scale factor is -1/4pi: u = -grad(1/4pi r) => FxdU IS the
    # gradient of the FxU potential
    g = direct_eval(Laplace3D_FxdU, x0, xs, f)
    np.testing.assert_allclose(np.asarray(g)[0], grad_fd, rtol=1e-6)


def test_laplace_double_layer_jump():
    """Gauss identity: DL of constant density over a closed surface is
    -1 inside, 0 outside (with the 1/4pi scale and r = xt-xs, n
    outward)."""
    # sphere quadrature: uniform points + equal weights (crude; use many)
    n = 20000
    pts = RNG.normal(size=(n, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    area_w = 4 * np.pi / n
    xs = jnp.asarray(pts)
    nrm = jnp.asarray(pts)  # outward normal of unit sphere
    f = jnp.full((n, 1), area_w)
    inside = jnp.asarray([[0.1, 0.05, -0.02]])
    outside = jnp.asarray([[2.5, 0.3, 0.4]])
    ui = float(direct_eval(Laplace3D_DxU, inside, xs, f, ns=nrm)[0, 0])
    uo = float(direct_eval(Laplace3D_DxU, outside, xs, f, ns=nrm)[0, 0])
    assert abs(ui - (-1.0)) < 2e-2, ui
    assert abs(uo) < 2e-2, uo


def test_stokeslet_divergence_free():
    """Stokes velocity field is divergence-free away from sources."""
    xs = jnp.asarray(RNG.normal(size=(4, 3)))
    f = jnp.asarray(RNG.normal(size=(4, 3)))
    x0 = np.array([2.0, -1.0, 3.0])
    h = 1e-5
    div = 0.0
    for d in range(3):
        e = np.zeros(3)
        e[d] = h
        up = direct_eval(Stokes3D_FxU, jnp.asarray([x0 + e]), xs, f)
        dn = direct_eval(Stokes3D_FxU, jnp.asarray([x0 - e]), xs, f)
        div += float((up - dn)[0, d]) / (2 * h)
    assert abs(div) < 1e-6


def test_stokes_fxup_matches_fxu():
    """FxUP velocity components == FxU velocity."""
    xt, xs, nrm, f = _rand_problem(kdim0=3)
    u = direct_eval(Stokes3D_FxU, xt, xs, f)
    up = direct_eval(Stokes3D_FxUP, xt, xs, f)
    np.testing.assert_allclose(np.asarray(up)[:, :3], np.asarray(u),
                               rtol=1e-12)


def test_self_interaction_masked():
    """Coincident target/source contributes zero (masked rsqrt)."""
    xs = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0]])
    f = jnp.ones((2, 1))
    u = direct_eval(Laplace3D_FxU, xs, xs, f)
    # each point sees only the other: 1/(4 pi * 1)
    np.testing.assert_allclose(np.asarray(u)[:, 0],
                               [1 / (4 * np.pi)] * 2, rtol=1e-12)


def test_flop_counter_credit():
    import sctl_tpu
    from sctl_tpu.profile import Profile
    Profile.reset()
    xt, xs, nrm, f = _rand_problem(nt=10, ns=20, kdim0=1)
    direct_eval(Laplace3D_FxU, xt, xs, f)
    assert Profile.get_counter("FLOP") == 10 * 20 * 6
