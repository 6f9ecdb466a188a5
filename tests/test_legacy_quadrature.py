"""Legacy boundary-quadrature layer (bie/legacy_quadrature.py) vs the
reference Quadrature test anchors (boundary_quadrature.hpp:1584
Green/Gauss-identity driver; DuffyQuad :269; Basis :39)."""

import numpy as np
import pytest

from sctl_tpu.bie.legacy_quadrature import (
    TensorBasis, duffy_quad, tensor_gauss_quad, BasisElemList,
    LegacyQuadrature)
from sctl_tpu.bie.patches import sphere_patches
from sctl_tpu.ops import Laplace3D_DxU


def test_tensor_basis_identity_and_grad():
    b = TensorBasis(6, 2)
    E = b.eval_matrix(b.nodes())
    np.testing.assert_allclose(E, np.eye(b.size), atol=1e-12)
    # interpolation + gradient of a polynomial is exact
    nds = b.nodes()
    vals = nds[0] ** 3 * nds[1] + 2 * nds[1] ** 2     # (size,)
    pts = np.random.default_rng(0).random((2, 17))
    Ep = b.eval_matrix(pts)
    np.testing.assert_allclose(vals @ Ep,
                               pts[0] ** 3 * pts[1] + 2 * pts[1] ** 2,
                               atol=1e-11)
    Du, Dv = b.grad_matrices(pts)
    np.testing.assert_allclose(vals @ Du,
                               3 * pts[0] ** 2 * pts[1], atol=1e-10)
    np.testing.assert_allclose(vals @ Dv,
                               pts[0] ** 3 + 4 * pts[1], atol=1e-10)


def test_tensor_gauss_exact():
    nds, wts = tensor_gauss_quad(6)
    val = np.sum(wts * nds[:, 0] ** 4 * nds[:, 1] ** 5)
    np.testing.assert_allclose(val, (1 / 5) * (1 / 6), rtol=1e-13)


def test_duffy_smooth_matches_gauss():
    """On a smooth integrand the shell rule reproduces the integral."""
    nds, wts = duffy_quad([0.3, 0.4], 12)
    val = np.sum(wts * np.cos(nds[:, 0]) * np.exp(nds[:, 1]))
    ref_n, ref_w = tensor_gauss_quad(20)
    ref = np.sum(ref_w * np.cos(ref_n[:, 0]) * np.exp(ref_n[:, 1]))
    np.testing.assert_allclose(val, ref, rtol=1e-10)


def test_duffy_singular_convergence():
    """1/|x-c| over the unit square: geometric shells resolve the
    singularity — two orders agree to ~1e-10 (a plain Gauss rule is
    ~1e-3 off)."""
    c = np.array([0.3, 0.4])

    def quad(order):
        nds, wts = duffy_quad(c, order)
        r = np.linalg.norm(nds - c, axis=1)
        return np.sum(wts / np.maximum(r, 1e-300))

    v16, v22 = quad(16), quad(22)
    assert abs(v16 - v22) < 1e-9, (v16, v22)
    gn, gw = tensor_gauss_quad(16)
    gv = np.sum(gw / np.linalg.norm(gn - c, axis=1))
    assert abs(gv - v22) > 1e-4       # the singularity is real


def test_duffy_off_square_adapt():
    """With the singular point OFF the square (near-singular case) and
    an adapt floor, the rule still integrates 1/r accurately."""
    c = np.array([0.5, 1.08])

    def quad(order):
        nds, wts = duffy_quad(c, order, adapt=0.08)
        r = np.linalg.norm(nds - c, axis=1)
        return np.sum(wts / r)

    assert abs(quad(16) - quad(22)) < 1e-9


def _sphere_elems(order=8):
    return BasisElemList.discretize(
        order, sphere_patches(n_per_face=1, q=6).charts)


def test_legacy_gauss_identity_on_surface():
    """DL[1] = -1/2 on-surface (principal value; reference
    Quadrature::test anchor, exterior normals, 1/4pi scale)."""
    elems = _sphere_elems(order=8)
    quad = LegacyQuadrature(Laplace3D_DxU, elems,
                            order_singular=12, order_direct=8)
    quad.setup(None)
    sigma = np.ones((elems.n_elem, elems.basis.size, 1))
    u = quad.eval(sigma)
    err = np.abs(u[:, 0] + 0.5).max()
    assert err < 2e-4, err


def test_legacy_gauss_identity_near_targets():
    """DL[1] = -1 at interior points NEAR the surface (near-singular
    corrections) and 0 outside."""
    elems = _sphere_elems(order=8)
    quad = LegacyQuadrature(Laplace3D_DxU, elems,
                            order_singular=12, order_direct=8)
    xt = np.array([[0.0, 0.0, 0.9],       # near-inside
                   [0.55, 0.55, 0.55],    # near-inside (corner dir)
                   [0.0, 0.0, 0.2],       # deep inside
                   [0.0, 1.4, 0.0]])      # outside
    quad.setup(xt)
    sigma = np.ones((elems.n_elem, elems.basis.size, 1))
    u = quad.eval(sigma)[:, 0]
    assert np.abs(u[:3] + 1.0).max() < 2e-4, u
    assert abs(u[3]) < 2e-4, u


def test_legacy_stokes_gauss_identity():
    """Stokes DL of a constant (rigid translation) density = -u0/2
    on-surface, componentwise (k0=3 kernel path; reference
    Quadrature::test anchor)."""
    from sctl_tpu.ops import Stokes3D_DxU
    elems = _sphere_elems(order=6)
    quad = LegacyQuadrature(Stokes3D_DxU, elems,
                            order_singular=12, order_direct=8)
    quad.setup(None)
    u0 = np.array([0.3, -1.1, 0.7])
    sigma = np.broadcast_to(
        u0, (elems.n_elem, elems.basis.size, 3)).copy()
    u = quad.eval(sigma)
    err = np.abs(u + 0.5 * u0[None, :]).max() / np.abs(u0).max()
    assert err < 5e-3, err
