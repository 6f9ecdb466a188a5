"""Device near-quadrature engine vs the host path (bie/near_device.py).

The engine re-implements the host near-singular assembly
(patches.near_interac_batch + the far-quadrature subtraction,
reference boundary_integral.txx:816+) as device programs.  On the f64
CPU backend the two paths evaluate the SAME quadrature definitions, so
they must agree to arithmetic accuracy except on the small set of
pairs whose two-order disagreement decision flips at the threshold
boundary (those resolve through different fallback rungs — both
tol-accurate by construction).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sctl_tpu.bie import (BoundaryIntegralOp, sphere_patches,
                          torus_patches)
from sctl_tpu.bie.near_device import (TorusGeom, SphereGeom,
                                      _seg_matmul, _basis_dev)
from sctl_tpu.ops import Stokes3D_DxU, Laplace3D_DxU


def _rel_fd_geom(lst, geom, eids, u0, duv):
    """Host-FD oracle for DeviceGeom.delta."""
    P, M = duv.shape[:2]
    e_rep = np.repeat(eids, M)
    uv0 = np.repeat(u0, M, axis=0)
    uv1 = uv0 + duv.reshape(-1, 2)
    X1, n1, J1 = lst._geom_many(e_rep, uv1)
    X0 = lst._xyz_many(e_rep, uv0)
    dX, n, J = geom.delta(jnp.asarray(eids), jnp.asarray(u0),
                          jnp.asarray(duv))
    return (np.asarray(dX).reshape(-1, 3), X1 - X0,
            np.asarray(n).reshape(-1, 3), n1,
            np.asarray(J).reshape(-1), J1)


def test_torus_geom_delta_matches_chart():
    lst = torus_patches(nu=6, nv=3, q=4, R=2.0, r=0.5)
    geom = lst.device_geom
    assert isinstance(geom, TorusGeom)
    rng = np.random.default_rng(3)
    eids = rng.integers(0, lst.size(), 40)
    u0 = rng.random((40, 2))
    duv = rng.normal(scale=1e-3, size=(40, 7, 2))
    dX, dX_ref, n, n_ref, J, J_ref = _rel_fd_geom(
        lst, geom, eids, u0, duv)
    # exact-difference chart vs direct difference (f64: both exact)
    assert np.abs(dX - dX_ref).max() < 1e-12
    # analytic normal/Jacobian vs FD (h=1e-6 -> ~1e-9 FD error)
    assert np.abs(n - n_ref).max() < 1e-7
    assert np.abs(J / J_ref - 1).max() < 1e-7


def test_sphere_geom_delta_matches_chart():
    lst = sphere_patches(n_per_face=2, q=4)
    geom = lst.device_geom
    assert isinstance(geom, SphereGeom)
    rng = np.random.default_rng(4)
    eids = rng.integers(0, lst.size(), 40)
    u0 = rng.random((40, 2))
    duv = rng.normal(scale=1e-3, size=(40, 7, 2))
    dX, dX_ref, n, n_ref, J, J_ref = _rel_fd_geom(
        lst, geom, eids, u0, duv)
    assert np.abs(dX - dX_ref).max() < 1e-12
    assert np.abs(n - n_ref).max() < 1e-7
    assert np.abs(J / J_ref - 1).max() < 1e-7


def test_seg_matmul_is_a_reassociation():
    rng = np.random.default_rng(0)
    bw = jnp.asarray(rng.normal(size=(3, 5, 1500)))
    blk = jnp.asarray(rng.normal(size=(3, 1500, 4)))
    a = np.asarray(_seg_matmul(bw, blk))
    b = np.asarray(jnp.matmul(bw, blk))
    assert np.abs(a - b).max() < 1e-10 * np.abs(b).max()


def test_basis_dev_matches_interpolation_matrix():
    from sctl_tpu.linalg.lagrange import interpolation_matrix
    x1 = np.polynomial.legendre.leggauss(5)[0] * 0.5 + 0.5
    rng = np.random.default_rng(1)
    uv = rng.random((11, 2))
    dev = np.asarray(_basis_dev(x1, jnp.asarray(uv), jnp.float64))
    mu = interpolation_matrix(x1, uv[:, 0])
    mv = interpolation_matrix(x1, uv[:, 1])
    ref = (mu.T[:, :, None] * mv.T[:, None, :]).reshape(11, 25)
    assert np.abs(dev - ref).max() < 1e-11
    # exact node hit: the guard keeps the row bounded and ~exact
    uv_hit = np.array([[x1[2], 0.3]])
    dev_h = np.asarray(_basis_dev(x1, jnp.asarray(uv_hit),
                                  jnp.float64))
    mu = interpolation_matrix(x1, uv_hit[:, 0])
    mv = interpolation_matrix(x1, uv_hit[:, 1])
    ref_h = (mu.T[:, :, None] * mv.T[:, None, :]).reshape(1, 25)
    assert np.abs(dev_h - ref_h).max() < 1e-8


def _near_mats_of(lst_factory, kernel, tol, force_dev):
    op = BoundaryIntegralOp(kernel)
    op.set_accuracy(tol)
    op.add_elem_list(lst_factory())
    op.use_device_near = force_dev
    op.far_fmm_cutoff = 10 ** 12          # near path only
    op.setup()
    return op, np.asarray(op._dev["near_mats"], np.float64)


def test_near_device_engine_matches_host_torus():
    """Full engine vs host assembly on a curved torus, f64 backend:
    ladder bands, Duffy shells, escalation, far subtraction.  Pairs
    whose two-order convergence decision flips at the threshold
    boundary resolve through different (both tol-accurate) rungs, so
    the comparison asserts a tol-scaled max and a tight bulk."""
    tol = 1e-4
    mk = lambda: torus_patches(nu=6, nv=3, q=4, R=2.0, r=0.5)
    opd, dev = _near_mats_of(mk, Stokes3D_DxU, tol, True)
    oph, host = _near_mats_of(mk, Stokes3D_DxU, tol, False)
    assert opd.near_pairs == oph.near_pairs
    assert dev.shape == host.shape
    scale = np.abs(host).max()
    d = np.abs(dev - host).reshape(len(dev), -1).max(1) / scale
    assert np.median(d) < 1e-9, np.median(d)
    assert d.max() < 30 * tol, d.max()


def test_near_device_engine_gauss_identity_sphere():
    """End-to-end: device-engine near assembly inside the BIE apply,
    validated against the exact Gauss identity (DL of the constant
    density = -1/2 on the surface) — the engine feeds
    _setup_device_apply directly (no host round trip)."""
    tol = 1e-4
    op = BoundaryIntegralOp(Laplace3D_DxU)
    op.set_accuracy(tol)
    op.add_elem_list(sphere_patches(n_per_face=2, q=4))
    op.use_device_near = True
    op.far_fmm_cutoff = 10 ** 12
    sigma = np.ones(op.dim(0))
    u = op.compute_potential(sigma)
    assert np.abs(u + 0.5).max() < 20 * tol, np.abs(u + 0.5).max()
