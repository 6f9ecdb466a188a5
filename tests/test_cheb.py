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


def test_integ_kernel_face_on_face_singular():
    """Laplace single layer of a CONSTANT density over the z=0 face of
    the unit box, target at the face center: exact value is
    ln(1+sqrt(2))/pi (corner primitive a*asinh(b/a)+b*asinh(a/b))
    (reference Integ_ anchor, cheb_utils.hpp:1075)."""
    from sctl_tpu.linalg.cheb import integ_kernel_face
    from sctl_tpu.ops import Laplace3D_FxU

    M = integ_kernel_face(Laplace3D_FxU, 4, [0.5, 0.5, 0.0],
                          1.0, 4, order_q=16)       # face z=0
    # constant density: T_0 x T_0 coefficient = 1
    val = M[0, 0, 0, 0]
    exact = np.log(1 + np.sqrt(2)) / np.pi
    np.testing.assert_allclose(val, exact, rtol=1e-10)


def test_integ_kernel_face_smooth_vs_gauss():
    """Off-plane target, polynomial density: matches a fine tensor
    Gauss oracle on every face orientation."""
    from sctl_tpu.linalg.cheb import integ_kernel_face, _cheb_t
    from sctl_tpu.linalg.quadrule import leg_quad_rule
    from sctl_tpu.ops import Laplace3D_FxU, Laplace3D_DxU
    from sctl_tpu.ops.kernels_np import full_matrix_np

    trg = np.array([0.3, -0.4, 0.7])
    side = 0.8
    for ker in (Laplace3D_FxU, Laplace3D_DxU):
        for face in range(6):
            q = 3
            M = integ_kernel_face(ker, q, trg, side, face, order_q=14)
            # oracle: 40^2 Gauss on the face
            x1, w1 = leg_quad_rule(40)
            u, v = np.meshgrid(x1, x1, indexing="ij")
            axis, s = face >> 1, face & 1
            perm = [(i + axis + 1) % 3 for i in range(3)]
            pts = np.empty((1600, 3))
            pts[:, perm[0]] = u.ravel() * side
            pts[:, perm[1]] = v.ravel() * side
            pts[:, perm[2]] = side * s
            nrm = np.zeros((1600, 3))
            nrm[:, axis] = -1.0 if s else 1.0
            K = full_matrix_np(ker, trg[None], pts,
                               nrm if ker.needs_normal else None)
            K = K.reshape(1600, ker.kdim0, ker.kdim1)
            w2 = np.outer(w1, w1).ravel() * side * side
            B0 = _cheb_t(2 * u.ravel() - 1, q)
            B1 = _cheb_t(2 * v.ravel() - 1, q)
            Mref = np.einsum("ni,nj,n,nab->ijab", B0, B1, w2, K)
            np.testing.assert_allclose(M, Mref, atol=1e-10
                                       * np.abs(Mref).max())
