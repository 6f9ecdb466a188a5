"""Accuracy-ladder anchors (BASELINE.md): each rung's claimed rel err
is asserted against a dense f64 direct sum, and the 1e-10 GMRES
residual anchor (lin-solve.txx:273; gmres-rsult.txt) is met on the
f64 path."""

import jax.numpy as jnp
import numpy as np

from sctl_tpu.fmm import KIFMM
from sctl_tpu.ops import Laplace3D_FxU
from sctl_tpu.ops.kernels_np import full_matrix_np

RNG = np.random.default_rng(12)
N = 2000
XS = RNG.random((N, 3))
F = RNG.normal(size=(N, 1))
U_DENSE = (full_matrix_np(Laplace3D_FxU, XS, XS).T
           @ F.ravel()).reshape(N, 1)


def _rung(p, dtype):
    kf = KIFMM(Laplace3D_FxU, p=p, depth=3, dtype=dtype,
               use_pallas_p2p=False).setup(XS, XS)
    u = kf.eval(F)
    return np.abs(u - U_DENSE).max() / np.abs(U_DENSE).max()


def test_rung_f32_p6():
    assert _rung(6, jnp.float32) < 5e-4


def test_rung_f32_p8_floor():
    assert _rung(8, jnp.float32) < 1e-4


def test_rung_f64_p6():
    assert _rung(6, jnp.float64) < 5e-5


def test_rung_f64_p8():
    assert _rung(8, jnp.float64) < 1e-6


def test_bie_gmres_residual_1e10():
    """GMRES on the BIE operator reaches 1e-10 relative residual on
    the f64 path (the algebraic anchor; operator accuracy is a
    separate rung)."""
    from sctl_tpu.bie import BoundaryIntegralOp, sphere_patches
    from sctl_tpu.linalg import gmres
    from sctl_tpu.ops import Laplace3D_DxU

    lst = sphere_patches(n_per_face=1, q=6)
    op = BoundaryIntegralOp(Laplace3D_DxU)
    op.set_accuracy(1e-7)
    op.add_elem_list(lst)
    op.setup()
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.normal(size=op.dim(1)))

    def A(sig):
        return op.compute_potential_jnp(sig).reshape(-1) - 0.5 * sig

    x, iters = gmres(A, b, tol=1e-10, max_iter=200)
    r = np.asarray(A(x)) - np.asarray(b)
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-9


def test_kifmm_ld_extended_precision_path():
    """The longdouble host path (KIFMMLd — the reference's QuadReal /
    long-double FMM configuration, math_utils.hpp:236-300,
    src/test-fmm.cpp) matches a longdouble dense direct sum at the
    p=8 truncation rung, for both monopole and dipole (normals)
    sources, exercising S2M/M2M/M2L/L2L/L2T/P2P in extended
    precision."""
    from sctl_tpu.fmm.kifmm_ld import KIFMMLd, _kmat_ld
    from sctl_tpu.ops import Laplace3D_DxU

    rng = np.random.default_rng(7)
    n = 900
    x = rng.random((n, 3))
    f = rng.normal(size=(n, 1))
    ud = np.float64((_kmat_ld(Laplace3D_FxU, x, x)
                     @ f.astype(np.longdouble).ravel()).reshape(n, 1))
    kf = KIFMMLd(Laplace3D_FxU, p=8, depth=3, rcond=1e-11).setup(x, x)
    rel = np.abs(kf.eval(f) - ud).max() / np.abs(ud).max()
    assert rel < 1e-6, rel

    ns = rng.normal(size=(n, 3))
    ns /= np.linalg.norm(ns, axis=1, keepdims=True)
    ud2 = np.float64((_kmat_ld(Laplace3D_DxU, x, x, ns)
                      @ f.astype(np.longdouble).ravel()).reshape(n, 1))
    kd = KIFMMLd(Laplace3D_DxU, p=8, depth=2,
                 rcond=1e-11).setup(x, x, n_src=ns)
    rel2 = np.abs(kd.eval(f) - ud2).max() / np.abs(ud2).max()
    assert rel2 < 1e-6, rel2


def test_rung_ld_p12_flagship():
    """Flagship extended-precision rung (BASELINE.md ladder): the
    longdouble path at p=12, rcond=1e-11 measures ~2.5e-10 vs a
    longdouble dense oracle — 27x beyond the f64 plateau.  Asserted
    with 6x headroom."""
    from sctl_tpu.fmm.kifmm_ld import KIFMMLd, _kmat_ld

    rng = np.random.default_rng(12)
    n = 1200
    x = rng.random((n, 3))
    f = rng.normal(size=(n, 1))
    ud = np.float64((_kmat_ld(Laplace3D_FxU, x, x)
                     @ f.astype(np.longdouble).ravel()).reshape(n, 1))
    kf = KIFMMLd(Laplace3D_FxU, p=12, depth=2, rcond=1e-11).setup(x, x)
    rel = np.abs(kf.eval(f) - ud).max() / np.abs(ud).max()
    assert rel < 1.5e-9, rel


def _hp_cache_missing(p):
    """The rung runs from EITHER the full v4hp table file or the
    committed lite artifact (KIFMMOperators._load_cache_lite, ~200 MB
    vs 1.2-2.7 GB, rebuilt-on-load f64 stacks + f16 ld-delta); only a
    fully cold build (~15-60 min single-core) is skipped."""
    import os
    base = f"data/kifmm_Laplace3D-FxU_p{p}_r1e-10_unit_v4hp"
    return not (os.path.exists(base + ".npz")
                or os.path.exists(base + "_lite.npz"))


def test_rung_f64_p10_hiprec():
    """p=10 hiprec rung: measured 8.6e-9 (rcond=1e-10, 80-bit table
    products).  Gated on the operator disk cache — a cold build is
    ~15 min single-core (randomized SVD included), too slow for CI."""
    import pytest
    if _hp_cache_missing(10):
        pytest.skip("cold operator cache (build ~15 min)")
    rel = _rung_hp(10, 1e-10)
    assert rel < 3e-8, rel


def test_rung_f64_p12_hiprec():
    """p=12 hiprec rung: measured 6.8e-9 — the f64 pipeline plateau
    (see BASELINE.md for the one-hop decomposition of why)."""
    import pytest
    if _hp_cache_missing(12):
        pytest.skip("cold operator cache (build ~60 min)")
    rel = _rung_hp(12, 1e-10)
    assert rel < 3e-8, rel


def _rung_hp(p, rcond):
    kf = KIFMM(Laplace3D_FxU, p=p, depth=3, dtype=jnp.float64,
               rcond=rcond, hiprec=True,
               use_pallas_p2p=False).setup(XS, XS)
    u = kf.eval(F)
    return np.abs(u - U_DENSE).max() / np.abs(U_DENSE).max()
