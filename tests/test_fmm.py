"""FMM tests (reference anchor: ParticleFMM::test, fmm-wrapper.txx:35-93
— compare Eval against EvalDirect; test-fmm.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from sctl_tpu.fmm import ParticleFMM, KIFMM
from sctl_tpu.ops import (Laplace3D_FxU, Laplace3D_DxU, Laplace3D_FxdU,
                          Stokes3D_FxU, direct_eval_blocked)

RNG = np.random.default_rng(0)


def rel_err(u, ref):
    return float(np.abs(u - ref).max() / (np.abs(ref).max() + 1e-300))


def test_kifmm_laplace_vs_direct():
    """Eval vs EvalDirect (the fmm-wrapper.txx:81 oracle)."""
    n = 6000
    xs = RNG.random((n, 3))
    xt = RNG.random((n, 3))
    f = RNG.normal(size=(n, 1))
    kifmm = KIFMM(Laplace3D_FxU, p=6, depth=3).setup(xs, xt)
    u = kifmm.eval(f)
    u_ref = np.asarray(direct_eval_blocked(
        Laplace3D_FxU, jnp.asarray(xt), jnp.asarray(xs),
        jnp.asarray(f)))
    assert rel_err(u, u_ref) < 2e-4, rel_err(u, u_ref)


def test_kifmm_accuracy_improves_with_p():
    n = 3000
    xs = RNG.random((n, 3))
    xt = RNG.random((n, 3))
    f = RNG.normal(size=(n, 1))
    u_ref = np.asarray(direct_eval_blocked(
        Laplace3D_FxU, jnp.asarray(xt), jnp.asarray(xs),
        jnp.asarray(f)))
    errs = []
    for p in (4, 8):
        kifmm = KIFMM(Laplace3D_FxU, p=p, depth=3).setup(xs, xt)
        errs.append(rel_err(kifmm.eval(f), u_ref))
    assert errs[1] < errs[0] / 5, errs


def test_kifmm_double_layer():
    """DxU sources through the tree (S2M with normals)."""
    n = 4000
    xs = RNG.random((n, 3))
    nrm = RNG.normal(size=(n, 3))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    xt = RNG.random((n, 3))
    f = RNG.normal(size=(n, 1))
    kifmm = KIFMM(Laplace3D_DxU, p=6, depth=3).setup(xs, xt, n_src=nrm)
    u = kifmm.eval(f)
    u_ref = np.asarray(direct_eval_blocked(
        Laplace3D_DxU, jnp.asarray(xt), jnp.asarray(xs),
        jnp.asarray(f), ns=jnp.asarray(nrm)))
    assert rel_err(u, u_ref) < 5e-4, rel_err(u, u_ref)


def test_kifmm_gradient_targets():
    n = 3000
    xs = RNG.random((n, 3))
    xt = RNG.random((n, 3))
    f = RNG.normal(size=(n, 1))
    kifmm = KIFMM(Laplace3D_FxU, p=6, depth=3,
                  ker_l2t=Laplace3D_FxdU).setup(xs, xt)
    # note: near-field (P2P) kernel for gradient targets is FxdU
    kifmm.ker_s2t = Laplace3D_FxU  # sources are monopoles
    # gradient test via the facade path is exercised separately;
    # here check far-field machinery only on well-separated targets
    xt_far = RNG.random((100, 3)) * 0.2 + np.array([3.0, 3.0, 3.0])
    u_ref = np.asarray(direct_eval_blocked(
        Laplace3D_FxdU, jnp.asarray(xt_far), jnp.asarray(xs),
        jnp.asarray(f)))
    # (far targets outside the tree bbox are not supported by the
    # uniform tree; skip tree eval, just assert oracle finite)
    assert np.isfinite(u_ref).all()


def test_particle_fmm_facade_direct_cutoff():
    """Below 40k points, eval == direct path exactly."""
    n = 500
    fmm = ParticleFMM(accuracy=6)
    fmm.set_kernel_s2t("s", "t", Laplace3D_FxU)
    fmm.set_src_coord("s", RNG.random((n, 3)))
    fmm.set_src_density("s", RNG.normal(size=(n, 1)))
    fmm.set_trg_coord("t", RNG.random((n, 3)))
    u = fmm.eval("t")
    u_ref = fmm.eval_direct("t")
    np.testing.assert_allclose(u, u_ref, rtol=1e-12)


def test_particle_fmm_facade_tree_path():
    n = 50_000   # above cutoff -> KIFMM path
    fmm = ParticleFMM(accuracy=6)
    fmm.set_kernel_s2t("s", "t", Laplace3D_FxU)
    xs = RNG.random((n, 3))
    f = RNG.normal(size=(n, 1))
    fmm.set_src_coord("s", xs)
    fmm.set_src_density("s", f)
    xt = RNG.random((2000, 3))
    fmm.set_trg_coord("t", xt)
    u = fmm.eval("t")
    u_ref = np.asarray(direct_eval_blocked(
        Laplace3D_FxU, jnp.asarray(xt), jnp.asarray(xs),
        jnp.asarray(f)))
    assert rel_err(u, u_ref) < 2e-4, rel_err(u, u_ref)


def test_particle_fmm_facade_eval_jnp():
    """Traced facade path: eval_jnp matches eval for both the direct
    and the tree dispatch, with no host round trip (jittable)."""
    for n in (500, 50_000):
        fmm = ParticleFMM(accuracy=6)
        fmm.set_kernel_s2t("s", "t", Laplace3D_FxU)
        xs = RNG.random((n, 3))
        f = RNG.normal(size=(n, 1))
        fmm.set_src_coord("s", xs)
        fmm.set_src_density("s", f)
        xt = RNG.random((min(n, 2000), 3))
        fmm.set_trg_coord("t", xt)
        u_ref = fmm.eval("t")
        u = np.asarray(jax.jit(
            lambda d: fmm.eval_jnp("t", d))({"s": jnp.asarray(f)}))
        np.testing.assert_allclose(u, u_ref, rtol=1e-10, atol=1e-12)


def test_eval_direct_ring(mesh8):
    """Distributed ring direct sum == single-device direct sum
    (reference: EvalDirect ring, fmm-wrapper.txx:537-558)."""
    from sctl_tpu.comm import Comm
    n = 512
    xs = RNG.random((n, 3))
    xt = RNG.random((n, 3))
    f = RNG.normal(size=(n, 1))
    sh = NamedSharding(mesh8, P("x", None))
    fmm = ParticleFMM(comm=Comm.world(mesh8))
    u = fmm.eval_direct_ring(
        Laplace3D_FxU,
        jax.device_put(jnp.asarray(xt), sh),
        jax.device_put(jnp.asarray(xs), sh),
        jax.device_put(jnp.asarray(f), sh))
    u_ref = np.asarray(direct_eval_blocked(
        Laplace3D_FxU, jnp.asarray(xt), jnp.asarray(xs),
        jnp.asarray(f)))
    np.testing.assert_allclose(np.asarray(u), u_ref, rtol=1e-10,
                               atol=1e-12)


def test_kifmm_stokes():
    """Stokes Stokeslet through the tree: FSxU translation set
    (reference: kernel_functions.hpp:213 — FSxU 'required for FMM
    translations involving double-layer')."""
    from sctl_tpu.ops import Stokes3D_FxU, Stokes3D_DxU
    n = 3000
    xs = RNG.random((n, 3))
    xt = RNG.random((n, 3))
    f = RNG.normal(size=(n, 3))
    kif = KIFMM(Stokes3D_FxU, p=4, depth=3).setup(xs, xt)
    u = kif.eval(f)
    u_ref = np.asarray(direct_eval_blocked(
        Stokes3D_FxU, jnp.asarray(xt), jnp.asarray(xs), jnp.asarray(f)))
    assert rel_err(u, u_ref) < 1e-2, rel_err(u, u_ref)

    nrm = RNG.normal(size=(n, 3))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    kif2 = KIFMM(Stokes3D_DxU, p=4, depth=3).setup(xs, xt, n_src=nrm)
    u2 = kif2.eval(f)
    u2_ref = np.asarray(direct_eval_blocked(
        Stokes3D_DxU, jnp.asarray(xt), jnp.asarray(xs),
        jnp.asarray(f), ns=jnp.asarray(nrm)))
    assert rel_err(u2, u2_ref) < 5e-3, rel_err(u2, u2_ref)


def test_kifmm_fxdu_gradient_kernel():
    """FxdU through the tree: the kernel-role split (S2M with the
    potential sibling FxU, P2P/L2T with FxdU) must give gradients at
    ALL targets — near and far (advisor round-1 high finding)."""
    n = 4000
    xs = RNG.random((n, 3))
    xt = RNG.random((n, 3))
    f = RNG.normal(size=(n, 1))
    kifmm = KIFMM(Laplace3D_FxdU, p=6, depth=3).setup(xs, xt)
    u = kifmm.eval(f)
    assert u.shape == (n, 3)
    u_ref = np.asarray(direct_eval_blocked(
        Laplace3D_FxdU, jnp.asarray(xt), jnp.asarray(xs),
        jnp.asarray(f)))
    assert rel_err(u, u_ref) < 5e-3, rel_err(u, u_ref)


def test_kifmm_requires_normals_for_dipole_kernels():
    """Setup must refuse needs_normal kernels without n_src instead of
    silently evaluating with zero normals (advisor medium finding)."""
    xs = RNG.random((200, 3))
    xt = RNG.random((200, 3))
    with pytest.raises(ValueError, match="normals"):
        KIFMM(Laplace3D_DxU, p=4, depth=2).setup(xs, xt)


# -- adaptive-tree FMM (reference role: PVFMM, fmm-wrapper.txx:788) ------

def test_adaptive_fmm_surface_points():
    """AdaptiveFMM on a sphere-surface point set (the BIE far-field
    distribution a uniform tree cannot refine into) matches the dense
    direct sum."""
    from sctl_tpu.fmm import AdaptiveFMM
    from sctl_tpu.ops.kernels_np import full_matrix_np

    rng = np.random.default_rng(2)
    n = 3000
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    xs = d
    f = rng.normal(size=(n, 1))
    u_d = (full_matrix_np(Laplace3D_FxU, xs, xs).T
           @ f.ravel()).reshape(n, 1)
    fm = AdaptiveFMM(Laplace3D_FxU, p=6, max_pts=64).setup(xs, xs)
    assert fm.tree.check_2to1()
    u = fm.eval(f)
    rel = np.abs(u - u_d).max() / np.abs(u_d).max()
    assert rel < 5e-5, rel


def test_adaptive_fmm_mixed_cluster_wx_lists():
    """Mixed surface + dense cluster: deep adaptive tree with
    populated W/X lists; matches direct; separate targets."""
    from sctl_tpu.fmm import AdaptiveFMM
    from sctl_tpu.ops.kernels_np import full_matrix_np

    rng = np.random.default_rng(3)
    n = 2000
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    xs = np.concatenate([d, 0.05 * rng.random((n // 2, 3)) + 0.55])
    xt = rng.random((500, 3)) * 2 - 1
    f = rng.normal(size=(len(xs), 1))
    u_d = (full_matrix_np(Laplace3D_FxU, xt, xs).T
           @ f.ravel()).reshape(len(xt), 1)
    fm = AdaptiveFMM(Laplace3D_FxU, p=6, max_pts=32).setup(xs, xt)
    nW = sum(int(np.sum(w >= 0)) for w in fm._wlist if w is not None)
    assert nW > 0          # the skewed tree must exercise W/X
    u = fm.eval(f)
    rel = np.abs(u - u_d).max() / np.abs(u_d).max()
    assert rel < 5e-5, rel


def test_adaptive_fmm_eval_jnp_traced():
    """eval_jnp is jittable and matches eval."""
    import jax
    from sctl_tpu.fmm import AdaptiveFMM

    rng = np.random.default_rng(4)
    n = 1500
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    f = rng.normal(size=(n, 1))
    fm = AdaptiveFMM(Laplace3D_FxU, p=6, max_pts=64).setup(d, d)
    u1 = fm.eval(f)
    u2 = np.asarray(jax.jit(fm.eval_jnp)(jnp.asarray(f)))
    np.testing.assert_allclose(u2, u1, atol=1e-10 * np.abs(u1).max())


def test_adaptive_fmm_dist_memory_sharded(mesh8):
    """AdaptiveFMMDist: skeleton built by DistPtTree over sharded
    points (asserted leaf-exact in setup), point/density/target/output
    arrays sharded by leaf block, density ghosts in one all-to-all —
    matches the dense direct sum and the single-device AdaptiveFMM
    (VERDICT r2 #6: the memory-sharded adaptive path)."""
    from sctl_tpu.comm import Comm
    from sctl_tpu.fmm import AdaptiveFMM, AdaptiveFMMDist
    from sctl_tpu.ops.kernels_np import full_matrix_np

    rng = np.random.default_rng(5)
    n = 3000
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    xs = d
    f = rng.normal(size=(n, 1))
    u_d = (full_matrix_np(Laplace3D_FxU, xs, xs).T
           @ f.ravel()).reshape(n, 1)

    comm = Comm.world(mesh8)
    fm = AdaptiveFMMDist(Laplace3D_FxU, comm, p=6, max_pts=64).setup(
        xs, xs)
    # the block partition must actually need ghosts (U lists cross
    # block boundaries on a connected surface): the ragged ghost
    # route tables must carry at least one cross-device leaf
    assert fm.Crg > 0
    u = fm.eval(f)
    rel = np.abs(u - u_d).max() / np.abs(u_d).max()
    assert rel < 5e-5, rel

    # agreement with the replicated-memory evaluator (identical math;
    # psum/scatter orderings reorder the f64 sums, and the
    # ill-conditioned equivalent densities amplify that reordering
    # noise well above eps — the oracle above is the dense sum)
    fs = AdaptiveFMM(Laplace3D_FxU, p=6, max_pts=64).setup(xs, xs)
    u_ref = fs.eval(f)
    assert np.abs(u - u_ref).max() / np.abs(u_ref).max() < 1e-8
    # the adopted DistPtTree skeleton equals the host refinement's
    # (formerly an assert inside setup — VERDICT r4 #4 moved the
    # duplicate-build check here, where it belongs)
    assert np.array_equal(fm._afmm.tree.leaf_keys, fs.tree.leaf_keys)
    assert np.array_equal(fm._afmm.tree.leaf_levels,
                          fs.tree.leaf_levels)


def test_adaptive_fmm_pallas_ulist():
    """AdaptiveFMM with the U list routed through the per-box Pallas
    kernel (interpret mode on CPU) matches the dense direct sum."""
    from sctl_tpu.fmm import AdaptiveFMM
    from sctl_tpu.ops.kernels_np import full_matrix_np

    rng = np.random.default_rng(8)
    n = 1500
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    f = rng.normal(size=(n, 1))
    u_d = (full_matrix_np(Laplace3D_FxU, d, d).T
           @ f.ravel()).reshape(n, 1)
    fm = AdaptiveFMM(Laplace3D_FxU, p=6, max_pts=64,
                     use_pallas_ulist=True).setup(d, d)
    u = fm.eval(f)
    rel = np.abs(u - u_d).max() / np.abs(u_d).max()
    assert rel < 5e-5, rel


def test_kifmm_pallas_s2m_l2t():
    """KIFMM with S2M/L2T routed through the per-box Pallas U-list
    kernel (interpret mode on CPU; ROADMAP #2) matches the dense
    direct sum at the p=6 rung."""
    from sctl_tpu.fmm import KIFMM
    from sctl_tpu.ops.kernels_np import full_matrix_np

    rng = np.random.default_rng(21)
    n = 2000
    x = rng.random((n, 3))
    f = rng.normal(size=(n, 1))
    u_d = (full_matrix_np(Laplace3D_FxU, x, x).T
           @ f.ravel()).reshape(n, 1)
    kf = KIFMM(Laplace3D_FxU, p=6, depth=3, use_pallas_p2p=False,
               use_pallas_m2l=False, use_pallas_sl=True).setup(x, x)
    u = kf.eval(f)
    rel = np.abs(u - u_d).max() / np.abs(u_d).max()
    assert rel < 5e-5, rel


def test_m2l_blocked_kernel_exact():
    """The sibling-blocked Pallas M2L (ops/pallas_m2l.py
    m2l_grid_blocked: 26 parent-direction (8r2 x 8r) block GEMMs on
    the parent grid) matches the exact per-offset parity-masked sweep
    on a random grid to the 3-pass bf16 floor (interpret mode)."""
    from sctl_tpu.fmm.kifmm import _vlist_offsets, KIFMMOperators
    from sctl_tpu.ops.pallas_m2l import (m2l_grid_blocked,
                                         blocked_m2l_mats)

    ops = KIFMMOperators(Laplace3D_FxU, Laplace3D_FxU, Laplace3D_FxU,
                         6, 6, 1.0)
    rc, r2c = ops.m2l_cap_r, ops.m2l_cap_r2
    ca = np.asarray(ops.ca_unit, np.float64)
    d, valid = _vlist_offsets()
    n = 4
    rng = np.random.default_rng(3)
    q = rng.normal(size=(n, n, n, r2c)).astype(np.float32)
    A = ca[:, :rc, :r2c]
    qp = np.pad(q.astype(np.float64),
                ((3, 3), (3, 3), (3, 3), (0, 0)))
    out_ref = np.zeros((n, n, n, rc))
    par = np.arange(n) % 2
    pidx = (4 * par[:, None, None] + 2 * par[None, :, None]
            + par[None, None, :])
    for o, (dx, dy, dz) in enumerate(d):
        src = qp[3 + dx:3 + dx + n, 3 + dy:3 + dy + n,
                 3 + dz:3 + dz + n]
        out_ref += (src @ A[o].T) * valid[pidx, o][..., None]

    W = blocked_m2l_mats(ca, ops.offsets, ops.parity_valid, rc, r2c)
    h = n // 2
    qb = q.reshape(h, 2, h, 2, h, 2, r2c).transpose(
        0, 2, 4, 1, 3, 5, 6).reshape(h, h, h, 8 * r2c)
    qbp = jnp.pad(jnp.asarray(qb), ((1, 1), (1, 1), (1, 1), (0, 0)))
    outb = m2l_grid_blocked(qbp, jnp.asarray(W, jnp.float32), h, rc,
                            r2c, interpret=True)
    outb = np.asarray(outb).reshape(h, h, h, 2, 2, 2, rc).transpose(
        0, 3, 1, 4, 2, 5, 6).reshape(n, n, n, rc)
    rel = np.abs(outb - out_ref).max() / np.abs(out_ref).max()
    assert rel < 1e-4, rel


def test_kifmm_m2l_blocked_end_to_end():
    """Full KIFMM eval with the blocked Pallas M2L engaged (interpret
    mode on CPU; depth 3 runs level 3 through the blocked kernel and
    level 2 through the scan) matches the dense direct sum at the
    p=6 rung."""
    from sctl_tpu.fmm import KIFMM
    from sctl_tpu.ops.kernels_np import full_matrix_np

    rng = np.random.default_rng(29)
    n = 1500
    x = rng.random((n, 3))
    f = rng.normal(size=(n, 1))
    u_d = (full_matrix_np(Laplace3D_FxU, x, x).T
           @ f.ravel()).reshape(n, 1)
    kf = KIFMM(Laplace3D_FxU, p=6, depth=3, dtype=jnp.float32,
               use_pallas_p2p=False, use_pallas_m2l=True,
               use_pallas_sl=False).setup(x, x)
    assert kf._data["m2l_blk"] is not None and kf._m2l_blocked
    u = np.asarray(kf.eval(f))
    rel = np.abs(u - u_d).max() / np.abs(u_d).max()
    assert rel < 5e-4, rel


@pytest.mark.parametrize("ker", [Laplace3D_FxU, Stokes3D_FxU])
def test_kifmm_shared_surface_sl(ker):
    """The TPU-default shared-surface S2M/L2T route (ops/pallas_sl.py:
    surface points in sublanes, 128 boxes' slots in lanes, per-box
    sums via exact hi/lo one-hot MXU matmuls) matches the dense direct
    sum in interpret mode.  f32 forces the `_sl_on` gate on the CPU
    mesh; depth 3 gives B=512 (a 128-multiple)."""
    from sctl_tpu.fmm import KIFMM
    from sctl_tpu.ops.kernels_np import full_matrix_np

    rng = np.random.default_rng(23)
    n = 1500
    k0 = ker.kdim0
    x = rng.random((n, 3))
    f = rng.normal(size=(n, k0))
    u_d = (full_matrix_np(ker, x, x).T
           @ f.ravel()).reshape(n, -1)
    kf = KIFMM(ker, p=6, depth=3, dtype=jnp.float32,
               use_pallas_p2p=False, use_pallas_m2l=False,
               use_pallas_sl=True).setup(x, x)
    assert kf._sl_on, "shared-surface gate must engage"
    u = np.asarray(kf.eval(f))
    rel = np.abs(u - u_d).max() / np.abs(u_d).max()
    assert rel < 6e-4, rel
