"""BoundaryIntegralOp tests (reference anchors: the BIE operator pipeline
boundary_integral.txx; Gauss-identity and Green-representation oracles;
doc/tutorial/gmres-rsult.txt-style GMRES-on-BIE convergence)."""

import numpy as np
import pytest
import jax.numpy as jnp

from sctl_tpu.bie import (BoundaryIntegralOp, sphere_patches,
                          torus_patches)
from sctl_tpu.ops import (Laplace3D_FxU, Laplace3D_DxU,
                          direct_eval_blocked)
from sctl_tpu.linalg import gmres


def test_sphere_patch_geometry():
    lst = sphere_patches(n_per_face=1, q=6)
    X, Xn, cnt = lst.get_node_coord()
    assert len(X) == 6 * 36 and cnt.sum() == len(X)
    np.testing.assert_allclose(np.linalg.norm(X, axis=1), 1.0,
                               atol=1e-12)
    # outward normals == radial direction
    np.testing.assert_allclose(Xn, X, atol=1e-8)
    Xf, Xnf, wf, df, fcnt = lst.get_far_field_nodes(1e-6)
    assert abs(wf.sum() - 4 * np.pi) < 1e-6     # total surface area
    assert (df > 0).all()


def test_torus_patch_geometry():
    R, r = 2.0, 0.5
    lst = torus_patches(nu=4, nv=2, q=6, R=R, r=r)
    X, Xn, cnt = lst.get_node_coord()
    rho = np.sqrt(X[:, 0] ** 2 + X[:, 1] ** 2)
    np.testing.assert_allclose((rho - R) ** 2 + X[:, 2] ** 2, r ** 2,
                               atol=1e-10)
    Xf, Xnf, wf, df, fcnt = lst.get_far_field_nodes(1e-6)
    assert abs(wf.sum() - 4 * np.pi ** 2 * R * r) < 1e-6
    # outward normal: points away from the tube center circle
    ctr = np.stack([X[:, 0] * R / rho, X[:, 1] * R / rho,
                    np.zeros(len(X))], 1)
    outward = (X - ctr) / r
    np.testing.assert_allclose(Xn, outward, atol=1e-7)


def test_gauss_identity_off_surface():
    """DL of constant density: -1 inside, 0 outside (exterior normals,
    1/4pi scale) — smooth quadrature only (targets are far)."""
    lst = sphere_patches(n_per_face=1, q=6)
    op = BoundaryIntegralOp(Laplace3D_DxU)
    op.set_accuracy(1e-8)
    op.add_elem_list(lst)
    op.set_target_coord(np.array([[0.05, 0.02, -0.01],
                                  [2.0, 1.0, 1.5]]))
    sigma = np.ones(op.dim(0))
    u = op.compute_potential(sigma)
    assert abs(u[0, 0] + 1.0) < 1e-6, u[0, 0]
    assert abs(u[1, 0]) < 1e-8, u[1, 0]


def test_gauss_identity_on_surface():
    """On-surface principal value: DL[1] = -1/2 — exercises the
    singular (SelfInterac-equivalent) corrections."""
    lst = sphere_patches(n_per_face=1, q=6)
    op = BoundaryIntegralOp(Laplace3D_DxU)
    op.set_accuracy(1e-6)
    op.add_elem_list(lst)
    op.set_target_coord(None)     # targets = surface nodes
    sigma = np.ones(op.dim(0))
    u = op.compute_potential(sigma)
    err = np.abs(u[:, 0] + 0.5).max()
    assert err < 3e-6, err


def test_torus_gauss_identity_on_surface():
    """On-surface PV on the curved torus through the BATCHED near
    setup (near_interac_batch: ladder + Duffy classes; the Gauss
    identity is the oracle that arbitrated Duffy vs the adaptive rule
    — Duffy-16 measured 6.5e-8 on-surface)."""
    lst = torus_patches(nu=8, nv=4, q=6, R=2.0, r=0.5)
    op = BoundaryIntegralOp(Laplace3D_DxU)
    op.set_accuracy(1e-6)
    op.add_elem_list(lst)
    sigma = np.ones(op.dim(0))
    u = op.compute_potential(sigma)
    err = np.abs(u[:, 0] + 0.5).max()
    assert err < 3e-6, err


def test_interior_dirichlet_solve():
    """2nd-kind interior Dirichlet on the sphere via GMRES over the BIE
    operator; boundary data from an exterior point charge; interior
    field must match (the gmres-rsult.txt scenario class)."""
    lst = sphere_patches(n_per_face=1, q=8)
    op = BoundaryIntegralOp(Laplace3D_DxU)
    op.set_accuracy(1e-8)
    op.add_elem_list(lst)
    op.set_target_coord(None)
    op.setup()
    X, Xn, _ = lst.get_node_coord()

    src = np.array([[1.7, 0.8, 1.2]])
    q = np.ones((1, 1))
    bc = np.asarray(direct_eval_blocked(
        Laplace3D_FxU, jnp.asarray(X), jnp.asarray(src),
        jnp.asarray(q)))[:, 0]

    def A(sig):
        u = op.compute_potential(np.asarray(sig))
        return jnp.asarray(u[:, 0] - 0.5 * np.asarray(sig))

    x, iters = gmres(A, jnp.asarray(bc), tol=1e-8)
    assert iters < 30, iters

    xt_in = np.array([[0.3, 0.1, -0.2], [0.0, 0.5, 0.0]])
    op2 = BoundaryIntegralOp(Laplace3D_DxU)
    op2.set_accuracy(1e-8)
    op2.add_elem_list(lst)
    op2.set_target_coord(xt_in)
    u_in = op2.compute_potential(np.asarray(x))[:, 0]
    u_exact = np.asarray(direct_eval_blocked(
        Laplace3D_FxU, jnp.asarray(xt_in), jnp.asarray(src),
        jnp.asarray(q)))[:, 0]
    err = np.abs(u_in - u_exact).max() / np.abs(u_exact).max()
    assert err < 1e-5, err


def test_torus_gauss_identity():
    lst = torus_patches(nu=6, nv=3, q=6, R=2.0, r=0.5)
    op = BoundaryIntegralOp(Laplace3D_DxU)
    op.set_accuracy(1e-7)
    op.add_elem_list(lst)
    # inside the tube vs far outside
    op.set_target_coord(np.array([[2.0, 0.0, 0.0],
                                  [6.0, 0.0, 0.0]]))
    sigma = np.ones(op.dim(0))
    u = op.compute_potential(sigma)
    assert abs(u[0, 0] + 1.0) < 1e-5, u[0, 0]
    assert abs(u[1, 0]) < 1e-7, u[1, 0]


def test_bie_fmm_far_field():
    """BIE far field through the tree FMM (reference: ComputeFarField
    -> fmm.Eval, boundary_integral.txx:1016): same answer as the
    direct far-field path within FMM accuracy."""
    lst = sphere_patches(n_per_face=1, q=6)
    src = np.array([[1.7, 0.8, 1.2]])
    q = np.ones((1, 1))
    targets = np.array([[0.3, 0.1, -0.2], [0.0, 0.5, 0.0]])

    def solve_interior(fmm_cutoff):
        op = BoundaryIntegralOp(Laplace3D_DxU)
        op.set_accuracy(1e-7)
        op.far_fmm_cutoff = fmm_cutoff
        op.add_elem_list(lst)
        op.set_target_coord(None)
        op.setup()
        X, _, _ = lst.get_node_coord()
        bc = np.asarray(direct_eval_blocked(
            Laplace3D_FxU, jnp.asarray(X), jnp.asarray(src),
            jnp.asarray(q)))[:, 0]
        A = lambda s: jnp.asarray(op.compute_potential(
            np.asarray(s))[:, 0] - 0.5 * np.asarray(s))
        x, iters = gmres(A, jnp.asarray(bc), tol=1e-7)
        op2 = BoundaryIntegralOp(Laplace3D_DxU)
        op2.set_accuracy(1e-7)
        op2.far_fmm_cutoff = fmm_cutoff
        op2.add_elem_list(lst)
        op2.set_target_coord(targets)
        return op2.compute_potential(np.asarray(x))[:, 0], iters, op

    u_direct, it1, _ = solve_interior(fmm_cutoff=10 ** 9)
    u_fmm, it2, op_fmm = solve_interior(fmm_cutoff=100)
    assert op_fmm._far_fmm is not None      # tree path actually used
    u_exact = np.asarray(direct_eval_blocked(
        Laplace3D_FxU, jnp.asarray(targets), jnp.asarray(src),
        jnp.asarray(q)))[:, 0]
    err_d = np.abs(u_direct - u_exact).max() / np.abs(u_exact).max()
    err_f = np.abs(u_fmm - u_exact).max() / np.abs(u_exact).max()
    assert err_d < 2e-4, err_d               # q=6 / tol=1e-7 setup
    assert err_f < 5e-4, err_f               # + p=6 FMM error


def test_sqrt_scaling():
    """SqrtScaling/InvSqrtScaling roundtrip and weight consistency
    (reference: boundary_integral.txx:616,648)."""
    lst = sphere_patches(n_per_face=1, q=6)
    op = BoundaryIntegralOp(Laplace3D_DxU)
    op.add_elem_list(lst)
    w = lst.node_weights()
    assert abs(w.sum() - 4 * np.pi) < 1e-6     # weights tile the sphere
    v = np.random.default_rng(0).normal(size=op.dim(0))
    np.testing.assert_allclose(
        op.inv_sqrt_scaling(op.sqrt_scaling(v))[:, 0], v, atol=1e-12)


def test_stokes_torus_dirichlet_gmres_device():
    """Interior Stokes Dirichlet on a torus via the double-layer ansatz
    solved with the DEVICE-RESIDENT GMRES over the traced operator
    (the BASELINE.md headline-2 scenario: gmres-rsult.txt class).
    Oracle: a Stokeslet source outside the domain; the reconstructed
    interior velocity must match it."""
    import jax
    from sctl_tpu.ops import Stokes3D_DxU, Stokes3D_FxU
    from sctl_tpu.linalg import gmres_device

    lst = torus_patches(nu=6, nv=3, q=6, R=2.0, r=0.5)
    op = BoundaryIntegralOp(Stokes3D_DxU)
    op.set_accuracy(1e-7)
    op.add_elem_list(lst)
    op.setup()
    X, Xn, _ = lst.get_node_coord()

    src = np.array([[6.0, 0.0, 0.0]])          # outside the torus
    q = np.array([[1.0, -0.5, 0.8]])
    bc = np.asarray(direct_eval_blocked(
        Stokes3D_FxU, jnp.asarray(X), jnp.asarray(src),
        jnp.asarray(q))).reshape(-1)

    n3 = op.dim(0)

    def A(sig):
        u = op.compute_potential_jnp(sig).reshape(-1)
        return u - 0.5 * sig

    x, iters, err = jax.jit(
        lambda b: gmres_device(A, b, tol=1e-7, max_iter=80))(
        jnp.asarray(bc))
    assert int(iters) < 80
    # residual check
    r = np.asarray(A(jnp.asarray(x))) - bc
    assert np.linalg.norm(r) / np.linalg.norm(bc) < 1e-6

    # interior reconstruction
    xt_in = np.array([[2.0, 0.0, 0.0], [0.0, -2.1, 0.15]])
    op2 = BoundaryIntegralOp(Stokes3D_DxU)
    op2.set_accuracy(1e-7)
    op2.add_elem_list(lst)
    op2.set_target_coord(xt_in)
    u_in = op2.compute_potential(np.asarray(x))
    u_ex = np.asarray(direct_eval_blocked(
        Stokes3D_FxU, jnp.asarray(xt_in), jnp.asarray(src),
        jnp.asarray(q)))
    rel = np.abs(u_in - u_ex).max() / np.abs(u_ex).max()
    assert rel < 1e-4, rel


def test_bie_sharded_apply_matches(mesh8):
    """Distributed operator application over the 8-device mesh
    (reference: sharded ComputePotential, boundary_integral.txx:
    1016-1142): element-aligned density sharding, no full-density
    replication, near GEMMs on the element owner + routed scatter-add
    (ScatterForward); matches the single-device apply, and a sharded
    GMRES solve matches the single-device solve."""
    import jax
    from sctl_tpu.comm import Comm
    from sctl_tpu.linalg import gmres

    lst = sphere_patches(n_per_face=1, q=6)
    op = BoundaryIntegralOp(Laplace3D_DxU)
    op.set_accuracy(1e-7)
    op.add_elem_list(lst)
    op.setup()
    rng = np.random.default_rng(1)
    n = op.dim(0)
    sigma = rng.normal(size=n)
    U_ref = op.compute_potential(sigma)

    comm = Comm.world(mesh8)
    sh = op.sharded_apply(comm)
    apply_sh = sh.jit_apply()
    U_sh = sh.unpack(apply_sh(sh.pack(sigma)))
    np.testing.assert_allclose(U_sh, U_ref, atol=1e-10
                               * np.abs(U_ref).max())

    # sharded second-kind solve == single-device solve
    X, _, _ = lst.get_node_coord()
    src = np.array([[1.7, 0.8, 1.2]])
    q = np.ones((1, 1))
    from sctl_tpu.ops import direct_eval_blocked as deb
    bc = np.asarray(deb(Laplace3D_FxU, jnp.asarray(X),
                        jnp.asarray(src), jnp.asarray(q)))[:, 0]
    b_pad = sh.pack(bc)

    def A_sh(sig):
        return apply_sh(sig).reshape(-1) - 0.5 * sig

    x_sh, it_sh = gmres(A_sh, b_pad, tol=1e-8, max_iter=60)

    def A_single(sig):
        u = op.compute_potential_jnp(sig).reshape(-1)
        return u - 0.5 * sig

    x_1, it_1 = gmres(A_single, jnp.asarray(bc), tol=1e-8,
                      max_iter=60)
    x_sh_n = sh.unpack(np.asarray(x_sh).reshape(-1, 1)).reshape(-1)
    np.testing.assert_allclose(x_sh_n, np.asarray(x_1),
                               atol=1e-6 * np.abs(x_1).max())


def test_bie_sharded_apply_fmm_far_field(mesh8):
    """Sharded apply with the FMM far field ACTIVE (cutoff lowered so
    the AdaptiveFMMDist path runs): matches the single-device apply at
    its operator accuracy (VERDICT r2 #4: sharded far field through
    the FMM, density never replicated)."""
    from sctl_tpu.comm import Comm

    lst = sphere_patches(n_per_face=2, q=6)
    op = BoundaryIntegralOp(Laplace3D_DxU)
    op.set_accuracy(1e-6)
    op.far_fmm_cutoff = 1000            # force the tree-FMM far field
    op.add_elem_list(lst)
    op.setup()
    assert op._far_fmm is not None
    rng = np.random.default_rng(2)
    n = op.dim(0)
    sigma = rng.normal(size=n)
    U_ref = op.compute_potential(sigma)

    comm = Comm.world(mesh8)
    sh = op.sharded_apply(comm)
    assert sh._fmm is not None
    U_sh = sh.unpack(sh.jit_apply()(sh.pack(sigma)))
    # identical math up to f64 reduction ordering (psum'd moments)
    np.testing.assert_allclose(U_sh, U_ref, atol=1e-8
                               * np.abs(U_ref).max())


def test_bie_build_near_list_dist(mesh8):
    """Distributed near-pair search (reference: BuildNearList,
    boundary_integral.txx:46-183): cell-key routing (PartitionS role)
    + 27-neighbor replication + sorted-range join + pair routing to
    target owners reproduces the host grid search's pair set."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from sctl_tpu.comm import Comm
    from sctl_tpu.bie.dist import build_near_list_fn

    lst = sphere_patches(n_per_face=2, q=6)
    op = BoundaryIntegralOp(Laplace3D_DxU)
    op.set_accuracy(1e-6)
    op.add_elem_list(lst)
    op.setup()
    ref = set(op.near_pairs)

    comm = Comm.world(mesh8)
    ndev = 8
    nt, nf = len(op.Xt_eff), len(op.Xf)
    Ct, Cf = -(-nt // ndev), -(-nf // ndev)
    elem_of_f = np.repeat(np.arange(len(op.far_cnt)), op.far_cnt)

    def blocks(a, C, fill=0.0):
        out = np.full((ndev * C,) + a.shape[1:], fill, a.dtype)
        out[:len(a)] = a
        return out

    sh = lambda s: NamedSharding(mesh8, P(*s))
    Xt = jax.device_put(jnp.asarray(blocks(op.Xt_eff, Ct)),
                        sh(("x", None)))
    tg = jax.device_put(jnp.asarray(blocks(np.arange(nt), Ct)),
                        sh(("x",)))
    Xf = jax.device_put(jnp.asarray(blocks(op.Xf, Cf)), sh(("x", None)))
    df = jax.device_put(jnp.asarray(blocks(op.df, Cf)), sh(("x",)))
    fe = jax.device_put(jnp.asarray(blocks(elem_of_f, Cf)), sh(("x",)))
    tcnt = jax.device_put(jnp.asarray(np.minimum(np.maximum(
        nt - np.arange(ndev) * Ct, 0), Ct), jnp.int32), sh(("x",)))
    fcnt = jax.device_put(jnp.asarray(np.minimum(np.maximum(
        nf - np.arange(ndev) * Cf, 0), Cf), jnp.int32), sh(("x",)))

    cap_out = 4 * max(1, len(ref) // ndev) + 64
    fn = build_near_list_fn(comm, ndev, Ct, Cf,
                            cap_route_t=ndev * Ct,
                            cap_route_f=27 * ndev * Cf,
                            cap_join=128 * ndev * Cf, cap_out=cap_out)
    pt, pe, n_u, need = jax.jit(comm.run(
        lambda *a: fn(a[0], a[1][0], a[2], a[3], a[4], a[5], a[6][0]),
        in_specs=(P("x", None), P("x"), P("x"), P("x", None), P("x"),
                  P("x"), P("x")),
        out_specs=(P("x"), P("x"), P("x"), P("x", None))))(
        Xt, tcnt, tg, Xf, df, fe, fcnt)
    pt = np.asarray(pt).reshape(ndev, -1)
    pe = np.asarray(pe).reshape(ndev, -1)
    n_u = np.asarray(n_u).reshape(-1)
    # the reported required capacities must all fit (no overflow here)
    need = np.asarray(need).reshape(ndev, 4).max(0)
    assert int(need[3]) <= cap_out
    got = set()
    for d in range(ndev):
        for j in range(int(n_u[d])):
            got.add((int(pt[d, j]), int(pe[d, j])))
    assert got == ref, (len(got), len(ref))


def test_bie_near_list_dist_grow_on_overflow(mesh8):
    """Undersized initial capacities GROW and re-trace instead of
    aborting (VERDICT r4 #9; the reference's Vector growth discipline,
    vector.hpp:87): starting the distributed near search at 1/64 of
    the derived capacities still yields the host search's exact pair
    set, with at least one growth round exercised."""
    from sctl_tpu.comm import Comm

    lst = sphere_patches(n_per_face=2, q=6)
    op_h = BoundaryIntegralOp(Laplace3D_DxU)
    op_h.set_accuracy(1e-6)
    op_h.add_elem_list(lst)
    op_h.setup()

    comm = Comm.world(mesh8)
    op_d = BoundaryIntegralOp(Laplace3D_DxU)
    op_d.set_accuracy(1e-6)
    op_d.add_elem_list(sphere_patches(n_per_face=2, q=6))
    # run only the basic/far phases via setup plumbing, then the near
    # search directly with undersized caps
    op_d.setup(comm=comm)           # warm full setup (host matrices)
    op_d._build_near_list_dist(comm, _cap_scale=1.0 / 64)
    assert op_d._near_caps_grown >= 1
    assert set(op_d.near_pairs) == set(op_h.near_pairs)


def test_bie_setup_dist_is_production_path(mesh8):
    """`op.setup(comm=...)` runs the near search DISTRIBUTED (the
    reference's BuildNearList-inside-Setup, boundary_integral.txx:
    46-183) and produces the same pair set, near matrices, and
    potentials as the host-search setup (VERDICT r3 missing #1)."""
    from sctl_tpu.comm import Comm

    lst = sphere_patches(n_per_face=2, q=6)
    op_h = BoundaryIntegralOp(Laplace3D_DxU)
    op_h.set_accuracy(1e-6)
    op_h.add_elem_list(lst)
    op_h.setup()

    comm = Comm.world(mesh8)
    op_d = BoundaryIntegralOp(Laplace3D_DxU, comm=comm)
    op_d.set_accuracy(1e-6)
    op_d.add_elem_list(sphere_patches(n_per_face=2, q=6))
    op_d.setup()
    assert set(op_d.near_pairs) == set(op_h.near_pairs)

    rng = np.random.default_rng(7)
    sigma = rng.normal(size=op_h.dim(0))
    U_h = op_h.compute_potential(sigma)
    U_d = op_d.compute_potential(sigma)
    np.testing.assert_allclose(U_d, U_h, atol=1e-11
                               * np.abs(U_h).max())
