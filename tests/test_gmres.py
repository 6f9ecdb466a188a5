"""GMRES + KrylovPrecond tests (reference anchors: GMRES::test
lin-solve.txx:253-283 — random NxN solve to 1e-10; test-linear-solver.cpp
— Krylov-preconditioner reuse halves iterations on second solve)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from sctl_tpu.linalg import GMRES, KrylovPrecond, gmres


def test_gmres_random_matrix():
    """Mirror of GMRES<Real>::test (lin-solve.txx:253)."""
    rng = np.random.default_rng(0)
    N = 15
    A = jnp.asarray(rng.random((N, N)))
    b = jnp.asarray(rng.random(N))
    x, iters = gmres(lambda v: A @ v, b, tol=1e-10)
    err = float(jnp.max(jnp.abs(A @ x - b)))
    assert err < 1e-9, err
    assert iters <= N


def test_gmres_identity_shortcut():
    b = jnp.ones(10)
    x, iters = gmres(lambda v: v, b, tol=1e-12)
    np.testing.assert_allclose(np.asarray(x), 1.0, atol=1e-12)
    assert iters == 1


def test_gmres_x0():
    rng = np.random.default_rng(1)
    N = 20
    A = jnp.asarray(rng.random((N, N)) + np.eye(N) * 5)
    xs = jnp.asarray(rng.random(N))
    b = A @ xs
    x, it1 = gmres(lambda v: A @ v, b, tol=1e-12)
    x2, it2 = gmres(lambda v: A @ v, b, tol=1e-12, x0=x)
    assert it2 == 0  # already converged
    np.testing.assert_allclose(np.asarray(x2), np.asarray(xs), atol=1e-9)


def test_krylov_precond_reuse():
    """Mirror of src/test-linear-solver.cpp: A = I + low-rank with
    exponentially decaying spectrum; second solve with recycled Krylov
    subspace needs far fewer iterations."""
    rng = np.random.default_rng(2)
    N, rank = 200, 200
    A = np.zeros((N, N))
    for r in range(rank):
        u = rng.random((N, 1))
        vt = rng.random((1, N))
        A += u @ vt * np.exp(np.log(np.finfo(np.float64).eps) * r / rank)
    A += np.eye(N)
    Aj = jnp.asarray(A)
    op = lambda v: Aj @ v

    kp = KrylovPrecond()
    x0 = jnp.asarray(rng.random(N))
    b = op(x0)
    x, it1 = gmres(op, b, tol=1e-10, krylov_precond=kp)
    resid1 = float(jnp.linalg.norm(op(x) - b) / jnp.linalg.norm(b))
    assert resid1 < 1e-9, resid1
    # forward error limited by cond(A) ~ 2e5 times the residual
    assert float(jnp.max(jnp.abs(x - x0))) < 1e-5
    assert kp.rank() == it1 and kp.size() == N

    x0b = jnp.asarray(rng.random(N))
    b2 = op(x0b)
    x2, it2 = gmres(op, b2, tol=1e-10, krylov_precond=kp)
    resid2 = float(jnp.linalg.norm(op(x2) - b2) / jnp.linalg.norm(b2))
    assert resid2 < 1e-9, resid2
    assert float(jnp.max(jnp.abs(x2 - x0b))) < 1e-5
    assert it2 < it1 / 2, (it1, it2)  # reference shows 23 -> 8


def test_gmres_sharded(mesh8):
    """Distributed GMRES: operator and vectors sharded over 8 devices;
    inner products become psum collectives under GSPMD (the reference's
    comm.Allreduce in inner_prod, lin-solve.txx:68-78)."""
    rng = np.random.default_rng(3)
    N = 256
    A = jnp.asarray(rng.random((N, N)) / N + np.eye(N))
    sh = NamedSharding(mesh8, P("x"))
    b = jax.device_put(jnp.asarray(rng.random(N)), sh)
    Ash = jax.device_put(A, NamedSharding(mesh8, P("x", None)))

    @jax.jit
    def op(v):
        return Ash @ v

    x, iters = gmres(op, b, tol=1e-10)
    err = float(jnp.max(jnp.abs(A @ x - b)))
    assert err < 1e-9, err


def test_gmres_class_facade():
    rng = np.random.default_rng(4)
    N = 30
    A = jnp.asarray(rng.random((N, N)) + np.eye(N) * 3)
    b = jnp.asarray(rng.random(N))
    solver = GMRES(verbose=False)
    x, iters = solver(lambda v: A @ v, b, tol=1e-11)
    assert float(jnp.linalg.norm(A @ x - b)) < 1e-10 * float(
        jnp.linalg.norm(b)) * 10


def test_gmres_device_matches_host():
    """Device-resident GMRES (lax.while_loop cycle) solves to the same
    tolerance as the host loop."""
    import jax
    import jax.numpy as jnp
    from sctl_tpu.linalg.gmres import gmres, gmres_device
    rng = np.random.default_rng(3)
    n = 80
    A = np.eye(n) * 4 + rng.normal(size=(n, n)) * 0.3
    b = rng.normal(size=n)
    op = lambda v: jnp.asarray(A) @ v
    x_h, it_h = gmres(op, jnp.asarray(b), tol=1e-10, max_iter=n)
    x_d, it_d, err = jax.jit(
        lambda bb: gmres_device(op, bb, tol=1e-10, max_iter=n))(
        jnp.asarray(b))
    r_d = np.linalg.norm(A @ np.asarray(x_d) - b) / np.linalg.norm(b)
    assert r_d < 1e-9, r_d
    assert abs(int(it_d) - it_h) <= 2
    np.testing.assert_allclose(np.asarray(x_d), np.asarray(x_h),
                               atol=1e-7)


def test_gmres_device_early_convergence():
    """Converges in k << max_iter iterations for a well-conditioned
    system and reports the iteration count."""
    import jax
    import jax.numpy as jnp
    from sctl_tpu.linalg.gmres import gmres_device
    n = 60
    A = np.eye(n) * 2.0
    b = np.ones(n)
    x, it, err = gmres_device(lambda v: jnp.asarray(A) @ v,
                              jnp.asarray(b), tol=1e-12, max_iter=50)
    assert int(it) <= 2
    np.testing.assert_allclose(np.asarray(x), 0.5, atol=1e-12)


def test_gmres_device_restarted():
    """GMRES(m) with restarts (device-resident outer loop) converges
    where a single short cycle cannot."""
    import jax
    import jax.numpy as jnp
    from sctl_tpu.linalg.gmres import gmres_device

    rng = np.random.default_rng(3)
    n = 40
    A = np.eye(n) + 0.25 * rng.normal(size=(n, n)) / np.sqrt(n)
    b = rng.normal(size=n)
    op = lambda v: jnp.asarray(A) @ v
    x1, it1, err1 = gmres_device(op, jnp.asarray(b), tol=1e-10,
                                 max_iter=10, restarts=1)
    xr, itr, errr = gmres_device(op, jnp.asarray(b), tol=1e-10,
                                 max_iter=10, restarts=8)
    assert float(err1) > 1e-10            # one short cycle: not there
    assert float(errr) <= 1e-10 * np.linalg.norm(b) * 1.01
    res = np.linalg.norm(A @ np.asarray(xr) - b)
    assert res < 1e-9 * np.linalg.norm(b)
    assert int(itr) > int(it1)


def test_gmres_device_krylov_precond():
    """Device-side (U, Qt) right preconditioner: a second solve with
    the recycled subspace converges in fewer iterations (reference
    KrylovPrecond behavior, lin-solve.hpp:21-64)."""
    import jax.numpy as jnp
    from sctl_tpu.linalg.gmres import (gmres, gmres_device,
                                       KrylovPrecond)

    rng = np.random.default_rng(5)
    n = 60
    A = np.eye(n) + 0.3 * rng.normal(size=(n, n)) / np.sqrt(n)
    op = lambda v: jnp.asarray(A) @ v
    kp = KrylovPrecond()
    b1 = rng.normal(size=n)
    gmres(op, jnp.asarray(b1), tol=1e-10, krylov_precond=kp)
    assert kp.rank() > 0
    Qt, U = kp._pairs[0]
    b2 = rng.normal(size=n)
    x_np, it_np, _ = gmres_device(op, jnp.asarray(b2), tol=1e-10,
                                  max_iter=n)
    x_p, it_p, _ = gmres_device(op, jnp.asarray(b2), tol=1e-10,
                                max_iter=n, precond=(U, Qt))
    res = np.linalg.norm(A @ np.asarray(x_p) - b2)
    assert res < 1e-8 * np.linalg.norm(b2)
    assert int(it_p) < int(it_np)


def test_gmres_device_recycle_in_loop():
    """Device-loop Krylov recycling (recycle=True): each restart cycle
    is preconditioned by the previous cycles' (U, Qt) pairs — the
    device form of the reference's per-solve P <- P (I + U Qt)
    accumulation (lin-solve.txx:213-246) — and the returned stack
    accelerates a later solve when passed back as `precond`."""
    import jax.numpy as jnp
    from sctl_tpu.linalg.gmres import gmres_device

    rng = np.random.default_rng(7)
    n = 60
    A = np.eye(n) + 0.3 * rng.normal(size=(n, n)) / np.sqrt(n)
    op = lambda v: jnp.asarray(A) @ v
    b1 = rng.normal(size=n)

    x, it, err, (U_s, Qt_s) = gmres_device(
        op, jnp.asarray(b1), tol=1e-10, max_iter=12, restarts=6,
        recycle=True)
    res = np.linalg.norm(A @ np.asarray(x) - b1)
    assert res < 1e-8 * np.linalg.norm(b1)
    assert U_s.shape == (6, 12, n) and Qt_s.shape == (6, n, 12)
    # at least one recycled pair is non-trivial
    assert float(jnp.abs(U_s).max()) > 0

    # recycling across solves: second rhs converges in fewer total
    # iterations with the stacked precond than without
    b2 = rng.normal(size=n)
    x0, it0, _ = gmres_device(op, jnp.asarray(b2), tol=1e-10,
                              max_iter=12, restarts=8)
    xp, itp, _ = gmres_device(op, jnp.asarray(b2), tol=1e-10,
                              max_iter=12, restarts=8,
                              precond=(U_s, Qt_s))
    resp = np.linalg.norm(A @ np.asarray(xp) - b2)
    assert resp < 1e-8 * np.linalg.norm(b2)
    assert int(itp) < int(it0)


def test_fgmres_variable_preconditioner():
    """FGMRES converges with a preconditioner that CHANGES per
    iteration (an inner Jacobi sweep whose depth varies with k) —
    the case plain right-preconditioned GMRES cannot express — and
    matches the unpreconditioned solution."""
    import jax.numpy as jnp
    from sctl_tpu.linalg.gmres import fgmres, gmres

    rng = np.random.default_rng(3)
    n = 80
    A = np.diag(np.linspace(1.0, 20.0, n)) + 0.1 * rng.normal(size=(n, n))
    op = lambda v: jnp.asarray(A) @ v
    b = rng.normal(size=n)
    d = jnp.asarray(np.diag(A))

    def M(v, k):
        # k-dependent inner sweep: one extra Jacobi step every 3 iters
        z = v / d
        for _ in range((k % 3) + 1):
            z = z + (v - op(z)) / d
        return z

    x, it = fgmres(op, jnp.asarray(b), M, tol=1e-10, max_iter=80)
    res = np.linalg.norm(A @ np.asarray(x) - b)
    assert res < 1e-8 * np.linalg.norm(b)

    x0, it0 = gmres(op, jnp.asarray(b), tol=1e-10, max_iter=80)
    assert it <= it0
    assert np.allclose(np.asarray(x), np.asarray(x0), atol=1e-7)


def test_fgmres_device_matches_host():
    """Device-resident FGMRES (traceable k-dependent preconditioner
    inside one while_loop) reaches the same solution as the host
    variant."""
    import jax
    import jax.numpy as jnp
    from sctl_tpu.linalg.gmres import fgmres_device

    rng = np.random.default_rng(4)
    n = 60
    A = np.diag(np.linspace(1.0, 10.0, n)) + 0.05 * rng.normal(size=(n, n))
    Aj = jnp.asarray(A)
    b = rng.normal(size=n)
    d = jnp.asarray(np.diag(A))

    def M(v, k):
        # traced k: blend of Jacobi and identity that shifts with k
        w = 1.0 / (1.0 + 0.1 * k.astype(v.dtype))
        return w * (v / d) + (1.0 - w) * v

    fn = jax.jit(lambda bb: fgmres_device(
        lambda v: Aj @ v, bb, M, tol=1e-10, max_iter=60))
    x, it, err = fn(jnp.asarray(b))
    res = np.linalg.norm(A @ np.asarray(x) - b)
    assert res < 1e-8 * np.linalg.norm(b)
    assert float(err) < 1e-10 * np.linalg.norm(b) * 1.01


def test_gmres_ld_below_f64_floor():
    """Host longdouble GMRES (the reference's GMRES<long double>
    configuration, src/test-gmres.cpp) converges BELOW the f64
    residual floor — a 1e-17 relative residual no f64 solver can
    reach."""
    from sctl_tpu.linalg.gmres import gmres_ld

    rng = np.random.default_rng(9)
    n = 60
    A = (np.eye(n) + 0.2 * rng.normal(size=(n, n)) / np.sqrt(n)
         ).astype(np.longdouble)
    b = rng.normal(size=n).astype(np.longdouble)
    x, it = gmres_ld(lambda v: A @ v, b, tol=1e-17, max_iter=n)
    r = A @ x - b
    rel = float(np.sqrt(r @ r) / np.sqrt(b @ b))
    assert rel < 1e-16, rel
    assert it <= n


def test_gmres_device_recycle_converged_cycles_inert():
    """A recycle=True solve whose FIRST cycle already reaches tol must
    return inert (zero) pairs for the remaining restart cycles — the
    k=0 pair construction once indexed row -1 and poisoned the stack
    (measured on the BIE bench: second solve 22 -> 40 iterations).
    The preconditioned second solve must never be SLOWER than plain."""
    import jax.numpy as jnp
    from sctl_tpu.linalg.gmres import gmres_device

    rng = np.random.default_rng(9)
    n = 40
    A = np.eye(n) + 0.05 * rng.normal(size=(n, n)) / np.sqrt(n)
    op = lambda v: jnp.asarray(A) @ v
    b1 = rng.normal(size=n)
    # max_iter ample: cycle 1 converges, cycles 2..4 run with k=0
    x, it, err, (U_s, Qt_s) = gmres_device(
        op, jnp.asarray(b1), tol=1e-10, max_iter=n, restarts=4,
        recycle=True)
    assert float(jnp.linalg.norm(op(x) - jnp.asarray(b1))) \
        < 1e-8 * np.linalg.norm(b1)
    # trailing cycles' pairs are exactly zero
    assert float(jnp.abs(U_s[1:]).max()) == 0.0
    assert float(jnp.abs(Qt_s[1:]).max()) == 0.0
    b2 = rng.normal(size=n)
    x0, it0, _ = gmres_device(op, jnp.asarray(b2), tol=1e-10,
                              max_iter=n)
    xp, itp, _ = gmres_device(op, jnp.asarray(b2), tol=1e-10,
                              max_iter=n, precond=(U_s, Qt_s))
    assert float(jnp.linalg.norm(op(xp) - jnp.asarray(b2))) \
        < 1e-8 * np.linalg.norm(b2)
    assert int(itp) <= int(it0), (int(itp), int(it0))
