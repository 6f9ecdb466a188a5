"""Matrix-free distributed GMRES with Krylov-subspace recycling.

TPU-native rebuild of the reference solver (reference:
include/sctl/lin-solve.hpp:21-112, lin-solve.txx:80-251; SURVEY.md §3.1).
Semantics preserved:

  - matrix-free: user supplies ``A(x) -> Ax`` on distributed vectors
  - relative (or absolute) tolerance on the residual norm
  - Givens-rotation least squares on the Hessenberg system
  - ``KrylovPrecond``: accumulates the Krylov subspace of each solve and
    preconditions later solves, P <- P (I + U Qt)
    (lin-solve.txx:38-64, 213-246)

TPU-first differences:

  - Distribution is implicit: vectors are jax.Arrays (sharded or not);
    inner products under jit become psum-reduced collectives via GSPMD —
    no explicit Allreduce calls (the reference's inner_prod,
    lin-solve.txx:68-78, is the jnp.vdot of a sharded array).
  - Orthogonalization is CGS2 (classical Gram-Schmidt with
    re-orthogonalization) instead of sequential modified Gram-Schmidt:
    two (k,N) GEMVs per iteration on the MXU rather than k dependent
    dot-axpy round trips.  CGS2 matches MGS stability (the reference
    itself ships a commented-out re-orthogonalization variant,
    lin-solve.txx:145-151).
  - The Krylov basis is preallocated at max_krylov rows and every
    iteration runs full-size GEMVs with zero padding, so the step
    function traces exactly once.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import profile


class KrylovPrecond:
    """P <- P (I + U Qt) Krylov-subspace preconditioner (reference:
    lin-solve.hpp:21-64)."""

    def __init__(self):
        self._pairs = []          # list of (Qt (N,k), U (k,N)), newest first
        self._n = 0

    def size(self) -> int:
        return self._n

    def rank(self) -> int:
        return sum(int(qt.shape[1]) for qt, _ in self._pairs)

    def append(self, Qt, U) -> None:
        n = Qt.shape[0]
        if n != self._n:          # dimension changed: reset
            self._pairs = []
            self._n = n
        self._pairs.insert(0, (Qt, U))

    def apply(self, y):
        """y <- y (I + U Qt) applied for each stored pair, newest first
        (reference: lin-solve.txx:50-64)."""
        for Qt, U in self._pairs:
            y = y + jnp.dot(jnp.dot(y, Qt), U)
        return y


@partial(jax.jit, static_argnums=())
def _arnoldi_cgs2(Q, w):
    """Orthogonalize w against the rows of Q (zero rows are inert).

    Returns (h, q_new, h_norm): h = projections (len = rows of Q),
    q_new = normalized remainder."""
    h1 = jnp.dot(Q, w)
    w = w - jnp.dot(h1, Q)
    h2 = jnp.dot(Q, w)             # re-orthogonalization pass
    w = w - jnp.dot(h2, Q)
    h = h1 + h2
    nrm = jnp.sqrt(jnp.vdot(w, w))
    return h, w / jnp.where(nrm > 0, nrm, 1.0), nrm


def gmres(A: Callable, b, tol: float = 1e-10,
          max_iter: Optional[int] = None, use_abs_tol: bool = False,
          x0=None, krylov_precond: Optional[KrylovPrecond] = None,
          verbose: bool = False) -> Tuple[jax.Array, int]:
    """Solve A x = b.  Returns (x, iterations).

    Mirrors GMRES<Real>::operator() (lin-solve.txx:80-247): full GMRES
    (no restart), stopping on |residual| <= tol * |b| (or absolute).
    """
    N = b.shape[0]
    dtype = b.dtype
    if max_iter is None:
        # The reference defaults to unrestarted full GMRES (max_iter =
        # N, lin-solve.txx:249) but its basis grows incrementally; here
        # the basis is preallocated (max_iter+1, N), so an uncapped
        # default would allocate O(N^2) for large systems.  Cap at 500
        # (far beyond any test's iteration count); pass max_iter
        # explicitly to raise it.
        max_iter = min(int(N), 500)
    max_iter = min(max_iter, int(N))

    precond = krylov_precond
    apply_P = (precond.apply if precond is not None and precond.size() == N
               else (lambda v: v))

    if x0 is not None:
        r = b - A(x0)
        x = x0
    else:
        r = b
        x = jnp.zeros_like(b)

    b_norm = float(jnp.sqrt(jnp.vdot(b, b)))
    abs_tol = tol * (1.0 if use_abs_tol else b_norm)

    r_norm = float(jnp.sqrt(jnp.vdot(r, r)))
    if r_norm <= abs_tol or r_norm == 0.0:
        return x, 0

    # preallocated Krylov basis; row k is q_k (zero rows are inert in
    # the CGS2 GEMVs)
    Q = jnp.zeros((max_iter + 1, N), dtype=dtype)
    Q = Q.at[0].set(r / r_norm)

    # small host-side quantities (numpy): Hessenberg, rotations, rhs
    H = np.zeros((max_iter + 1, max_iter))
    cs = np.zeros(max_iter)
    sn = np.zeros(max_iter)
    beta = np.zeros(max_iter + 1)
    beta[0] = r_norm

    k = 0
    error = r_norm
    while k < max_iter and error > abs_tol:
        if verbose:
            print(f"{k:3d} KSP Residual norm {error:.12e}")
        w = A(apply_P(Q[k]))
        h, q_new, h_norm = _arnoldi_cgs2(Q, w)
        Q = Q.at[k + 1].set(q_new)
        h_host = np.asarray(h)
        hk = np.zeros(k + 2)
        hk[:k + 1] = h_host[:k + 1]
        hk[k + 1] = float(h_norm)

        # apply accumulated Givens rotations (lin-solve.txx:117-133)
        for i in range(k):
            t = cs[i] * hk[i] + sn[i] * hk[i + 1]
            hk[i + 1] = -sn[i] * hk[i] + cs[i] * hk[i + 1]
            hk[i] = t
        t = np.hypot(hk[k], hk[k + 1])
        cs[k], sn[k] = hk[k] / t, hk[k + 1] / t
        hk[k] = cs[k] * hk[k] + sn[k] * hk[k + 1]
        hk[k + 1] = 0.0
        H[:k + 2, k] = hk

        beta[k + 1] = -sn[k] * beta[k]
        beta[k] = cs[k] * beta[k]
        error = abs(beta[k + 1])
        k += 1
    if verbose:
        print(f"{k:3d} KSP Residual norm {error:.12e}")

    # back substitution: y = H[:k,:k]^-1 beta[:k]
    y = np.zeros(k)
    for i in range(k - 1, -1, -1):
        y[i] = (beta[i] - H[i, i + 1:k] @ y[i + 1:k]) / H[i, i]

    x_upd = jnp.dot(jnp.asarray(y, dtype=dtype), Q[:k])
    x_upd = apply_P(x_upd)
    x = x + x_upd

    if precond is not None and k > 0:
        _append_krylov(precond, Q, H, cs, sn, k, dtype)

    return x, k


def _append_krylov(precond: KrylovPrecond, Q, H, cs, sn, k: int, dtype):
    """Build (Qt, U) from this solve's basis and append
    (reference: lin-solve.txx:213-246).

    Qt = (M Q[:k+1])^T where M (k, k+1) composes the Givens rotations;
    U  = H[:k,:k]^{-1} Q[:k] - Qt^T.
    """
    # rotation map M: t_j init = Q[j] for j<k; rotations mix (j, j+1);
    # final row k-1 += sn[k-1] * Q[k]
    M = np.zeros((k, k + 1))
    M[:, :k] = np.eye(k)
    for j in range(k - 1):
        a, b_row = M[j].copy(), M[j + 1].copy()
        M[j] = cs[j] * a + sn[j] * b_row
        M[j + 1] = -sn[j] * a + cs[j] * b_row
    ek = np.zeros(k + 1)
    ek[k] = 1.0
    M[k - 1] = cs[k - 1] * M[k - 1] + sn[k - 1] * ek

    # the reference's packed-storage back-substitution (lin-solve.txx:
    # 227-237) produces R^{-T} of the rotated upper-triangular R
    Hk = H[:k, :k]
    Hinv = np.linalg.solve(Hk.T, np.eye(k))

    Qk1 = Q[:k + 1]                                    # (k+1, N) device
    Qt = jnp.dot(jnp.asarray(M, dtype=dtype), Qk1).T    # (N, k)
    U = jnp.dot(jnp.asarray(Hinv, dtype=dtype), Q[:k]) - Qt.T
    precond.append(Qt, U)


def _pair_device(Q, H, cs, sn, k, m, dtype):
    """Device-side (Qt (N, m), U (m, N)) recycling pair from one
    GMRES(m) cycle's basis — the traced form of `_append_krylov`
    (reference: lin-solve.txx:213-246).  Columns/rows >= k are zeroed
    (inert under the flat apply y + (y @ Qt) @ U)."""
    from jax import lax

    i = jnp.arange(m)
    j1 = jnp.arange(m + 1)
    M = (i[:, None] == j1[None, :]).astype(dtype)      # (m, m+1)

    def rotj(j, M):
        do = j < k - 1
        a = jnp.take(M, j, axis=0)
        bj = jnp.take(M, j + 1, axis=0)
        t = jnp.where(do, cs[j] * a + sn[j] * bj, a)
        u = jnp.where(do, -sn[j] * a + cs[j] * bj, bj)
        return M.at[j].set(t).at[j + 1].set(u)

    M = lax.fori_loop(0, m - 1, rotj, M)
    ek = (j1 == k).astype(dtype)
    # k == 0 (a cycle that started already converged — common once an
    # earlier cycle hit tol, since the restart scan has a fixed trip
    # count) must yield an INERT pair: M[k-1] would wrap to row -1 and
    # poison the preconditioner (measured: a BIE second-solve went
    # 22 -> 40 iterations from one such pair).
    kk = jnp.maximum(k, 1)
    rowk = cs[kk - 1] * jnp.take(M, kk - 1, axis=0) + sn[kk - 1] * ek
    M = M.at[kk - 1].set(rowk)
    M = jnp.where((i[:, None] < k) & (k > 0), M, 0.0)
    Qt = (M @ Q).T                                     # (N, m)
    Hm = jnp.where((i[:, None] < k) & (i[None, :] < k), H[:m, :m],
                   jnp.eye(m, dtype=dtype))
    HinvT = jax.scipy.linalg.solve_triangular(
        Hm.T, jnp.eye(m, dtype=dtype), lower=True)     # Hk^{-T} block
    U = HinvT @ Q[:m] - Qt.T
    U = jnp.where((i[:, None] < k) & (k > 0), U, 0.0)
    return Qt, U


def _apply_pair_precond(y, precond):
    """Right-preconditioner application for a (U, Qt) pair or a stack
    of pairs.

    2-D (U (k,N), Qt (N,k)): y -> y + (y @ Qt) @ U (lin-solve.txx:50-64).
    3-D (U (R,m,N), Qt (R,N,m)): stacked pairs from `gmres_device
    (recycle=True)`, applied newest (highest filled slot) first —
    zero-padded slots are inert.
    """
    from jax import lax

    if precond is None:
        return y
    U_p, Qt_p = precond
    if U_p.ndim == 2:
        return y + (y @ Qt_p) @ U_p
    R = U_p.shape[0]

    def step(j, y):
        s = R - 1 - j
        return y + (y @ Qt_p[s]) @ U_p[s]

    return lax.fori_loop(0, R, step, y)


def gmres_device(A: Callable, b, tol: float = 1e-10,
                 max_iter: int = 100, x0=None,
                 use_abs_tol: bool = False, restarts: int = 1,
                 precond=None, recycle: bool = False):
    """Fully device-resident (restarted) GMRES: the whole iteration
    (CGS2 Arnoldi, Givens rotations, convergence test) runs inside
    lax.while_loops — zero host synchronization per iteration OR per
    restart (the host variant `gmres` pays a device->host readback per
    Arnoldi step, milliseconds each against a remote TPU).

    A must be traceable (jit-compatible).  `max_iter` is the cycle
    length m; up to `restarts` cycles run (GMRES(m), each restarting
    from the current iterate) until the residual passes tol.
    `precond` is an optional (U, Qt) pair applied as the right
    preconditioner y -> y + (y @ Qt) @ U — the device-side form of
    KrylovPrecond.apply (reference lin-solve.txx:50-64); either a
    single 2-D pair (build on host with `gmres(...,
    krylov_precond=...)` and pass `(kp._pairs[0][1], kp._pairs[0][0])`)
    or the stacked 3-D (U, Qt) returned by a previous
    `recycle=True` call.

    With ``recycle=True`` the solver appends one (U, Qt) pair per
    restart cycle *inside the device loop* — each cycle is
    preconditioned by all previous cycles' subspaces, the device-loop
    form of the reference's P <- P (I + U Qt) accumulation
    (lin-solve.txx:213-246) — and returns
    (x, iters, err, (U_stack, Qt_stack)); pass the stack back as
    `precond` to recycle across solves.

    Returns (x, iters, residual_norm) as device values (iters =
    total inner iterations across cycles); jit the enclosing call.
    """
    from jax import lax

    N = b.shape[0]
    dtype = b.dtype
    m = int(min(max_iter, N))

    b_norm = jnp.sqrt(jnp.vdot(b, b))
    abs_tol = tol * jnp.where(use_abs_tol, 1.0, b_norm)

    cycle = _make_gmres_cycle(A, b, abs_tol, N, m, dtype)
    x0v = jnp.zeros_like(b) if x0 is None else x0

    if recycle:
        return _gmres_device_recycle(cycle, abs_tol, N, m, dtype,
                                     restarts, precond, x0v)

    apply_P = lambda y: _apply_pair_precond(y, precond)
    if restarts <= 1:
        x, k, err, _ = cycle(x0v, apply_P)
        return x, k, err

    def outer_cond(st):
        c, _, _, err = st
        return (c < restarts) & (err > abs_tol)

    def outer_body(st):
        c, x, total, _ = st
        x2, k, err, _ = cycle(x, apply_P)
        return (c + 1, x2, total + k, err)

    binf = jnp.asarray(jnp.inf, dtype=dtype)
    _, x, total, err = lax.while_loop(
        outer_cond, outer_body,
        (jnp.int32(0), x0v, jnp.int32(0), binf))
    return x, total, err


def _gmres_device_recycle(cycle, abs_tol, N, m, dtype, restarts,
                          precond, x0v):
    """Restarted device GMRES with per-cycle Krylov recycling: cycle c
    runs right-preconditioned by the (U, Qt) pairs of cycles 0..c-1
    (newest first) on top of the caller's base `precond`.  Pairs live
    in fixed (restarts, ...) buffers so the outer lax.while_loop has a
    static state shape; empty slots are zero and inert."""
    from jax import lax

    R = int(restarts)
    Qt_buf = jnp.zeros((R, N, m), dtype=dtype)
    U_buf = jnp.zeros((R, m, N), dtype=dtype)

    def applyP(y, Qt_b, U_b):
        def step(j, y):
            s = R - 1 - j        # newest (highest filled) slot first
            return y + (y @ Qt_b[s]) @ U_b[s]

        y = lax.fori_loop(0, R, step, y)
        return _apply_pair_precond(y, precond)

    def outer_cond(st):
        c, _, _, err, _, _ = st
        return (c < R) & (err > abs_tol)

    def outer_body(st):
        c, x, total, _, Qt_b, U_b = st
        aP = lambda y: applyP(y, Qt_b, U_b)
        x2, k, err, (Q, H, cs, sn) = cycle(x, aP)
        Qt, U = _pair_device(Q, H, cs, sn, k, m, dtype)
        return (c + 1, x2, total + k, err,
                Qt_b.at[c].set(Qt), U_b.at[c].set(U))

    binf = jnp.asarray(jnp.inf, dtype=dtype)
    _, x, total, err, Qt_buf, U_buf = lax.while_loop(
        outer_cond, outer_body,
        (jnp.int32(0), x0v, jnp.int32(0), binf, Qt_buf, U_buf))
    return x, total, err, (U_buf, Qt_buf)


def _make_gmres_cycle(A, b, abs_tol, N, m, dtype):
    """One right-preconditioned GMRES(m) cycle as a traced function
    (x, applyP) -> (x', k, err, (Q, H, cs, sn)); the basis pieces feed
    `_pair_device` for recycling."""
    from jax import lax

    def cycle(x, applyP):
        Ap = lambda v: A(applyP(v))

        def cond(state):
            k, _, _, _, _, beta, err = state
            return (k < m) & (err > abs_tol)

        def body(state):
            k, Q, H, cs, sn, beta, _ = state
            w = Ap(jnp.take(Q, k, axis=0))
            # CGS2 (rows > k of Q are zero and contribute nothing)
            h1 = Q @ w
            w = w - h1 @ Q
            h2 = Q @ w
            w = w - h2 @ Q
            h = h1 + h2
            h_norm = jnp.sqrt(jnp.vdot(w, w))
            Q2 = Q.at[k + 1].set(w / jnp.where(h_norm > 0, h_norm, 1.0))

            # hk = [h_0..h_k, h_norm] padded to m+1
            i = jnp.arange(m + 1)
            hk = jnp.where(i <= k, h, 0.0).at[k + 1].set(h_norm)

            def rot(j, hk):
                a = hk[j]
                bj = hk[j + 1]
                do = j < k
                t = jnp.where(do, cs[j] * a + sn[j] * bj, a)
                u = jnp.where(do, -sn[j] * a + cs[j] * bj, bj)
                return hk.at[j].set(t).at[j + 1].set(u)

            hk = lax.fori_loop(0, m, rot, hk)
            hkk = jnp.take(hk, k)
            hk1 = jnp.take(hk, k + 1)
            t = jnp.sqrt(hkk * hkk + hk1 * hk1)
            tsafe = jnp.where(t > 0, t, 1.0)
            ck = jnp.where(t > 0, hkk / tsafe, 1.0)
            sk = jnp.where(t > 0, hk1 / tsafe, 0.0)
            hk = hk.at[k].set(ck * hkk + sk * hk1).at[k + 1].set(0.0)
            cs2 = cs.at[k].set(ck)
            sn2 = sn.at[k].set(sk)
            H2 = H.at[:, k].set(hk)
            bk = jnp.take(beta, k)
            beta2 = beta.at[k + 1].set(-sk * bk).at[k].set(ck * bk)
            err = jnp.abs(jnp.take(beta2, k + 1))
            return (k + 1, Q2, H2, cs2, sn2, beta2, err)

        r = b - A(x)
        r_norm = jnp.sqrt(jnp.vdot(r, r))
        Q = jnp.zeros((m + 1, N), dtype=dtype)
        Q = Q.at[0].set(jnp.where(r_norm > 0, 1.0, 0.0) * r
                        / jnp.where(r_norm > 0, r_norm, 1.0))
        H = jnp.zeros((m + 1, m), dtype=dtype)
        cs = jnp.zeros(m, dtype=dtype)
        sn = jnp.zeros(m, dtype=dtype)
        beta = jnp.zeros(m + 1, dtype=dtype).at[0].set(r_norm)
        state0 = (jnp.int32(0), Q, H, cs, sn, beta, r_norm)
        k, Q, H, cs, sn, beta, err = lax.while_loop(cond, body,
                                                    state0)
        # masked back substitution: unused rows get unit diagonal,
        # zero rhs
        i = jnp.arange(m)
        Hm = H[:m, :m]
        Hm = jnp.where((i[:, None] < k) & (i[None, :] < k), Hm,
                       jnp.eye(m, dtype=dtype))
        rhs = jnp.where(i < k, beta[:m], 0.0)
        y = jax.scipy.linalg.solve_triangular(Hm, rhs, lower=False)
        return x + applyP(y @ Q[:m]), k, err, (Q, H, cs, sn)

    return cycle


def fgmres(A: Callable, b, M: Callable, tol: float = 1e-10,
           max_iter: Optional[int] = None, use_abs_tol: bool = False,
           x0=None, verbose: bool = False) -> Tuple[jax.Array, int]:
    """Flexible GMRES (Saad 1993): right preconditioning by an
    operator ``M(v, k) -> z`` that may CHANGE per iteration k — e.g. an
    inner iterative solve run to a loose tolerance, or a cycling
    multilevel sweep.  GMRES with KrylovPrecond (lin-solve.hpp:21-64)
    requires a fixed linear P; FGMRES lifts that restriction by
    storing the preconditioned vectors Z_k = M(q_k, k) alongside the
    Arnoldi basis and updating x += Z y instead of P(Q y).

    M is called OUTSIDE jit with (q_k, k); it may itself run jitted
    code (e.g. ``gmres_device`` as an inner solver).  Memory: one
    extra (max_iter, N) buffer for Z.

    Returns (x, iterations)."""
    N = b.shape[0]
    dtype = b.dtype
    if max_iter is None:
        max_iter = min(int(N), 500)
    max_iter = min(max_iter, int(N))

    if x0 is not None:
        r = b - A(x0)
        x = x0
    else:
        r = b
        x = jnp.zeros_like(b)

    b_norm = float(jnp.sqrt(jnp.vdot(b, b)))
    abs_tol = tol * (1.0 if use_abs_tol else b_norm)
    r_norm = float(jnp.sqrt(jnp.vdot(r, r)))
    if r_norm <= abs_tol or r_norm == 0.0:
        return x, 0

    Q = jnp.zeros((max_iter + 1, N), dtype=dtype)
    Q = Q.at[0].set(r / r_norm)
    Z = jnp.zeros((max_iter, N), dtype=dtype)

    H = np.zeros((max_iter + 1, max_iter))
    cs = np.zeros(max_iter)
    sn = np.zeros(max_iter)
    beta = np.zeros(max_iter + 1)
    beta[0] = r_norm

    k = 0
    error = r_norm
    while k < max_iter and error > abs_tol:
        if verbose:
            print(f"{k:3d} KSP Residual norm {error:.12e}")
        z = M(Q[k], k)
        Z = Z.at[k].set(z)
        w = A(z)
        h, q_new, h_norm = _arnoldi_cgs2(Q, w)
        Q = Q.at[k + 1].set(q_new)
        h_host = np.asarray(h)
        hk = np.zeros(k + 2)
        hk[:k + 1] = h_host[:k + 1]
        hk[k + 1] = float(h_norm)
        for i in range(k):
            t = cs[i] * hk[i] + sn[i] * hk[i + 1]
            hk[i + 1] = -sn[i] * hk[i] + cs[i] * hk[i + 1]
            hk[i] = t
        t = np.hypot(hk[k], hk[k + 1])
        cs[k], sn[k] = hk[k] / t, hk[k + 1] / t
        hk[k] = cs[k] * hk[k] + sn[k] * hk[k + 1]
        hk[k + 1] = 0.0
        H[:k + 2, k] = hk
        beta[k + 1] = -sn[k] * beta[k]
        beta[k] = cs[k] * beta[k]
        error = abs(beta[k + 1])
        k += 1
    if verbose:
        print(f"{k:3d} KSP Residual norm {error:.12e}")

    y = np.zeros(k)
    for i in range(k - 1, -1, -1):
        y[i] = (beta[i] - H[i, i + 1:k] @ y[i + 1:k]) / H[i, i]
    return x + jnp.dot(jnp.asarray(y, dtype=dtype), Z[:k]), k


def fgmres_device(A: Callable, b, M: Callable, tol: float = 1e-10,
                  max_iter: int = 100, x0=None,
                  use_abs_tol: bool = False):
    """Fully device-resident FGMRES(m): like `gmres_device` but the
    right preconditioner ``M(v, k)`` is a TRACEABLE callable that may
    depend on the iteration index k (a traced int32) — variable
    preconditioning inside one compiled while_loop.  Stores the
    preconditioned basis Z (one extra (m, N) buffer) and forms
    x += y @ Z.  Returns (x, iters, residual_norm)."""
    from jax import lax

    N = b.shape[0]
    dtype = b.dtype
    m = int(min(max_iter, N))

    b_norm = jnp.sqrt(jnp.vdot(b, b))
    abs_tol = tol * jnp.where(use_abs_tol, 1.0, b_norm)
    x0v = jnp.zeros_like(b) if x0 is None else x0

    def cond(state):
        k, _, _, _, _, _, _, err = state
        return (k < m) & (err > abs_tol)

    def body(state):
        k, Q, Z, H, cs, sn, beta, _ = state
        z = M(jnp.take(Q, k, axis=0), k)
        Z2 = Z.at[k].set(z)
        w = A(z)
        h1 = Q @ w
        w = w - h1 @ Q
        h2 = Q @ w
        w = w - h2 @ Q
        h = h1 + h2
        h_norm = jnp.sqrt(jnp.vdot(w, w))
        Q2 = Q.at[k + 1].set(w / jnp.where(h_norm > 0, h_norm, 1.0))
        i = jnp.arange(m + 1)
        hk = jnp.where(i <= k, h, 0.0).at[k + 1].set(h_norm)

        def rot(j, hk):
            a = hk[j]
            bj = hk[j + 1]
            do = j < k
            t = jnp.where(do, cs[j] * a + sn[j] * bj, a)
            u = jnp.where(do, -sn[j] * a + cs[j] * bj, bj)
            return hk.at[j].set(t).at[j + 1].set(u)

        hk = lax.fori_loop(0, m, rot, hk)
        hkk = jnp.take(hk, k)
        hk1 = jnp.take(hk, k + 1)
        t = jnp.sqrt(hkk * hkk + hk1 * hk1)
        tsafe = jnp.where(t > 0, t, 1.0)
        ck = jnp.where(t > 0, hkk / tsafe, 1.0)
        sk = jnp.where(t > 0, hk1 / tsafe, 0.0)
        hk = hk.at[k].set(ck * hkk + sk * hk1).at[k + 1].set(0.0)
        bk = jnp.take(beta, k)
        beta2 = beta.at[k + 1].set(-sk * bk).at[k].set(ck * bk)
        err = jnp.abs(jnp.take(beta2, k + 1))
        return (k + 1, Q2, Z2, H.at[:, k].set(hk), cs.at[k].set(ck),
                sn.at[k].set(sk), beta2, err)

    r = b - A(x0v)
    r_norm = jnp.sqrt(jnp.vdot(r, r))
    Q = jnp.zeros((m + 1, N), dtype=dtype)
    Q = Q.at[0].set(jnp.where(r_norm > 0, 1.0, 0.0) * r
                    / jnp.where(r_norm > 0, r_norm, 1.0))
    Z = jnp.zeros((m, N), dtype=dtype)
    H = jnp.zeros((m + 1, m), dtype=dtype)
    cs = jnp.zeros(m, dtype=dtype)
    sn = jnp.zeros(m, dtype=dtype)
    beta = jnp.zeros(m + 1, dtype=dtype).at[0].set(r_norm)
    state0 = (jnp.int32(0), Q, Z, H, cs, sn, beta, r_norm)
    k, Q, Z, H, cs, sn, beta, err = lax.while_loop(cond, body, state0)

    i = jnp.arange(m)
    Hm = H[:m, :m]
    Hm = jnp.where((i[:, None] < k) & (i[None, :] < k), Hm,
                   jnp.eye(m, dtype=dtype))
    rhs = jnp.where(i < k, beta[:m], 0.0)
    y = jax.scipy.linalg.solve_triangular(Hm, rhs, lower=False)
    return x0v + y @ Z, k, err


def gmres_ld(A: Callable, b, tol: float = 1e-16,
             max_iter: Optional[int] = None, use_abs_tol: bool = False,
             verbose: bool = False):
    """Host longdouble GMRES — the reference's long-double solver
    configuration (GMRES<long double>, src/test-gmres.cpp:1-20;
    QuadReal support math_utils.hpp:236-300).  Converges below the f64
    residual floor (~1e-15); pairs with the extended-precision FMM
    path (`fmm.KIFMMLd`) for accuracy-critical solves.

    A maps longdouble (N,) -> (N,) (numpy).  Pure numpy MGS Arnoldi +
    Givens least squares, all in np.longdouble.  Returns (x, iters)."""
    b = np.asarray(b, np.longdouble)
    N = b.shape[0]
    if max_iter is None:
        max_iter = min(int(N), 500)
    max_iter = min(max_iter, int(N))

    b_norm = float(np.sqrt(b @ b))
    abs_tol = tol * (1.0 if use_abs_tol else b_norm)
    r = b
    x = np.zeros(N, np.longdouble)
    r_norm = float(np.sqrt(r @ r))
    if r_norm <= abs_tol or r_norm == 0.0:
        return x, 0

    Q = np.zeros((max_iter + 1, N), np.longdouble)
    Q[0] = r / r_norm
    H = np.zeros((max_iter + 1, max_iter), np.longdouble)
    cs = np.zeros(max_iter, np.longdouble)
    sn = np.zeros(max_iter, np.longdouble)
    beta = np.zeros(max_iter + 1, np.longdouble)
    beta[0] = r_norm

    k = 0
    error = r_norm
    while k < max_iter and error > abs_tol:
        if verbose:
            print(f"{k:3d} KSP Residual norm {float(error):.12e}")
        w = np.asarray(A(Q[k]), np.longdouble)
        for i in range(k + 1):          # modified Gram-Schmidt
            H[i, k] = Q[i] @ w
            w = w - H[i, k] * Q[i]
        H[k + 1, k] = np.sqrt(w @ w)
        Q[k + 1] = w / (H[k + 1, k] if H[k + 1, k] > 0 else 1.0)
        for i in range(k):
            t = cs[i] * H[i, k] + sn[i] * H[i + 1, k]
            H[i + 1, k] = -sn[i] * H[i, k] + cs[i] * H[i + 1, k]
            H[i, k] = t
        t = np.sqrt(H[k, k] ** 2 + H[k + 1, k] ** 2)
        cs[k], sn[k] = H[k, k] / t, H[k + 1, k] / t
        H[k, k] = cs[k] * H[k, k] + sn[k] * H[k + 1, k]
        H[k + 1, k] = 0.0
        beta[k + 1] = -sn[k] * beta[k]
        beta[k] = cs[k] * beta[k]
        error = abs(float(beta[k + 1]))
        k += 1
    if verbose:
        print(f"{k:3d} KSP Residual norm {float(error):.12e}")

    y = np.zeros(k, np.longdouble)
    for i in range(k - 1, -1, -1):
        y[i] = (beta[i] - H[i, i + 1:k] @ y[i + 1:k]) / H[i, i]
    return x + y @ Q[:k], k


class GMRES:
    """Class facade mirroring the reference API
    (GMRES<Real>(comm, verbose); operator())."""

    def __init__(self, comm=None, verbose: bool = False):
        self.verbose = verbose

    def __call__(self, A, b, tol: float = 1e-10,
                 max_iter: Optional[int] = None,
                 use_abs_tol: bool = False, x0=None,
                 krylov_precond: Optional[KrylovPrecond] = None):
        with profile.Profile.scoped("GMRES"):
            return gmres(A, b, tol=tol, max_iter=max_iter,
                         use_abs_tol=use_abs_tol, x0=x0,
                         krylov_precond=krylov_precond,
                         verbose=self.verbose)
