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
        max_iter = int(N)
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
