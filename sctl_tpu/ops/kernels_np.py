"""Pure-numpy kernel matrix evaluation (host precompute path).

Setup-time quadrature (BIE singular integration, FMM operator
precompute) makes thousands of small kernel-matrix evaluations; routing
those through the device runtime (eager jnp dispatch, possibly over a
remote tunnel) dominates setup.  These mirror ops/kernels.py matrix
functions in numpy — same conventions (r = xt - xs, (k0,k1) blocks,
scale factor INCLUDED, masked r=0).
"""

from __future__ import annotations

import numpy as np

from .kernels import KernelSpec


def _geom(xt, xs):
    d = xt[:, None, :] - xs[None, :, :]            # (T,S,3)
    r2 = (d * d).sum(-1)
    rinv = np.where(r2 > 0, 1.0 / np.sqrt(np.where(r2 > 0, r2, 1.0)),
                    0.0)
    return d, rinv


def full_matrix_np(ker: KernelSpec, xt: np.ndarray, xs: np.ndarray,
                   ns=None) -> np.ndarray:
    """(Ns*k0, Nt*k1) matrix, scale factor included — numpy mirror of
    KernelSpec.full_matrix."""
    m = block_matrix_np(ker, xt, xs, ns)           # (T,S,k0,k1)
    T, S = m.shape[:2]
    return m.transpose(1, 2, 0, 3).reshape(S * ker.kdim0,
                                           T * ker.kdim1)


def block_matrix_np(ker: KernelSpec, xt: np.ndarray, xs: np.ndarray,
                    ns=None) -> np.ndarray:
    """(T, S, k0, k1) kernel blocks, scale factor included — the
    batched-target form used by the BIE near-setup waves.

    Longdouble inputs stay longdouble (the QuadReal-path precompute,
    math_utils.hpp:236-300); everything else computes in f64."""
    dt = (np.longdouble
          if (np.asarray(xt).dtype == np.longdouble
              or np.asarray(xs).dtype == np.longdouble)
          else np.float64)
    xt = np.atleast_2d(np.asarray(xt, dt))
    xs = np.atleast_2d(np.asarray(xs, dt))
    d, rinv = _geom(xt, xs)                        # d: (T,S,3)
    if ns is not None:
        ns = np.broadcast_to(np.asarray(ns), d.shape)
    return offset_blocks_np(ker, d, rinv, ns)


def offset_blocks_np(ker: KernelSpec, d: np.ndarray, rinv=None,
                     ns=None) -> np.ndarray:
    """(..., k0, k1) kernel blocks from precomputed displacements
    d = xt - xs (..., 3) (and optional per-pair source normals of the
    same shape) — the paired form for quadratures whose source set
    differs per target (batched Duffy near-setup)."""
    d = np.asarray(d, np.longdouble
                   if np.asarray(d).dtype == np.longdouble
                   else np.float64)
    if rinv is None:
        r2 = (d * d).sum(-1)
        rinv = np.where(r2 > 0,
                        1.0 / np.sqrt(np.where(r2 > 0, r2, 1.0)), 0.0)
    from .uker import uker_matrix
    m = uker_matrix(ker.name, d, rinv, ns, np)
    return m * ker.scale_factor                    # (T,S,k0,k1)
