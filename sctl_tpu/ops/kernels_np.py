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
    xt = np.atleast_2d(np.asarray(xt, np.float64))
    xs = np.atleast_2d(np.asarray(xs, np.float64))
    d, rinv = _geom(xt, xs)                        # d: (T,S,3)
    T, S = rinv.shape
    name = ker.name
    if name == "Laplace3D-FxU":
        m = rinv[..., None, None]
    elif name == "Laplace3D-DxU":
        rdotn = (d * ns[None, :, :]).sum(-1)
        m = (rdotn * rinv ** 3)[..., None, None]
    elif name == "Laplace3D-FxdU":
        m = (d * (rinv ** 3)[..., None])[..., None, :]
    elif name == "Stokes3D-FxU":
        m = (np.eye(3) * rinv[..., None, None]
             + d[..., :, None] * d[..., None, :]
             * (rinv ** 3)[..., None, None])
    elif name == "Stokes3D-DxU":
        rdotn = (d * ns[None, :, :]).sum(-1)
        m = d[..., :, None] * d[..., None, :] * (
            rdotn * rinv ** 5)[..., None, None]
    elif name == "Stokes3D-FxT":
        rr = (d[..., :, None, None] * d[..., None, :, None]
              * d[..., None, None, :] * (rinv ** 5)[..., None, None,
                                                    None])
        m = rr.reshape(T, S, 3, 9)
    elif name == "Stokes3D-FSxU":
        stk = (np.eye(3) * rinv[..., None, None]
               + d[..., :, None] * d[..., None, :]
               * (rinv ** 3)[..., None, None])
        src = (d * (rinv ** 3)[..., None])[..., None, :]
        m = np.concatenate([stk, src], axis=-2)
    elif name == "Stokes3D-FxUP":
        stk = (np.eye(3) * rinv[..., None, None]
               + d[..., :, None] * d[..., None, :]
               * (rinv ** 3)[..., None, None])
        p = (d * (rinv ** 3)[..., None])[..., :, None]
        m = np.concatenate([stk, p], axis=-1)
    else:
        raise NotImplementedError(name)
    m = m * ker.scale_factor                       # (T,S,k0,k1)
    return m.transpose(1, 2, 0, 3).reshape(S * ker.kdim0,
                                           T * ker.kdim1)
