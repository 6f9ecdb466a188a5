"""Potential-theory kernel library.

TPU-native equivalent of the reference micro-kernel library (reference:
include/sctl/kernel_functions.hpp:15-198 — Laplace3D {FxU, DxU, FxdU},
Stokes3D {FxU, DxU, FxT, FSxU, FxUP}) and the `GenericKernel` CRTP wrapper
(generic-kernel.hpp:33-52).  Conventions match the reference:

  r            = x_target - x_source                (generic-kernel.txx)
  u[k0][k1]    : out[k1] += u[k0][k1] * density[k0]
  scale_factor : applied once to the accumulated sum
  r == 0       : zero contribution (masked rsqrt — self-interactions drop)

Each kernel provides two execution forms:

  matrix(dx, n)               -> (..., kdim0, kdim1) kernel matrix blocks,
                                 for assembly (near interactions, tests).
  apply_pairwise(xt, xs, ns, f) -> (T, kdim1): the *applied* operator on
                                 a (target-block, source-block) pair.

`apply_pairwise` is the TPU formulation of the reference's SIMD hot loop
(generic-kernel.txx:76-189, SURVEY.md §3.5): instead of lanes-of-targets
x broadcast-source FMA, it builds O(T*S) pairwise *scalar* fields (r^2,
1/r, r.n, r.f) from rank-3 matmuls (MXU) and contracts densities with a
single (T,S) x (S,k) matmul (MXU) — no (T,S,3,3) tensor is materialized.
FLOP counts per interaction mirror kernel_functions.hpp:20,38,58,79,102,
127,153,179 for comparable GFLOP/s reporting.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Dict, Optional

import jax.numpy as jnp
from jax import lax


def _rinv(r2, mask=None):
    """Masked reciprocal sqrt: 0 where r2==0 (reference: approx_rsqrt
    with mask r2>0, vec.txx:357-370).  An optional per-pair `mask`
    multiplies in: every kernel term carries a power of rinv, so
    masking rinv masks the whole interaction (used for adjacency-
    restricted pair sets)."""
    out = jnp.where(r2 > 0, lax.rsqrt(jnp.where(r2 > 0, r2, 1.0)), 0.0)
    return out if mask is None else out * mask


def _pairwise_r2(xt, xs):
    """(T,S) squared distances via explicit differences.

    NOT the |xt|^2+|xs|^2-2xt.xs matmul form: that cancels
    catastrophically for coincident points (r2 ~ eps*|x|^2 instead of
    exactly 0), defeating the self-interaction mask — the reference
    computes dX = xt - xs directly for the same reason
    (generic-kernel.txx:160).  XLA fuses the broadcasts into the
    consumer, so no (T,S,3) tensor materializes.
    """
    r2 = None
    for d in range(xt.shape[1]):
        dx = xt[:, d][:, None] - xs[:, d][None, :]
        r2 = dx * dx if r2 is None else r2 + dx * dx
    return r2


def _rdot(xt, xs, v):
    """(T,S) pairwise r.v for per-source vectors v: (xt - xs).v_s.

    Explicit-difference form (like `_pairwise_r2`), NOT the
    xt@v.T - (xs.v) matmul form: on TPU an unannotated f32 matmul
    runs at bf16 (~1e-3), and the subtraction cancels for nearby
    points, amplifying that rounding by |x|/r — measured O(1) errors
    in the Stokes near field at fine tree levels."""
    acc = None
    for d in range(xt.shape[1]):
        t = (xt[:, d][:, None] - xs[:, d][None, :]) * v[:, d][None, :]
        acc = t if acc is None else acc + t
    return acc


@dataclasses.dataclass(frozen=True)
class KernelSpec:
    """Kernel descriptor (the GenericKernel deduction set,
    generic-kernel.hpp:33-52: DIM/KDIM0/KDIM1/normal-dim/FLOPS/scale)."""
    name: str
    dim: int
    kdim0: int
    kdim1: int
    needs_normal: bool
    flops: int                      # flops per source-target interaction
    scale_factor: float
    matrix_fn: Callable             # (dx, n) -> (..., kdim0, kdim1)
    apply_fn: Callable              # (xt, xs, ns, f) -> (T, kdim1)
    # source/target scaling exponents under box rescale x -> a*x:
    # K(a*r) = a^scale_exp * K(r)  (for scale-invariant kernels; used by
    # FMM auto-scaling, fmm-wrapper.txx:607 BuildSrcTrgScal)
    scale_exp: float = 0.0
    # per-component homogeneity split (the reference's per-dim
    # src_scal/trg_scal vectors, fmm-wrapper.txx:607-660):
    # K(a*r)[i,j] = a^-(src_scal[i] + trg_scal[j]) K(r)[i,j].
    # Lets the FMM derive every level's translation tables from ONE
    # unit-box precompute by outer diagonal scaling.
    src_scal: tuple = None
    trg_scal: tuple = None

    def matrix(self, dx, n=None):
        """Kernel matrix blocks WITHOUT the scale factor prefactor
        applied per-entry; caller multiplies (matches uKerScaleFactor
        placement in generic-kernel.txx:182-188)."""
        return self.matrix_fn(dx, n)

    def apply_pairwise(self, xt, xs, ns, f, mask=None):
        return self.apply_fn(xt, xs, ns, f, mask)

    def full_matrix(self, xt, xs, ns=None):
        """Dense (S*kdim0, T*kdim1) kernel matrix INCLUDING scale factor
        (reference: GenericKernel::KernelMatrix, generic-kernel.txx:191)."""
        dx = xt[None, :, :] - xs[:, None, :]            # (S,T,3)
        n = None if ns is None else ns[:, None, :] * jnp.ones_like(dx)
        m = self.matrix_fn(dx, n) * self.scale_factor   # (S,T,k0,k1)
        S, T = xs.shape[0], xt.shape[0]
        return m.transpose(0, 2, 1, 3).reshape(S * self.kdim0,
                                               T * self.kdim1)


# ---------------------------------------------------------------------------
# Laplace 3D
# ---------------------------------------------------------------------------

def _lap_fxu_matrix(dx, n):
    r2 = jnp.sum(dx * dx, axis=-1)
    return _rinv(r2)[..., None, None]


def _lap_fxu_apply(xt, xs, ns, f, mask=None):
    r2 = _pairwise_r2(xt, xs)
    return jnp.dot(_rinv(r2, mask), f,
                   preferred_element_type=f.dtype,
                 precision=lax.Precision.HIGHEST)


def _lap_dxu_matrix(dx, n):
    r2 = jnp.sum(dx * dx, axis=-1)
    rinv = _rinv(r2)
    rdotn = jnp.sum(dx * n, axis=-1)
    return (rdotn * rinv * rinv * rinv)[..., None, None]


def _lap_dxu_apply(xt, xs, ns, f, mask=None):
    r2 = _pairwise_r2(xt, xs)
    rinv = _rinv(r2, mask)
    rdotn = _rdot(xt, xs, ns)
    return jnp.dot(rdotn * rinv * rinv * rinv, f,
                   preferred_element_type=f.dtype,
                 precision=lax.Precision.HIGHEST)


def _lap_fxdu_matrix(dx, n):
    r2 = jnp.sum(dx * dx, axis=-1)
    rinv = _rinv(r2)
    rinv3 = (rinv * rinv * rinv)[..., None]
    return (dx * rinv3)[..., None, :]                   # (...,1,3)


def _lap_fxdu_apply(xt, xs, ns, f, mask=None):
    # out_i = sum_s r_i rinv3 f_s = xt_i*(rinv3@f) - rinv3@(xs_i*f)
    r2 = _pairwise_r2(xt, xs)
    rinv = _rinv(r2, mask)
    rinv3 = rinv * rinv * rinv
    B = jnp.concatenate([f, xs * f], axis=1)            # (S,4)
    H = jnp.dot(rinv3, B, preferred_element_type=f.dtype,
                 precision=lax.Precision.HIGHEST)  # (T,4)
    return xt * H[:, :1] - H[:, 1:4]


# ---------------------------------------------------------------------------
# Stokes 3D
# ---------------------------------------------------------------------------

def _stk_fxu_matrix(dx, n):
    r2 = jnp.sum(dx * dx, axis=-1)
    rinv = _rinv(r2)
    rinv3 = rinv * rinv * rinv
    eye = jnp.eye(3, dtype=dx.dtype)
    return (eye * rinv[..., None, None]
            + dx[..., :, None] * dx[..., None, :] * rinv3[..., None, None])


def _stk_fxu_terms(xt, xs, f, rinv, rinv3):
    """Shared Stokeslet application: rinv@f + r (r.f) rinv3."""
    term1 = jnp.dot(rinv, f, preferred_element_type=f.dtype,
                 precision=lax.Precision.HIGHEST)
    C = _rdot(xt, xs, f) * rinv3                        # (T,S)
    B = jnp.concatenate([jnp.ones_like(xs[:, :1]), xs], axis=1)  # (S,4)
    H = jnp.dot(C, B, preferred_element_type=f.dtype,
                 precision=lax.Precision.HIGHEST)   # (T,4)
    return term1 + xt * H[:, :1] - H[:, 1:4]


def _stk_fxu_apply(xt, xs, ns, f, mask=None):
    r2 = _pairwise_r2(xt, xs)
    rinv = _rinv(r2, mask)
    return _stk_fxu_terms(xt, xs, f, rinv, rinv * rinv * rinv)


def _stk_dxu_matrix(dx, n):
    r2 = jnp.sum(dx * dx, axis=-1)
    rinv = _rinv(r2)
    rinv2 = rinv * rinv
    rinv5 = rinv2 * rinv2 * rinv
    rdotn = jnp.sum(dx * n, axis=-1)
    s = (rdotn * rinv5)[..., None, None]
    return dx[..., :, None] * dx[..., None, :] * s


def _stk_dxu_apply(xt, xs, ns, f, mask=None):
    # out_j = sum_s r_j (r.f)(r.n) rinv5
    r2 = _pairwise_r2(xt, xs)
    rinv = _rinv(r2, mask)
    rinv2 = rinv * rinv
    D = _rdot(xt, xs, f) * _rdot(xt, xs, ns) * (rinv2 * rinv2 * rinv)
    B = jnp.concatenate([jnp.ones_like(xs[:, :1]), xs], axis=1)
    H = jnp.dot(D, B, preferred_element_type=f.dtype,
                 precision=lax.Precision.HIGHEST)
    return xt * H[:, :1] - H[:, 1:4]


def _stk_fxt_matrix(dx, n):
    r2 = jnp.sum(dx * dx, axis=-1)
    rinv = _rinv(r2)
    rinv2 = rinv * rinv
    rinv5 = (rinv2 * rinv2 * rinv)[..., None, None, None]
    rr = dx[..., :, None, None] * dx[..., None, :, None] \
        * dx[..., None, None, :] * rinv5                 # (...,3,3,3)
    return rr.reshape(rr.shape[:-3] + (3, 9))


def _stk_fxt_apply(xt, xs, ns, f, mask=None):
    # out_{jk} = sum_s (r.f) rinv5 r_j r_k ; expand r_j r_k into moments
    r2 = _pairwise_r2(xt, xs)
    rinv = _rinv(r2, mask)
    rinv2 = rinv * rinv
    E = _rdot(xt, xs, f) * (rinv2 * rinv2 * rinv)        # (T,S)
    ones = jnp.ones_like(xs[:, :1])
    xx = (xs[:, :, None] * xs[:, None, :]).reshape(-1, 9)
    B = jnp.concatenate([ones, xs, xx], axis=1)          # (S,13)
    H = jnp.dot(E, B, preferred_element_type=f.dtype,
                 precision=lax.Precision.HIGHEST)    # (T,13)
    h0, hx, hxx = H[:, :1], H[:, 1:4], H[:, 4:13].reshape(-1, 3, 3)
    out = (xt[:, :, None] * xt[:, None, :] * h0[:, :, None]
           - xt[:, :, None] * hx[:, None, :]
           - hx[:, :, None] * xt[:, None, :] + hxx)
    return out.reshape(-1, 9)


def _stk_fsxu_matrix(dx, n):
    stk = _stk_fxu_matrix(dx, n)                         # (...,3,3)
    r2 = jnp.sum(dx * dx, axis=-1)
    rinv = _rinv(r2)
    rinv3 = (rinv * rinv * rinv)[..., None]
    src = (dx * rinv3)[..., None, :]                     # (...,1,3)
    return jnp.concatenate([stk, src], axis=-2)          # (...,4,3)


def _stk_fsxu_apply(xt, xs, ns, f, mask=None):
    r2 = _pairwise_r2(xt, xs)
    rinv = _rinv(r2, mask)
    rinv3 = rinv * rinv * rinv
    u = _stk_fxu_terms(xt, xs, f[:, :3], rinv, rinv3)
    # source/sink: u_j += sum_s r_j rinv3 q_s
    q = f[:, 3:4]
    B = jnp.concatenate([q, xs * q], axis=1)
    H = jnp.dot(rinv3, B, preferred_element_type=f.dtype,
                 precision=lax.Precision.HIGHEST)
    return u + xt * H[:, :1] - H[:, 1:4]


def _stk_fxup_matrix(dx, n):
    stk = _stk_fxu_matrix(dx, n)                         # (...,3,3)
    r2 = jnp.sum(dx * dx, axis=-1)
    rinv = _rinv(r2)
    rinv3 = (rinv * rinv * rinv)[..., None]
    p = (dx * rinv3)[..., :, None]                       # (...,3,1)
    return jnp.concatenate([stk, p], axis=-1)            # (...,3,4)


def _stk_fxup_apply(xt, xs, ns, f, mask=None):
    r2 = _pairwise_r2(xt, xs)
    rinv = _rinv(r2, mask)
    rinv3 = rinv * rinv * rinv
    u = _stk_fxu_terms(xt, xs, f, rinv, rinv3)
    # pressure: p = sum_s (r.f) rinv3
    C = _rdot(xt, xs, f) * rinv3
    p = jnp.sum(C, axis=1, keepdims=True)
    return jnp.concatenate([u, p], axis=1)


_PI = math.pi

Laplace3D_FxU = KernelSpec(
    "Laplace3D-FxU", 3, 1, 1, False, 6, 1 / (4 * _PI),
    _lap_fxu_matrix, _lap_fxu_apply, scale_exp=-1.0,
    src_scal=(1.0,), trg_scal=(0.0,))
Laplace3D_DxU = KernelSpec(
    "Laplace3D-DxU", 3, 1, 1, True, 14, 1 / (4 * _PI),
    _lap_dxu_matrix, _lap_dxu_apply, scale_exp=-2.0,
    src_scal=(2.0,), trg_scal=(0.0,))
Laplace3D_FxdU = KernelSpec(
    "Laplace3D-FxdU", 3, 1, 3, False, 11, -1 / (4 * _PI),
    _lap_fxdu_matrix, _lap_fxdu_apply, scale_exp=-2.0,
    src_scal=(1.0,), trg_scal=(1.0, 1.0, 1.0))
Stokes3D_FxU = KernelSpec(
    "Stokes3D-FxU", 3, 3, 3, False, 23, 1 / (8 * _PI),
    _stk_fxu_matrix, _stk_fxu_apply, scale_exp=-1.0,
    src_scal=(1.0, 1.0, 1.0), trg_scal=(0.0, 0.0, 0.0))
Stokes3D_DxU = KernelSpec(
    "Stokes3D-DxU", 3, 3, 3, True, 26, 3 / (4 * _PI),
    _stk_dxu_matrix, _stk_dxu_apply, scale_exp=-2.0,
    src_scal=(2.0, 2.0, 2.0), trg_scal=(0.0, 0.0, 0.0))
Stokes3D_FxT = KernelSpec(
    "Stokes3D-FxT", 3, 3, 9, False, 39, -3 / (4 * _PI),
    _stk_fxt_matrix, _stk_fxt_apply, scale_exp=-2.0,
    src_scal=(1.0, 1.0, 1.0), trg_scal=(1.0,) * 9)
Stokes3D_FSxU = KernelSpec(
    "Stokes3D-FSxU", 3, 4, 3, False, 26, 1 / (8 * _PI),
    _stk_fsxu_matrix, _stk_fsxu_apply, scale_exp=-1.0,
    src_scal=(1.0, 1.0, 1.0, 2.0), trg_scal=(0.0, 0.0, 0.0))
Stokes3D_FxUP = KernelSpec(
    "Stokes3D-FxUP", 3, 3, 4, False, 26, 1 / (8 * _PI),
    _stk_fxup_matrix, _stk_fxup_apply, scale_exp=-1.0,
    src_scal=(1.0, 1.0, 1.0), trg_scal=(0.0, 0.0, 0.0, 1.0))

KERNELS: Dict[str, KernelSpec] = {
    k.name: k for k in (
        Laplace3D_FxU, Laplace3D_DxU, Laplace3D_FxdU, Stokes3D_FxU,
        Stokes3D_DxU, Stokes3D_FxT, Stokes3D_FSxU, Stokes3D_FxUP)
}
