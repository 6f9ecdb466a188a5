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

from .uker import UKER_APPLY, uker_matrix


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


class _ApplyLayout:
    """uker adapter for the (T, S) jnp.dot lowering of the applied
    kernels (direct_eval, ring EvalDirect): pairwise scalar fields on
    (T, S), moments as one HIGHEST-precision (T,S)x(S,k) matmul."""
    __slots__ = ("xt", "xs", "ns", "fv", "mask")

    def __init__(self, xt, xs, ns, f, mask):
        self.xt, self.xs, self.ns, self.fv = xt, xs, ns, f
        self.mask = mask

    def r2(self):
        return _pairwise_r2(self.xt, self.xs)

    def rinv(self, r2):
        return _rinv(r2, self.mask)

    def rdotf(self, idx):
        return _rdot(self.xt, self.xs, self.fv[:, :3])

    def rdotn(self):
        return _rdot(self.xt, self.xs, self.ns)

    def f(self, i):
        return self.fv[:, i]

    def s(self, d):
        return self.xs[:, d]

    def ones(self):
        return jnp.ones_like(self.xs[:, 0])

    def moments(self, field, ws):
        B = jnp.stack(ws, axis=1)                        # (S, k)
        H = jnp.dot(field, B, preferred_element_type=self.fv.dtype,
                    precision=lax.Precision.HIGHEST)     # (T, k)
        return [H[:, i:i + 1] for i in range(len(ws))]

    def t(self, d):
        return self.xt[:, d:d + 1]

    def out(self, cols):
        return (jnp.concatenate(cols, axis=1) if len(cols) > 1
                else cols[0])


def _uker_apply_fn(name):
    body = UKER_APPLY[name]

    def apply_fn(xt, xs, ns, f, mask=None):
        return body(_ApplyLayout(xt, xs, ns, f, mask))

    return apply_fn


def _uker_matrix_fn(name):
    def matrix_fn(dx, n):
        r2 = jnp.sum(dx * dx, axis=-1)
        return uker_matrix(name, dx, _rinv(r2), n, jnp)

    return matrix_fn


_PI = math.pi

Laplace3D_FxU = KernelSpec(
    "Laplace3D-FxU", 3, 1, 1, False, 6, 1 / (4 * _PI),
    _uker_matrix_fn("Laplace3D-FxU"), _uker_apply_fn("Laplace3D-FxU"), scale_exp=-1.0,
    src_scal=(1.0,), trg_scal=(0.0,))
Laplace3D_DxU = KernelSpec(
    "Laplace3D-DxU", 3, 1, 1, True, 14, 1 / (4 * _PI),
    _uker_matrix_fn("Laplace3D-DxU"), _uker_apply_fn("Laplace3D-DxU"), scale_exp=-2.0,
    src_scal=(2.0,), trg_scal=(0.0,))
Laplace3D_FxdU = KernelSpec(
    "Laplace3D-FxdU", 3, 1, 3, False, 11, -1 / (4 * _PI),
    _uker_matrix_fn("Laplace3D-FxdU"), _uker_apply_fn("Laplace3D-FxdU"), scale_exp=-2.0,
    src_scal=(1.0,), trg_scal=(1.0, 1.0, 1.0))
Stokes3D_FxU = KernelSpec(
    "Stokes3D-FxU", 3, 3, 3, False, 23, 1 / (8 * _PI),
    _uker_matrix_fn("Stokes3D-FxU"), _uker_apply_fn("Stokes3D-FxU"), scale_exp=-1.0,
    src_scal=(1.0, 1.0, 1.0), trg_scal=(0.0, 0.0, 0.0))
Stokes3D_DxU = KernelSpec(
    "Stokes3D-DxU", 3, 3, 3, True, 26, 3 / (4 * _PI),
    _uker_matrix_fn("Stokes3D-DxU"), _uker_apply_fn("Stokes3D-DxU"), scale_exp=-2.0,
    src_scal=(2.0, 2.0, 2.0), trg_scal=(0.0, 0.0, 0.0))
Stokes3D_FxT = KernelSpec(
    "Stokes3D-FxT", 3, 3, 9, False, 39, -3 / (4 * _PI),
    _uker_matrix_fn("Stokes3D-FxT"), _uker_apply_fn("Stokes3D-FxT"), scale_exp=-2.0,
    src_scal=(1.0, 1.0, 1.0), trg_scal=(1.0,) * 9)
Stokes3D_FSxU = KernelSpec(
    "Stokes3D-FSxU", 3, 4, 3, False, 26, 1 / (8 * _PI),
    _uker_matrix_fn("Stokes3D-FSxU"), _uker_apply_fn("Stokes3D-FSxU"), scale_exp=-1.0,
    src_scal=(1.0, 1.0, 1.0, 2.0), trg_scal=(0.0, 0.0, 0.0))
Stokes3D_FxUP = KernelSpec(
    "Stokes3D-FxUP", 3, 3, 4, False, 26, 1 / (8 * _PI),
    _uker_matrix_fn("Stokes3D-FxUP"), _uker_apply_fn("Stokes3D-FxUP"), scale_exp=-1.0,
    src_scal=(1.0, 1.0, 1.0), trg_scal=(0.0, 0.0, 0.0, 1.0))

KERNELS: Dict[str, KernelSpec] = {
    k.name: k for k in (
        Laplace3D_FxU, Laplace3D_DxU, Laplace3D_FxdU, Stokes3D_FxU,
        Stokes3D_DxU, Stokes3D_FxT, Stokes3D_FSxU, Stokes3D_FxUP)
}
