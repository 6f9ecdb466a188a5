"""Direct P2P kernel summation (dense N-body evaluation).

TPU-native equivalent of `GenericKernel::Eval` (reference:
generic-kernel.txx:40-189, SURVEY.md §3.5) and `KernelMatrix`
(generic-kernel.txx:191+).  The reference's hot loop is
targets-in-SIMD-lanes x broadcast-source FMA under OpenMP; here the
same computation is a blocked pairwise evaluation where each
(target-block, source-block) tile is computed with MXU matmuls via
`KernelSpec.apply_pairwise` and tiles are swept with `lax.scan` (bounded
memory) / `vmap` (parallel dispatch) — XLA fuses and schedules in place
of OpenMP.

A Pallas TPU kernel for the same tile computation lives in
`pallas_p2p.py`; `direct_eval` dispatches to it on TPU backends.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from .. import profile
from .kernels import KernelSpec
from ..utils.debug import shape_contract


def _pad_rows(a, n, pad_row=None):
    """Pad leading axis to n rows (repeating row 0 — contributions are
    nulled via zero densities / output slicing)."""
    k = a.shape[0]
    if k == n:
        return a
    pad = jnp.broadcast_to(a[0:1] if pad_row is None else pad_row,
                           (n - k,) + a.shape[1:])
    return jnp.concatenate([a, pad], axis=0)


def kernel_matrix(kernel: KernelSpec, xt, xs, ns=None):
    """Dense (Ns*kdim0, Nt*kdim1) matrix, scale factor included
    (reference: GenericKernel::KernelMatrix)."""
    return kernel.full_matrix(xt, xs, ns)


@shape_contract(xt=("T", 3, "float"), xs=("S", 3, "float"),
                ns=("S", 3, "float"))
def direct_eval(kernel: KernelSpec, xt, xs, f, ns=None,
                digits: Optional[int] = None):
    """Single-tile direct sum: u[t,k1] = scale * sum_s K[t,s,k0,k1] f[s,k0].

    Suitable when Nt*Ns pairwise fields fit in memory; use
    `direct_eval_blocked` for large problems.  `digits` is accepted for
    API parity with the reference's runtime accuracy dispatch
    (generic-kernel.txx digits template); XLA evaluates at dtype
    precision.
    """
    f = f.reshape(xs.shape[0], kernel.kdim0)
    if kernel.needs_normal:
        assert ns is not None, f"{kernel.name} needs source normals"
    profile.add_flops(float(xt.shape[0]) * xs.shape[0] * kernel.flops)
    u = kernel.apply_pairwise(xt, xs, ns, f)
    return u * jnp.asarray(kernel.scale_factor, dtype=u.dtype)


@partial(jax.jit, static_argnums=(0, 5, 6))
def _direct_eval_blocked_impl(kernel, xt, xs, f, ns, block_t, block_s):
    nt, ns_pts = xt.shape[0], xs.shape[0]
    nbt = -(-nt // block_t)
    nbs = -(-ns_pts // block_s)
    xt_p = _pad_rows(xt, nbt * block_t).reshape(nbt, block_t, kernel.dim)
    xs_p = _pad_rows(xs, nbs * block_s).reshape(nbs, block_s, kernel.dim)
    f_p = _pad_rows(f, nbs * block_s,
                    pad_row=jnp.zeros_like(f[0:1])).reshape(
        nbs, block_s, kernel.kdim0)
    if ns is not None:
        ns_p = _pad_rows(ns, nbs * block_s).reshape(nbs, block_s,
                                                    kernel.dim)
    else:
        ns_p = jnp.zeros_like(xs_p)

    def tgt_block(xt_b):
        def src_step(acc, blk):
            xs_b, ns_b, f_b = blk
            return acc + kernel.apply_pairwise(xt_b, xs_b, ns_b, f_b), None

        acc0 = jnp.zeros((block_t, kernel.kdim1), dtype=f.dtype)
        acc, _ = lax.scan(src_step, acc0, (xs_p, ns_p, f_p))
        return acc

    u = lax.map(tgt_block, xt_p, batch_size=min(nbt, 8))
    u = u.reshape(nbt * block_t, kernel.kdim1)[:nt]
    return u * jnp.asarray(kernel.scale_factor, dtype=u.dtype)


@shape_contract(xt=("T", 3, "float"), xs=("S", 3, "float"),
                ns=("S", 3, "float"))
def direct_eval_blocked(kernel: KernelSpec, xt, xs, f, ns=None,
                        block_t: int = 1024, block_s: int = 1024,
                        digits: Optional[int] = None):
    """Memory-bounded direct sum over (block_t x block_s) tiles.

    Tiles are MXU-friendly (multiple of 128 recommended).  Peak pairwise
    memory ~ 8 * block_t * block_s per in-flight tile.
    """
    f = f.reshape(xs.shape[0], kernel.kdim0)
    if kernel.needs_normal:
        assert ns is not None, f"{kernel.name} needs source normals"
    profile.add_flops(float(xt.shape[0]) * xs.shape[0] * kernel.flops)
    return _direct_eval_blocked_impl(kernel, xt, xs, f, ns,
                                     block_t, block_s)
