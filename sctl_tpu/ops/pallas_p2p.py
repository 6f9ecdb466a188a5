"""Pallas TPU kernel for direct P2P summation.

The TPU replacement for the reference's SIMD hot loop (reference:
generic-kernel.txx:76-189: targets vectorized across lanes, sources
broadcast with Load1, masked approx_rsqrt + FMA; SURVEY.md §3.5).  Here
the same computation is a Mosaic kernel over (source-tile, target-tile)
blocks:

  layout    : all point data TRANSPOSED to (dim, N) so tiles are
              (dim, block) — lane dimension = points (128-aligned),
              sublane = coordinate/component (padded 3->8), exactly the
              "targets in lanes" shape of the reference hot loop.
  pairwise  : r^2 built from 3 broadcasted squared differences on the
              VPU (BS x BT tiles); masked rsqrt on the VPU.
  contract  : density contraction as (k0, BS) x (BS, BT) jnp.dot on the
              MXU, accumulated over source tiles by revisiting the
              output block (grid = (targets, sources), out index
              ignores the source index).

Per-kernel tile functions cover the full kernel library; `p2p` is the
public entry and `direct_eval`-compatible.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import profile
from .kernels import KernelSpec, KERNELS
from .uker import UKER_APPLY


def _rinv_t(r2):
    """Masked rsqrt (self-pair/padding slots -> 0).

    The reference Newton-refines an approximate SIMD rsqrt
    (approx_rsqrt<digits>, vec.txx:357-370).  On TPU, lax.rsqrt lowers
    to a full-f32-precision VPU op (measured on hardware: Newton-off
    sits at the same f32 floor vs an f64 oracle as Newton-on —
    tests_tpu/test_p2p_accuracy.py; outputs differ by a few ulps since
    every f32 op rounds, but the step buys no accuracy), so the
    refinement is redundant ALU work in the hottest tile; it is kept
    behind config.p2p_newton for A/B measurement.

    NOTE: the flag is read at TRACE time — SCTL_P2P_NEWTON must be
    set before the first call of a given kernel/shape; toggling it
    afterwards has no effect on the cached executable (clear with
    jax.clear_caches() when A/B-measuring in one process)."""
    from ..config import config
    if config.p2p_newton:
        r2s = jnp.where(r2 > 0, r2, 1.0)
        x = lax.rsqrt(r2s)
        x = x * (1.5 - 0.5 * r2s * x * x)
        return jnp.where(r2 > 0, x, 0.0)
    # max() instead of a select pair: rsqrt(1e-30) is finite (~1e15),
    # the single select still zeroes self/padding slots exactly
    # (measured ~2% of the stencil tile, scripts/p2p_opcost.py)
    x = lax.rsqrt(jnp.maximum(r2, 1e-30))
    return jnp.where(r2 > 0, x, 0.0)


def _pair_r2(xs_t, xt_t):
    """(BS, BT) squared distances; xs_t (3,BS), xt_t (3,BT)."""
    acc = None
    for d in range(3):
        dx = xs_t[d][:, None] - xt_t[d][None, :]
        acc = dx * dx if acc is None else acc + dx * dx
    return acc


def _pair_rdot(xs_t, xt_t, v_t):
    """(BS, BT) pairwise (xt - xs) . v_s ; v_t (3,BS) per-source."""
    acc = None
    for d in range(3):
        t = (xt_t[d][None, :] - xs_t[d][:, None]) * v_t[d][:, None]
        acc = t if acc is None else acc + t
    return acc


class _SubLayout:
    """uker adapter: sources ride SUBLANES, targets ride LANES (the
    stencil/slab P2P layout).  Moments are per-row broadcast-multiply
    + sublane reductions on the VPU: k <= 13 for every kernel, so the
    MXU brings no advantage (it would use k of 128 output rows and
    round operands to bf16 — 1e-2-level errors; full-f32 MXU emulation
    compiles ~100x slower under Mosaic)."""
    __slots__ = ("xs", "ns", "ft", "xt")

    def __init__(self, xs_t, ns_t, f_t, xt_t):
        self.xs, self.ns, self.ft, self.xt = xs_t, ns_t, f_t, xt_t

    def r2(self):
        return _pair_r2(self.xs, self.xt)

    def rinv(self, r2):
        return _rinv_t(r2)

    def rdotf(self, idx):
        return _pair_rdot(self.xs, self.xt, self.ft[:3])

    def rdotn(self):
        return _pair_rdot(self.xs, self.xt, self.ns)

    def f(self, i):
        return self.ft[i]

    def s(self, d):
        return self.xs[d]

    def ones(self):
        return jnp.ones_like(self.xs[0])

    def moments(self, field, ws):
        return [jnp.sum(field * w[:, None], axis=0, keepdims=True)
                for w in ws]

    def t(self, d):
        return self.xt[d:d + 1]

    def out(self, cols):
        return (jnp.concatenate(cols, axis=0) if len(cols) > 1
                else cols[0])


def _sub_tile(name):
    body = UKER_APPLY[name]

    def tile(xs_t, ns_t, f_t, xt_t):          # -> (k1, BT)
        return body(_SubLayout(xs_t, ns_t, f_t, xt_t))

    return tile


_TILE_FNS = {name: _sub_tile(name) for name in UKER_APPLY}


# ---- lane-oriented layout: targets in SUBLANES, sources in LANES
# ((T, S) pairwise; contraction = lane reduction).  This is the layout
# for the per-box U-list kernel, where the source list (~1e3) is much
# longer than the target list (~48): sources fill whole 128-lane
# tiles, targets pack the 8-sublane granularity. -----------------------

def _pair_r2_l(xt_l, xs_l):
    """(T, S) squared distances; xt_l (3,T), xs_l (3,S)."""
    acc = None
    for d in range(3):
        dx = xt_l[d][:, None] - xs_l[d][None, :]
        acc = dx * dx if acc is None else acc + dx * dx
    return acc


def _pair_rdot_l(xt_l, xs_l, v_l):
    """(T, S) pairwise (xt - xs) . v_s ; v_l (3,S) per-source."""
    acc = None
    for d in range(3):
        t = (xt_l[d][:, None] - xs_l[d][None, :]) * v_l[d][None, :]
        acc = t if acc is None else acc + t
    return acc


class _LaneLayout:
    """uker adapter for the lane-oriented layout (see above)."""
    __slots__ = ("xt", "xs", "ns", "fl")

    def __init__(self, xt_l, xs_l, ns_l, f_l):
        self.xt, self.xs, self.ns, self.fl = xt_l, xs_l, ns_l, f_l

    def r2(self):
        return _pair_r2_l(self.xt, self.xs)

    def rinv(self, r2):
        return _rinv_t(r2)

    def rdotf(self, idx):
        return _pair_rdot_l(self.xt, self.xs, self.fl[:3])

    def rdotn(self):
        return _pair_rdot_l(self.xt, self.xs, self.ns)

    def f(self, i):
        return self.fl[i]

    def s(self, d):
        return self.xs[d]

    def ones(self):
        return jnp.ones_like(self.xs[0])

    def moments(self, field, ws):
        return [jnp.sum(field * w[None, :], axis=1, keepdims=True)
                for w in ws]

    def t(self, d):
        return self.xt[d][:, None]

    def out(self, cols):
        return (jnp.concatenate(cols, axis=1) if len(cols) > 1
                else cols[0])


def _lane_tile(name):
    body = UKER_APPLY[name]

    def tile(xt_l, xs_l, ns_l, f_l):          # -> (T, k1)
        return body(_LaneLayout(xt_l, xs_l, ns_l, f_l))

    return tile


_LTILE_FNS = {name: _lane_tile(name) for name in UKER_APPLY}


def _stencil_kernel_body(tile_fn, nside, cap_s, cap_t, k0, k1,
                         xt_ref, *refs):
    """One program = one z-column of `nside` boxes at grid position
    (x, y).  refs = 9 neighbor-column xs blocks, 9 ns blocks, 9 f
    blocks (each (1, 1, 3|k0, (nside+2)*cap_s), z-margin included),
    then out_ref.

    For each box z, the 27 neighbor slabs are 9 contiguous
    (3*cap_s)-lane slices of columns already in VMEM — the near-field
    gather disappears into the stencil.  Mosaic requires 128-aligned
    dynamic lane offsets: when cap_s is a 128-multiple the slice
    z*cap_s is naturally aligned; when cap_s is an odd 64-multiple the
    slice start is down-aligned to 128 and a 64-lane-wider window is
    read with a parity mask selecting the true 3*cap_s lanes (halves
    the padded-pair count for occupancies <= 64: measured 267 -> 223
    ms on the depth-6 1e7-point bench)."""
    out_ref = refs[27]
    xs_refs = refs[0:9]
    ns_refs = refs[9:18]
    f_refs = refs[18:27]
    x = pl.program_id(0)
    y = pl.program_id(1)

    valid = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            ok = ((x + dx >= 0) & (x + dx < nside)
                  & (y + dy >= 0) & (y + dy < nside))
            valid.append(ok.astype(jnp.float32))

    packed = (cap_s % 128) != 0                # odd 64-multiple slabs
    S = 3 * cap_s + (64 if packed else 0)

    def body(z, _):
        xt_t = xt_ref[0, 0, z]                             # (3, T)
        if packed:
            start = (z * cap_s) // 128 * 128
            off = pl.multiple_of(start, 128)
            rem = z * cap_s - start                        # 0 or 64
            li = lax.broadcasted_iota(jnp.int32, (1, S), 1)
            pmask = ((li >= rem)
                     & (li < rem + 3 * cap_s)).astype(jnp.float32)
        else:
            off = pl.multiple_of(z * cap_s, cap_s)
            pmask = None
        # the 9 neighbor-column windows FUSED into one (3|k0, 9*S)
        # source tile: every tile function is a lane reduction that is
        # linear in source slots, so one T x 9S pairwise sweep replaces
        # 9 T x S sweeps — amortizing the per-sweep VPU op overheads
        # that dominated the unfused kernel (ROADMAP #1 column fusion)
        xs_c, ns_c, f_c = [], [], []
        for c in range(9):
            xs_c.append(xs_refs[c][0, 0, :, pl.ds(off, S)])
            ns_c.append(ns_refs[c][0, 0, :, pl.ds(off, S)])
            f_t = f_refs[c][0, 0, :, pl.ds(off, S)] * valid[c]
            if pmask is not None:
                f_t = f_t * pmask
            f_c.append(f_t)
        xs_t = jnp.concatenate(xs_c, axis=1)
        ns_t = jnp.concatenate(ns_c, axis=1)
        f_t = jnp.concatenate(f_c, axis=1)
        out_ref[0, 0, z] = tile_fn(xt_t, xs_t, ns_t, f_t)  # (T, k1)
        return 0

    lax.fori_loop(0, nside, body, 0)


@functools.partial(jax.jit, static_argnames=("kernel", "nside",
                                             "cap_s", "cap_t",
                                             "interpret"))
def p2p_stencil(kernel: KernelSpec, nside: int, cap_s: int, cap_t: int,
                xt_g, xs_g, ns_g, f_g,
                interpret: Optional[bool] = None):
    """Uniform-grid near-field P2P as a halo stencil: boxes in RASTER
    order (x, y, z), per-box padded slabs; each program handles one
    z-column and reads its 3x3 neighbor columns (z-margin baked into
    the arrays), so the 27-neighbor interaction needs NO gather at
    all — the reference hot loop (generic-kernel.txx:76-189) organized
    as a halo-exchange stencil.

    cap_s must be a multiple of 64 (128-multiples slice lane-aligned;
    odd 64-multiples use the parity-masked packed window — see
    `_stencil_kernel_body` — and need nside even); cap_t a multiple
    of 8.

    xt_g (n, n, n, 3, cap_t): target coords per box (raster order).
    xs_g (n, n, 3, (n+2)*cap_s): source coords per column with zero
        z-margins, point axis z-major.
    ns_g like xs_g; f_g (n, n, k0, (n+2)*cap_s), ZERO in padding and
    margins.
    -> (n, n, n, cap_t, k1) unscaled potentials in raster order.
    """
    if interpret is None:
        from ..config import config
        interpret = config.pallas_interpret or (
            jax.default_backend() not in ("tpu", "axon"))
    if cap_s % 64 or (cap_s % 128 and nside % 2):
        raise ValueError(f"cap_s={cap_s} must be a 64-multiple "
                         "(odd 64-multiples need even nside)")
    k0, k1 = kernel.kdim0, kernel.kdim1
    tile_fn = _LTILE_FNS[kernel.name]
    n = nside

    def shifted(dx, dy, rows):
        return pl.BlockSpec(
            (1, 1, rows, (n + 2) * cap_s),
            lambda x, y, dx=dx, dy=dy: (
                jnp.clip(x + dx, 0, n - 1), jnp.clip(y + dy, 0, n - 1),
                0, 0),
            memory_space=pltpu.VMEM)

    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    in_specs = [pl.BlockSpec((1, 1, n, 3, cap_t),
                             lambda x, y: (x, y, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [shifted(dx, dy, 3) for dx, dy in offs]
    in_specs += [shifted(dx, dy, 3) for dx, dy in offs]
    in_specs += [shifted(dx, dy, k0) for dx, dy in offs]

    out = pl.pallas_call(
        functools.partial(_stencil_kernel_body, tile_fn, n, cap_s,
                          cap_t, k0, k1),
        grid=(n, n),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, n, cap_t, k1),
                               lambda x, y: (x, y, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n, n, cap_t, k1),
                                       xt_g.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(n) ** 3 * int(cap_t) * 27 * int(cap_s)
            * kernel.flops,
            bytes_accessed=(xt_g.size + 9 * xs_g.size
                            + 9 * f_g.size) * 4,
            transcendentals=int(n) ** 3 * int(cap_t) * 27
            * int(cap_s)),
        interpret=interpret,
    )(xt_g, *([xs_g] * 9), *([ns_g] * 9), *([f_g] * 9))
    return out


def _stencil9_body(tile_fn, nside, SL, needs_ns, xt_ref, xs_ref,
                   ns_ref, f_ref, out_ref):
    """One program = one z-column at grid position (x, y), reading its
    own PRE-PACKED slab column: slab entry z (margin coords) holds the
    9 neighbor columns' box (x+dx, y+dy, z-1) points in lane sub-blocks
    of cap9 each, zeros elsewhere.  The 27-box neighborhood of target
    box z is the contiguous, SL-aligned lane window [z*SL, (z+3)*SL) —
    no shifted block fetches, no boundary masks, no lane-parity
    alignment slack (all baked into the slab at build time)."""

    def body(z, _):
        xt_t = xt_ref[0, 0, z]                             # (3, T)
        off = pl.multiple_of(z * SL, SL)
        xs_t = xs_ref[0, 0, :, pl.ds(off, 3 * SL)]
        ns_t = (ns_ref[0, 0, :, pl.ds(off, 3 * SL)] if needs_ns
                else xs_t)                   # ignored by the tile fn
        f_t = f_ref[0, 0, :, pl.ds(off, 3 * SL)]
        out_ref[0, 0, z] = tile_fn(xt_t, xs_t, ns_t, f_t)  # (T, k1)
        return 0

    lax.fori_loop(0, nside, body, 0)


@functools.partial(jax.jit, static_argnames=("kernel", "nside", "SL",
                                             "cap_t", "interpret"))
def p2p_stencil9(kernel: KernelSpec, nside: int, SL: int, cap_t: int,
                 xt_g, xs_s, ns_s, f_s,
                 interpret: Optional[bool] = None):
    """Uniform-grid near-field P2P over pre-packed 9-column slabs.

    vs `p2p_stencil` (9 shifted column windows of 3*cap_s + 64
    alignment lanes each = 2304 source slots per target at cap 64)
    this reads ONE slab column per program whose per-z entry already
    contains all 9 (dx, dy) neighbor columns' box points side by side
    (SL = 128-aligned 9*cap9 lanes); the 27-box neighborhood is a
    single aligned 3*SL window (1536 slots at cap9=56) with boundary
    zeros and slot padding baked in at build time — 33% fewer padded
    pair-slots and no per-z mask/select/concat work.  Reference hot
    loop: generic-kernel.txx:76-189.

    xt_g (n, n, n, 3, cap_t): target coords per box (raster order).
    xs_s (n, n, 3, (n+2)*SL): packed slab columns (z margin included).
    ns_s like xs_s (pass a (n, n, 3, 128) dummy when the kernel needs
        no normals; it is neither read nor DMA'd meaningfully).
    f_s (n, n, k0, (n+2)*SL): densities, ZERO in padding.
    -> (n, n, n, cap_t, k1) unscaled potentials in raster order.
    """
    if interpret is None:
        from ..config import config
        interpret = config.pallas_interpret or (
            jax.default_backend() not in ("tpu", "axon"))
    if SL % 128:
        raise ValueError(f"SL={SL} must be a 128-multiple")
    k0, k1 = kernel.kdim0, kernel.kdim1
    tile_fn = _LTILE_FNS[kernel.name]
    n = nside
    needs_ns = kernel.needs_normal

    def own(rows, arr):
        return pl.BlockSpec((1, 1, rows, arr.shape[-1]),
                            lambda x, y: (x, y, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_stencil9_body, tile_fn, n, SL, needs_ns),
        grid=(n, n),
        in_specs=[
            pl.BlockSpec((1, 1, n, 3, cap_t),
                         lambda x, y: (x, y, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            own(3, xs_s), own(3, ns_s), own(k0, f_s),
        ],
        out_specs=pl.BlockSpec((1, 1, n, cap_t, k1),
                               lambda x, y: (x, y, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n, n, cap_t, k1),
                                       xt_g.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(n) ** 3 * int(cap_t) * 3 * int(SL)
            * kernel.flops,
            bytes_accessed=(xt_g.size + xs_s.size + f_s.size) * 4,
            transcendentals=int(n) ** 3 * int(cap_t) * 3 * int(SL)),
        interpret=interpret,
    )(xt_g, xs_s, ns_s, f_s)
    return out


def _ulist_kernel_body(tile_fn, xt_ref, xs_ref, ns_ref, f_ref, out_ref):
    for b in range(xt_ref.shape[1]):        # unrolled: boxes per step
        out_ref[:, b, :] = tile_fn(xt_ref[:, b, :], xs_ref[:, b, :],
                                   ns_ref[:, b, :], f_ref[:, b, :]).T


@functools.partial(jax.jit, static_argnames=("kernel", "interpret"))
def p2p_ulist(kernel: KernelSpec, xt_b, xs_b, ns_b, f_b,
              interpret: Optional[bool] = None):
    """Per-box U-list P2P: for each box g, sum over its gathered source
    list (reference hot loop generic-kernel.txx:76-189, organized per
    target leaf like the U-list pass of a tree code).

    xt_b (G, 3, T): per-box target coords (T = box target capacity,
        multiple of 8).
    xs_b (G, 3, S): per-box gathered source coords (S = U-list budget,
        multiple of 128).
    ns_b (G, 3, S): source normals (zeros if unused).
    f_b (G, k0, S): source densities, ZERO in padded slots.
    -> (G, T, k1) potentials (unscaled; caller applies scale_factor).

    Targets ride sublanes, sources ride lanes; one grid step per box
    keeps the whole pairwise tile in VMEM — no HBM round trip for the
    (T, S) intermediates.

    HBM layout: operands are transposed to (3|k0, G, S) and the result
    is produced as (k1, G, T) so the TPU (8,128)-tiled HBM layout pads
    the large box x slot dims instead of the tiny coordinate/component
    dims — a (G, T, 1) result at G=262144 leaves would pad the
    trailing 1 -> 128 lanes (20 GB); (1, G, T) is 268 MB.  The
    transposes fuse into the surrounding jit.
    """
    if interpret is None:
        from ..config import config
        interpret = config.pallas_interpret or (
            jax.default_backend() not in ("tpu", "axon"))
    G, _, T = xt_b.shape
    S = xs_b.shape[2]
    k0, k1 = kernel.kdim0, kernel.kdim1
    tile_fn = _LTILE_FNS[kernel.name]
    BB = 8                    # boxes per grid step (sublane granule)
    Gp = -(-G // BB) * BB     # zero-pad: zero coords + zero densities
    padG = ((0, 0), (0, Gp - G), (0, 0))

    def prep(a):
        return jnp.pad(a.transpose(1, 0, 2), padG)

    out = pl.pallas_call(
        functools.partial(_ulist_kernel_body, tile_fn),
        grid=(Gp // BB,),
        in_specs=[
            pl.BlockSpec((3, BB, T), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BB, S), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BB, S), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k0, BB, S), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k1, BB, T), lambda g: (0, g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k1, Gp, T), xt_b.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(G) * int(T) * int(S) * kernel.flops,
            bytes_accessed=(xt_b.size + xs_b.size + f_b.size) * 4,
            transcendentals=int(G) * int(T) * int(S)),
        interpret=interpret,
    )(prep(xt_b), prep(xs_b), prep(ns_b), prep(f_b))
    return out[:, :G].transpose(1, 2, 0)


def _p2p_kernel_body(tile_fn, nbs_total, xt_ref, xs_ref, ns_ref, f_ref,
                     out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += tile_fn(xs_ref[:], ns_ref[:], f_ref[:], xt_ref[:])


def _pad_cols(a, n):
    """Pad trailing axis of (k, N) to n columns with zeros."""
    k = a.shape[1]
    if k == n:
        return a
    return jnp.pad(a, ((0, 0), (0, n - k)))


@functools.partial(jax.jit,
                   static_argnames=("kernel", "block_t", "block_s",
                                    "interpret"))
def _p2p_impl(kernel: KernelSpec, xt_t, xs_t, ns_t, f_t,
              block_t: int, block_s: int, interpret: bool):
    nt, ns_pts = xt_t.shape[1], xs_t.shape[1]
    nbt = -(-nt // block_t)
    nbs = -(-ns_pts // block_s)
    xt_p = _pad_cols(xt_t, nbt * block_t)
    xs_p = _pad_cols(xs_t, nbs * block_s)
    ns_p = _pad_cols(ns_t, nbs * block_s)
    f_p = _pad_cols(f_t, nbs * block_s)  # zero densities: no contribution

    tile_fn = _TILE_FNS[kernel.name]
    grid = (nbt, nbs)
    out = pl.pallas_call(
        functools.partial(_p2p_kernel_body, tile_fn, nbs),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, block_t), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, block_s), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, block_s), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kernel.kdim0, block_s), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kernel.kdim1, block_t),
                               lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kernel.kdim1, nbt * block_t),
                                       xt_t.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(nt) * int(ns_pts) * kernel.flops,
            bytes_accessed=(xt_p.size + xs_p.size + f_p.size) * 4,
            transcendentals=int(nt) * int(ns_pts)),
        interpret=interpret,
    )(xt_p, xs_p, ns_p, f_p)
    return out[:, :nt]


def p2p(kernel: KernelSpec, xt, xs, f, ns=None,
        block_t: int = 512, block_s: int = 1024,
        interpret: Optional[bool] = None):
    """Direct P2P sum via the Pallas TPU kernel.

    Args/result match `direct.direct_eval` ((N,3)/(N,k) row layout);
    transposition to the kernel's (k,N) layout happens here.  float32.
    """
    from ..config import config
    if interpret is None:
        interpret = config.pallas_interpret or (
            jax.default_backend() not in ("tpu", "axon"))
    dt = jnp.float32
    f = f.reshape(xs.shape[0], kernel.kdim0)
    if kernel.needs_normal:
        assert ns is not None, f"{kernel.name} needs source normals"
    profile.add_flops(float(xt.shape[0]) * xs.shape[0] * kernel.flops)
    xt_t = xt.T.astype(dt)
    xs_t = xs.T.astype(dt)
    ns_t = (ns.T.astype(dt) if ns is not None
            else jnp.zeros_like(xs_t))
    f_t = f.T.astype(dt)
    u_t = _p2p_impl(kernel, xt_t, xs_t, ns_t, f_t, block_t, block_s,
                    interpret)
    return (u_t.T * jnp.asarray(kernel.scale_factor, dtype=dt))
