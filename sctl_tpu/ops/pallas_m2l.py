"""Pallas TPU kernel for the uniform-grid M2L sweep.

The V-list interaction on a dense level grid is, per box parity, 189
shifted (r2 -> r) GEMMs over the box grid (kifmm._eval_impl's
per-parity lax.scan — measured 140-210 ms at depth 6, traffic-bound:
every scan step re-reads an (h,h,h,r2) shifted block from HBM).  This
kernel is the "z-tiled windows" formulation (ROADMAP #2): one program
owns a t x t column tile of the full grid, DMAs its
(t+6, t+6, n+6, r2) halo window into VMEM ONCE, and runs all 316
offsets as dz-grouped (t*t*n, r2) x (r2, r) MXU GEMMs against the
resident window — each source value is read from HBM once per
(t+6)^2/t^2-neighborhood instead of once per offset.  Parity validity
(189 of 316 per parity) is applied as a static (t, t, zparity) mask on
the accumulator, trading 316/189 = 1.67x GEMM flops for fully static
slices (no parity-major re-layout, no strided access).  The tile size
t trades per-offset loop latency (~1 us/offset/program measured at
t=2, which made the kernel SLOWER than the scan) against VMEM: bigger
tiles amortize the loop over 16x more GEMM rows.

Reference role: the PVFMM V-list evaluation behind the reference's
fmm-wrapper (fmm-wrapper.txx:788-936); hot-loop spec
generic-kernel.txx:76-189.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dot(a, b, dt, precision):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=dt,
                               precision=precision)


def _split_hi_lo(x):
    """(hi, lo) bf16 pair with x ~ hi + lo.  The hi part is built by
    TRUNCATING the f32 mantissa to bf16's 8 bits via integer masking —
    NOT x.astype(bf16).astype(f32), which XLA/Mosaic legally fold to a
    no-op under --xla_allow_excess_precision=true (measured: the folded
    form silently zeroes lo, degrading 3-pass accuracy 400x)."""
    u = lax.bitcast_convert_type(x, jnp.uint32)
    hi = lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000),
                                  jnp.float32)
    return hi.astype(jnp.bfloat16), (x - hi).astype(jnp.bfloat16)


def _m2l_body(groups, t, n, z8, r, r2, precision, threepass, q_hbm,
              dxy_ref, mats_ref, matl_ref, mask_ref, out_ref, win,
              wz_ref, wlo_ref, sem):
    i = pl.program_id(0)
    j = pl.program_id(1)
    w = t + 6
    cp = pltpu.make_async_copy(
        q_hbm.at[pl.ds(t * i, w), pl.ds(t * j, w)], win, sem)
    cp.start()
    cp.wait()
    dt = out_ref.dtype
    acc = jnp.zeros((t, t, n, r), dt)
    # offsets arrive SORTED by dz (contiguous groups): one sublane
    # roll per dz aligns the z slice to the window start — Mosaic
    # requires 8-aligned sublane slice offsets, which 3+dz is not —
    # staged into a scratch ref so the inner loop can slice it with
    # DYNAMIC (outer-dim) x/y starts; the fori_loop sweeps the
    # group's offsets with dynamic leading-index table reads (keeps
    # the kernel ~7 loops instead of 316 unrolled GEMMs, which
    # compiled ~10x slower)
    for (dz, o0, o1) in groups:
        wzf = pltpu.roll(win[:], z8 - (3 + dz), 2)[:, :, :n, :]
        if threepass:
            # error-free split done ONCE per dz group: the three bf16
            # passes hi*hi + hi*lo + lo*hi cost half of HIGHEST's six,
            # at ~1e-5 relative error (fine for the f32 pipeline whose
            # p=6 truncation floor is ~1e-4)
            wz_ref[:], wlo_ref[:] = _split_hi_lo(wzf)
        else:
            wz_ref[:] = wzf

        def step(o, acc):
            dx = dxy_ref[o, 0]
            dy = dxy_ref[o, 1]
            shi = wz_ref[pl.ds(3 + dx, t), pl.ds(3 + dy, t)]
            shi = shi.reshape(t * t * n, r2)
            if threepass:
                pdef = lax.Precision.DEFAULT    # bf16 inputs: fp32
                # contract precision is rejected by Mosaic
                slo = wlo_ref[pl.ds(3 + dx, t), pl.ds(3 + dy, t)]
                slo = slo.reshape(t * t * n, r2)
                y = (_dot(shi, mats_ref[o], dt, pdef)
                     + _dot(shi, matl_ref[o], dt, pdef)
                     + _dot(slo, mats_ref[o], dt, pdef))
            else:
                y = _dot(shi, mats_ref[o], dt, precision)
            y = y.reshape(t, t, n, r)
            return acc + y * mask_ref[o][..., None]  # (t, t, n, 1)

        acc = lax.fori_loop(o0, o1, step, acc)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("n", "r", "r2", "tile",
                                             "interpret", "precision",
                                             "threepass"))
def m2l_grid(qp, mats_t, n: int, r: int, r2: int, tile: int = 4,
             interpret: Optional[bool] = None,
             precision=lax.Precision.HIGHEST,
             threepass: bool = True):
    """Dense-grid M2L: qp (n+6, n+6, n+6, r2) V-projected source grid
    with 3-wide zero margins; mats_t (316, r2, r) transposed compressed
    M2L operators A_d^T in `_vlist_offsets()` order.  Parity validity
    (189 of 316 per parity, parity index = 4*(x%2) + 2*(y%2) + (z%2))
    is applied from static precomputed masks.
    -> (n, n, n, r) compressed down-check contributions."""
    if interpret is None:
        from ..config import config
        interpret = config.pallas_interpret or (
            jax.default_backend() not in ("tpu", "axon"))
    t = min(tile, n)
    assert n % t == 0 and n >= 2 and t % 2 == 0
    groups, order, dxy, masks = _sorted_tables(n, t)
    # re-order the operator stack into the dz-sorted kernel order
    mats_t = mats_t[jnp.asarray(order)]
    # Mosaic tiling: the window DMA and in-kernel slices need the
    # sublane (z) extent 8-aligned and the lane (channel) extents
    # 128-aligned — pad with zeros (zero rows/cols are exact no-ops
    # in the GEMMs; the MXU pads K to 128 internally anyway)
    z8 = -(-(n + 6) // 8) * 8
    R2 = -(-r2 // 128) * 128
    Rr = -(-r // 128) * 128
    qp = jnp.pad(qp, ((0, 0), (0, 0), (0, z8 - (n + 6)),
                      (0, R2 - r2)))
    mats_t = jnp.pad(mats_t, ((0, 0), (0, R2 - r2), (0, Rr - r)))
    if threepass:
        mats_hi, mats_lo = _split_hi_lo(mats_t)
        mdt = jnp.bfloat16
    else:
        mats_hi, mats_lo = mats_t, mats_t[:, :1, :1] * 0
        mdt = qp.dtype
    grid = (n // t, n // t)
    w = t + 6
    out = pl.pallas_call(
        functools.partial(_m2l_body, groups, t, n, z8, Rr, R2,
                          precision, threepass),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((316, t, t, n), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, t, n, Rr), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n, n, Rr), qp.dtype),
        scratch_shapes=[
            pltpu.VMEM((w, w, z8, R2), qp.dtype),
            pltpu.VMEM((w, w, n, R2), mdt),
            pltpu.VMEM((w, w, n, R2) if threepass else (8, 8, 8, 128),
                       mdt),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=(3 if threepass else 6) * 316 * int(n) ** 3
            * int(R2) * int(Rr),
            bytes_accessed=(qp.size + 316 * R2 * Rr * (n // t) ** 2
                            + int(n) ** 3 * Rr) * 4,
            transcendentals=0,
        ),
        # the resident operator stack legitimately uses most of the
        # chip's 128 MB VMEM; the default scoped limit is 16 MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(qp, jnp.asarray(dxy), mats_hi, mats_lo,
      jnp.asarray(masks, dtype=qp.dtype))
    return out[..., :r]


def _blk_body(groups, t, hz, z8, rb, r2b, precision, threepass, q_hbm,
              dxy_ref, mats_ref, matl_ref, out_ref, win, wz_ref,
              wlo_ref, sem):
    i = pl.program_id(0)
    j = pl.program_id(1)
    w = t + 2
    cp = pltpu.make_async_copy(
        q_hbm.at[pl.ds(t * i, w), pl.ds(t * j, w)], win, sem)
    cp.start()
    cp.wait()
    dt = out_ref.dtype
    acc = jnp.zeros((t, t, hz, rb), dt)
    for (dz, o0, o1) in groups:
        wzf = pltpu.roll(win[:], z8 - (1 + dz), 2)[:, :, :hz, :]
        if threepass:
            wz_ref[:], wlo_ref[:] = _split_hi_lo(wzf)
        else:
            wz_ref[:] = wzf

        def step(o, acc):
            dx = dxy_ref[o, 0]
            dy = dxy_ref[o, 1]
            shi = wz_ref[pl.ds(1 + dx, t), pl.ds(1 + dy, t)]
            shi = shi.reshape(t * t * hz, r2b)
            if threepass:
                pdef = lax.Precision.DEFAULT
                slo = wlo_ref[pl.ds(1 + dx, t), pl.ds(1 + dy, t)]
                slo = slo.reshape(t * t * hz, r2b)
                y = (_dot(shi, mats_ref[o], dt, pdef)
                     + _dot(shi, matl_ref[o], dt, pdef)
                     + _dot(slo, mats_ref[o], dt, pdef))
            else:
                y = _dot(shi, mats_ref[o], dt, precision)
            return acc + y.reshape(t, t, hz, rb)

        acc = lax.fori_loop(o0, o1, step, acc)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("h", "r", "r2", "tile",
                                             "interpret", "precision",
                                             "threepass"))
def m2l_grid_blocked(qp, mats_blk, h: int, r: int, r2: int,
                     tile: int = 4, interpret: Optional[bool] = None,
                     precision=lax.Precision.HIGHEST,
                     threepass: bool = True):
    """Sibling-blocked dense-grid M2L: the (n,n,n,r2) child grid is
    reshaped to the (h,h,h, 8*r2) PARENT grid (h = n/2, child channel
    blocks ordered c = 4cx+2cy+cz) and swept with the 26 parent-
    neighbor directions; each direction applies one (8*r2, 8*r) block
    operator assembled from the child-pair tables (near child pairs
    zeroed).  vs the 316-offset masked sweep (`m2l_grid`) this runs
    26*64 = 1664 (r2 x r) GEMM-blocks per parent instead of 316*8 =
    2528 masked ones (0.66x flops, no parity masks) and concatenates
    the output rank to 8r, removing the r -> 128 lane pad (r=72 at
    Laplace p=6: 78% -> 11% waste).  Reference role: the PVFMM
    V-list/Hadamard stage, fmm-wrapper.txx:788-936.

    qp (h+2, h+2, h+2, 8*r2) zero-margin padded parent grid;
    mats_blk (26, 8*r2, 8*r) dz-sorted (`_blocked_tables` order).
    -> (h, h, h, 8*r) parent-blocked down-check contributions."""
    if interpret is None:
        from ..config import config
        interpret = config.pallas_interpret or (
            jax.default_backend() not in ("tpu", "axon"))
    t = min(tile, h)
    assert h % t == 0 and h >= 2
    groups, dxy = _blk_dir_tables()
    r2b, rb = 8 * r2, 8 * r
    z8 = -(-(h + 2) // 8) * 8
    R2 = -(-r2b // 128) * 128
    Rr = -(-rb // 128) * 128
    qp = jnp.pad(qp, ((0, 0), (0, 0), (0, z8 - (h + 2)),
                      (0, R2 - r2b)))
    mats_blk = jnp.pad(mats_blk, ((0, 0), (0, R2 - r2b),
                                  (0, Rr - rb)))
    if threepass:
        mats_hi, mats_lo = _split_hi_lo(mats_blk)
        mdt = jnp.bfloat16
    else:
        mats_hi, mats_lo = mats_blk, mats_blk[:, :1, :1] * 0
        mdt = qp.dtype
    grid = (h // t, h // t)
    w = t + 2
    out = pl.pallas_call(
        functools.partial(_blk_body, groups, t, h, z8, Rr, R2,
                          precision, threepass),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, t, h, Rr), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, h, h, Rr), qp.dtype),
        scratch_shapes=[
            pltpu.VMEM((w, w, z8, R2), qp.dtype),
            pltpu.VMEM((w, w, h, R2), mdt),
            pltpu.VMEM((w, w, h, R2) if threepass else (8, 8, 8, 128),
                       mdt),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=(3 if threepass else 6) * 26 * int(h) ** 3
            * int(R2) * int(Rr),
            bytes_accessed=(qp.size + 26 * R2 * Rr * (h // t) ** 2
                            + int(h) ** 3 * Rr) * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2 ** 20),
        interpret=interpret,
    )(qp, jnp.asarray(dxy), mats_hi, mats_lo)
    return out[..., :rb]


@functools.lru_cache(maxsize=None)
def _blk_dir_tables():
    """dz-sorted parent-direction tables for the blocked kernel:
    run groups [(dz, start, end)] and the (26, 2) (dx, dy) SMEM
    table; order matches `blocked_m2l_mats`."""
    dirs = _blk_dirs()
    groups = []
    for dz in (-1, 0, 1):
        idx = np.nonzero(dirs[:, 2] == dz)[0]
        groups.append((int(dz), int(idx[0]), int(idx[-1]) + 1))
    dxy = np.ascontiguousarray(dirs[:, :2]).astype(np.int32)
    return tuple(groups), dxy


@functools.lru_cache(maxsize=None)
def _blk_dirs() -> np.ndarray:
    """(26, 3) parent-neighbor directions, dz-major sort (stable) so
    the kernel's dz run groups are contiguous."""
    dirs = np.array([(dx, dy, dz) for dx in (-1, 0, 1)
                     for dy in (-1, 0, 1) for dz in (-1, 0, 1)
                     if (dx, dy, dz) != (0, 0, 0)])
    return dirs[np.argsort(dirs[:, 2], kind="stable")]


def blocked_m2l_mats(ca: np.ndarray, offsets: np.ndarray,
                     valid: np.ndarray, r_cap: int,
                     r2_cap: int) -> np.ndarray:
    """Assemble the (26, 8*r2_cap, 8*r_cap) sibling-blocked operator
    stack from the compressed per-offset tables ca (316, r, r2), in
    `_blk_dirs()` order.  Child-pair block (cs, ct) of direction D is
    A_o^T for the child-level offset d = 2D + cs - ct when (o, parity
    ct) is V-list-valid, else zero (those pairs are near-field).
    Output (row, col) = (cs*r2 + :, ct*r + :) so the GEMM
    q_blk (rows, 8*r2) @ W -> (rows, 8*r) sums source children into
    every target child."""
    omap = {tuple(d): i for i, d in enumerate(offsets)}
    r2c, rc = r2_cap, r_cap
    W = np.zeros((26, 8 * r2c, 8 * rc), ca.dtype)
    for k, D in enumerate(_blk_dirs()):
        for ct in range(8):
            tx, ty, tz = (ct >> 2) & 1, (ct >> 1) & 1, ct & 1
            for cs in range(8):
                sx, sy, sz = (cs >> 2) & 1, (cs >> 1) & 1, cs & 1
                d = (2 * D[0] + sx - tx, 2 * D[1] + sy - ty,
                     2 * D[2] + sz - tz)
                o = omap.get(d)
                if o is None or not valid[ct, o]:
                    continue
                W[k, cs * r2c:(cs + 1) * r2c, ct * rc:(ct + 1) * rc] \
                    = ca[o, :rc, :r2c].T
    return W


@functools.lru_cache(maxsize=None)
def _sorted_tables(n: int, t: int):
    """dz-sorted static kernel tables: run groups [(dz, start, end)],
    the (316,) canonical->sorted permutation, the (316, 2) (dx, dy)
    SMEM table, and the (316, t, t, n) parity masks — all in sorted
    order."""
    from ..fmm.kifmm import _vlist_offsets
    d, valid = _vlist_offsets()
    order = np.argsort(d[:, 2], kind="stable")
    ds = d[order]
    groups = []
    for dz in range(-3, 4):
        idx = np.nonzero(ds[:, 2] == dz)[0]
        if idx.size:
            groups.append((int(dz), int(idx[0]), int(idx[-1]) + 1))
    masks = _full_masks(valid.T[order].astype(np.float64), n, t)
    dxy = np.ascontiguousarray(ds[:, :2]).astype(np.int32)
    return tuple(groups), order, dxy, masks


def _full_masks(valid_t: np.ndarray, n: int, t: int) -> np.ndarray:
    """(316, t, t, n) masks from the (316, 8) parity-validity table;
    parity index = 4*(x%2) + 2*(y%2) + (z%2) (tile origins are
    t-multiples with t even, so local parity == global parity)."""
    m = np.zeros((valid_t.shape[0], t, t, n))
    zp = np.arange(n) % 2
    for a in range(t):
        for b in range(t):
            m[:, a, b, :] = valid_t[:, 4 * (a % 2) + 2 * (b % 2) + zp]
    return m
