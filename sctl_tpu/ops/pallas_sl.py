"""Pallas TPU kernels for the KIFMM's S2M (leaf sources -> upward
check potentials) and L2T (downward equivalents -> leaf targets)
stages.

Both stages pair every leaf box's points against the SAME equivalent/
check surface in box-local coordinates (the surface grid is identical
for every box at a level up to the box center, kifmm.py surf_out_d),
so one static surface block serves the whole level.  Layout: surface
points ride SUBLANES, per-box point slots ride LANES:

  S2M  one program owns 128 boxes = one (n_surf, 128*cap) pair tile;
       the weighted pair matrices reduce per box AND scatter to the
       boxes' output columns in ONE exact MXU op per component:
       out_c = hi(M_c) @ G + lo(M_c) @ G, with G a static 0/1
       slot->box selector — the error-free bf16 split makes the 0/1
       matmul an exact f32 sum (pallas_m2l.py _split_hi_lo), and the
       K = 128*cap contraction is the MXU's best axis.  Output is
       (k1, n_surf, B): boxes ride lanes, so HBM blocks stay
       128-aligned with no per-box relayouts (the measured failure of
       the round-3 p2p_ulist S2M routing).
  L2T  one program owns 128 boxes = 128*cap_t target lanes; the
       per-box equivalent densities arrive as (n_surf, 128) blocks and
       expand to per-target-lane weights by an exact hi/lo MXU product
       with a static 0/1 box->lane matrix; the pair matrices reduce
       over SUBLANES (the shared surface axis) directly into
       (1, lanes) output rows — zero padded lanes (128*cap_t is
       exact).

All tiling lives in the Pallas GRID (block-spec fetches); the kernel
bodies do no dynamic slicing — an earlier in-kernel fori_loop over
128-lane tiles ran 10x slower than the grid form.

The per-kernel math lives in the `_PAIRBLOCK` family: one function per
kernel producing the k1 weighted (S, P) pair matrices from r, 1/r and
the densities — a single form that serves both stages via the sign of
r (surface-as-target vs surface-as-source).  Reference roles: the S2M/
L2T passes of the PVFMM evaluator behind fmm-wrapper.txx:788-936; the
pairwise micro-kernels mirror kernel_functions.hpp:15-198.
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

from .kernels import KernelSpec


def _rinv_m(r2):
    """Masked rsqrt (coincident pairs -> 0), tile-local."""
    r2s = jnp.where(r2 > 0, r2, 1.0)
    return jnp.where(r2 > 0, lax.rsqrt(r2s), 0.0)


def _split_hi_lo(x):
    """Error-free (hi, lo) bf16 split via mantissa truncation (NOT a
    round-trip cast, which XLA folds away — see pallas_m2l.py)."""
    u = lax.bitcast_convert_type(x, jnp.uint32)
    hi = lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000),
                                  jnp.float32)
    return hi.astype(jnp.bfloat16), (x - hi).astype(jnp.bfloat16)


def _dot(a, b, dt):
    return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                           preferred_element_type=dt,
                           precision=lax.Precision.DEFAULT)


# ---------------------------------------------------------------------------
# pairblock functions: (r, rinv, W, nrm) -> [k1 x (S, P) matrices]
#
#   r    : [r0, r1, r2], each (S, P) = x_target - x_source per slot
#   rinv : (S, P) masked 1/r
#   W    : [k0 x (S or 1, P)] density factors (per-lane for S2M,
#          per-(surface, lane) for L2T)
#   nrm  : [3 x (1, P)] source normals (S2M dipole kernels) or None
#
# Formulas match ops/kernels.py apply_fns (scale factor applied by the
# caller; kernel_functions.hpp:15-198 conventions).
# ---------------------------------------------------------------------------

def _pb_lap_fxu(r, rinv, W, nrm):
    return [rinv * W[0]]


def _pb_lap_dxu(r, rinv, W, nrm):
    rdotn = r[0] * nrm[0] + r[1] * nrm[1] + r[2] * nrm[2]
    return [rdotn * (rinv * rinv * rinv) * W[0]]


def _pb_lap_fxdu(r, rinv, W, nrm):
    h = (rinv * rinv * rinv) * W[0]
    return [r[d] * h for d in range(3)]


def _pb_stk_fxu(r, rinv, W, nrm):
    rf = r[0] * W[0] + r[1] * W[1] + r[2] * W[2]
    C = rf * (rinv * rinv * rinv)
    return [rinv * W[d] + C * r[d] for d in range(3)]


def _pb_stk_dxu(r, rinv, W, nrm):
    rf = r[0] * W[0] + r[1] * W[1] + r[2] * W[2]
    rn = r[0] * nrm[0] + r[1] * nrm[1] + r[2] * nrm[2]
    rinv2 = rinv * rinv
    D = rf * rn * (rinv2 * rinv2 * rinv)
    return [D * r[d] for d in range(3)]


def _pb_stk_fxt(r, rinv, W, nrm):
    rf = r[0] * W[0] + r[1] * W[1] + r[2] * W[2]
    rinv2 = rinv * rinv
    E = rf * (rinv2 * rinv2 * rinv)
    return [E * r[j] * r[k] for j in range(3) for k in range(3)]


def _pb_stk_fsxu(r, rinv, W, nrm):
    u = _pb_stk_fxu(r, rinv, W, nrm)
    h = (rinv * rinv * rinv) * W[3]
    return [u[d] + r[d] * h for d in range(3)]


def _pb_stk_fxup(r, rinv, W, nrm):
    u = _pb_stk_fxu(r, rinv, W, nrm)
    rf = r[0] * W[0] + r[1] * W[1] + r[2] * W[2]
    return u + [rf * (rinv * rinv * rinv)]


_PAIRBLOCK = {
    "Laplace3D-FxU": _pb_lap_fxu,
    "Laplace3D-DxU": _pb_lap_dxu,
    "Laplace3D-FxdU": _pb_lap_fxdu,
    "Stokes3D-FxU": _pb_stk_fxu,
    "Stokes3D-DxU": _pb_stk_dxu,
    "Stokes3D-FxT": _pb_stk_fxt,
    "Stokes3D-FSxU": _pb_stk_fsxu,
    "Stokes3D-FxUP": _pb_stk_fxup,
}


def _pair_r(sign, surf, pts):
    """r = x_t - x_s with the surface as target (sign=+1, S2M) or as
    source (sign=-1, L2T); surf [3 x (S, 1)], pts [3 x (1, P)]."""
    r = [sign * (surf[d] - pts[d]) for d in range(3)]
    r2 = r[0] * r[0] + r[1] * r[1] + r[2] * r[2]
    return r, _rinv_m(r2)


# ---------------------------------------------------------------------------
# S2M
# ---------------------------------------------------------------------------

def _s2m_body(pb_fn, sign, k0, k1, needs_n, n_tiles, *refs):
    (sx, sy, sz) = refs[0:3]                       # (S8, 1) surface
    px, py, pz = refs[3:6]                         # (1, TL) slot tile
    off = 6
    if needs_n:
        nrm = tuple(refs[off + d][:] for d in range(3))
        off += 3
    else:
        nrm = None
    W = [refs[off + c][:] for c in range(k0)]
    g_ref = refs[off + k0]                         # (1, TL, PB) 0/1
    out_ref = refs[off + k0 + 1]                   # (k1, S8, PB)
    dt = out_ref.dtype
    surf = (sx[:], sy[:], sz[:])
    r, rinv = _pair_r(sign, surf, (px[:], py[:], pz[:]))
    Ms = pb_fn(r, rinv, W, nrm)
    G = g_ref[0]                                   # (TL, PB)
    j = pl.program_id(1) if n_tiles > 1 else 0

    for c in range(k1):
        hi, lo = _split_hi_lo(Ms[c])
        y = _dot(hi, G, dt) + _dot(lo, G, dt)
        if n_tiles > 1:
            @pl.when(j == 0)
            def _():
                out_ref[c] = y

            @pl.when(j > 0)
            def _():
                out_ref[c] += y
        else:
            out_ref[c] = y


@functools.partial(jax.jit, static_argnames=("kernel", "cap", "sign",
                                             "interpret"))
def surface_pair(kernel: KernelSpec, surf, pts_l, nrm_l, f_l,
                 cap: int, sign: int = 1,
                 interpret: Optional[bool] = None):
    """Per-box surface pairing with per-slot densities -> per-box,
    per-surface-point sums (the S2M check-potential pass).

    surf  (ns, 3): box-local surface points (shared by every box).
    pts_l (3, B*cap): box-local point coords, box-major slots.
    nrm_l (3, B*cap) or None: source normals.
    f_l   (k0, B*cap): densities, ZERO in padded slots.
    -> (k1, ns, B) unscaled sums u[c, m, b] = sum_s M_c(surf_m, x_bs).
    """
    if interpret is None:
        from ..config import config
        interpret = config.pallas_interpret or (
            jax.default_backend() not in ("tpu", "axon"))
    ns_surf = surf.shape[0]
    k0, k1 = kernel.kdim0, kernel.kdim1
    needs_n = kernel.needs_normal
    N = pts_l.shape[1]
    B = N // cap
    PB = 128                                      # boxes per program
    assert B % PB == 0, (B, PB)
    LP = PB * cap                                 # slots per program
    # tile = the whole program's slot range when VMEM allows, else
    # grid-chunked (the second grid dim revisits the output block)
    n_tiles = 1
    while (LP % n_tiles or (LP // n_tiles) % 128
           or (LP // n_tiles) > 8192):
        n_tiles += 1
    TL = LP // n_tiles
    S8 = -(-ns_surf // 8) * 8
    dt = pts_l.dtype
    surf_c = [jnp.pad(surf[:, d].astype(dt), (0, S8 - ns_surf)
                      ).reshape(S8, 1) for d in range(3)]
    # static slot -> box selector, bf16-exact 0/1, tile-major
    box_of_slot = (np.arange(LP) // cap) % PB
    G = np.zeros((LP, PB), np.float32)
    G[np.arange(LP), box_of_slot] = 1.0
    G = jnp.asarray(G.reshape(n_tiles, TL, PB), jnp.bfloat16)

    const_spec = pl.BlockSpec((S8, 1), lambda g, j: (0, 0),
                              memory_space=pltpu.VMEM)
    slot_spec = pl.BlockSpec(
        (1, TL), lambda g, j: (0, g * n_tiles + j),
        memory_space=pltpu.VMEM)
    ops_in = surf_c + [pts_l[d:d + 1] for d in range(3)]
    in_specs = [const_spec] * 3 + [slot_spec] * 3
    if needs_n:
        ops_in += [nrm_l[d:d + 1] for d in range(3)]
        in_specs += [slot_spec] * 3
    ops_in += [f_l[c:c + 1] for c in range(k0)]
    in_specs += [slot_spec] * k0
    ops_in += [G]
    in_specs += [pl.BlockSpec((1, TL, PB), lambda g, j: (j, 0, 0),
                              memory_space=pltpu.VMEM)]

    out = pl.pallas_call(
        functools.partial(_s2m_body, _PAIRBLOCK[kernel.name], sign,
                          k0, k1, needs_n, n_tiles),
        grid=(B // PB, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((k1, S8, PB), lambda g, j: (0, 0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k1, S8, B), dt),
        cost_estimate=pl.CostEstimate(
            flops=int(B) * cap * ns_surf * kernel.flops
            + 4 * k1 * int(B) * cap * S8,
            bytes_accessed=(pts_l.size + f_l.size) * 4
            + k1 * S8 * int(B) * 4,
            transcendentals=int(B) * cap * ns_surf),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(*ops_in)
    return out[:, :ns_surf]


# ---------------------------------------------------------------------------
# L2T
# ---------------------------------------------------------------------------

def _l2t_body(pb_fn, k0, k1, *refs):
    (sx, sy, sz) = refs[0:3]                       # (S8, 1) surface
    px, py, pz = refs[3:6]                         # (1, CH) targets
    q_refs = refs[6:6 + k0]                        # (S8, PB) densities
    e_ref = refs[6 + k0]                           # (PB, CH) 0/1
    out_refs = refs[6 + k0 + 1:]                   # k1 x (1, CH)
    dt = out_refs[0].dtype
    surf = (sx[:], sy[:], sz[:])
    E = e_ref[0]                                   # (PB, CH)
    # expand per-box densities to per-target-lane weights, exactly
    # (hi/lo splits against the 0/1 expansion matrix)
    W = []
    for c in range(k0):
        q_hi, q_lo = _split_hi_lo(q_refs[c][:])
        W.append(_dot(q_hi, E, dt) + _dot(q_lo, E, dt))
    r, rinv = _pair_r(-1, surf, (px[:], py[:], pz[:]))
    Ms = pb_fn(r, rinv, W, None)
    for c in range(k1):
        out_refs[c][:] = jnp.sum(Ms[c], axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("kernel", "cap_t",
                                             "interpret"))
def l2t_surface(kernel: KernelSpec, surf, xt_l, q_cm, cap_t: int,
                interpret: Optional[bool] = None):
    """Downward-equivalent surface -> leaf targets (L2T).

    surf (ns, 3): box-local equivalent surface (source positions).
    xt_l (3, B*cap_t): box-local target coords, box-major slots.
    q_cm (k0, ns, B): per-box equivalent densities, component-major.
    -> (k1, B*cap_t) unscaled potentials at the padded target slots.
    """
    if interpret is None:
        from ..config import config
        interpret = config.pallas_interpret or (
            jax.default_backend() not in ("tpu", "axon"))
    ns_surf = surf.shape[0]
    k0, k1 = kernel.kdim0, kernel.kdim1
    assert not kernel.needs_normal, (
        "L2T sources are equivalent monopole surfaces")
    B = q_cm.shape[2]
    PB = 128
    assert B % PB == 0, (B, PB)
    LT = PB * cap_t                                # lanes per program
    S8 = -(-ns_surf // 8) * 8
    # VMEM budget: ~(k0 + 6) live (S8, CH) f32 tiles
    n_ch = 1
    while (LT % n_ch or (LT // n_ch) % 128
           or (k0 + 6) * S8 * (LT // n_ch) * 4 > 48 * 2 ** 20):
        n_ch += 1
    CH = LT // n_ch
    dt = xt_l.dtype
    surf_c = [jnp.pad(surf[:, d].astype(dt), (0, S8 - ns_surf)
                      ).reshape(S8, 1) for d in range(3)]
    q_pad = jnp.pad(q_cm, ((0, 0), (0, S8 - ns_surf), (0, 0)))
    # static box -> target-lane expansion, bf16-exact 0/1, chunk-major
    E = np.zeros((PB, LT), np.float32)
    E[np.arange(LT) // cap_t, np.arange(LT)] = 1.0
    E = jnp.asarray(E.reshape(PB, n_ch, CH).transpose(1, 0, 2),
                    jnp.bfloat16)                  # (n_ch, PB, CH)

    const_spec = pl.BlockSpec((S8, 1), lambda g, ch: (0, 0),
                              memory_space=pltpu.VMEM)
    lane_spec = pl.BlockSpec(
        (1, CH), lambda g, ch: (0, g * n_ch + ch),
        memory_space=pltpu.VMEM)
    ops_in = surf_c + [xt_l[d:d + 1] for d in range(3)]
    in_specs = [const_spec] * 3 + [lane_spec] * 3
    ops_in += [q_pad[c] for c in range(k0)]
    in_specs += [pl.BlockSpec((S8, PB), lambda g, ch: (0, g),
                              memory_space=pltpu.VMEM)] * k0
    ops_in += [E]
    in_specs += [pl.BlockSpec((1, PB, CH), lambda g, ch: (ch, 0, 0),
                              memory_space=pltpu.VMEM)]

    outs = pl.pallas_call(
        functools.partial(_l2t_body, _PAIRBLOCK[kernel.name], k0, k1),
        grid=(B // PB, n_ch),
        in_specs=in_specs,
        out_specs=[lane_spec] * k1,
        out_shape=[jax.ShapeDtypeStruct((1, B * cap_t), dt)] * k1,
        cost_estimate=pl.CostEstimate(
            flops=int(B) * cap_t * ns_surf * kernel.flops
            + 4 * k0 * S8 * int(B) * cap_t,
            bytes_accessed=(xt_l.size + q_cm.size) * 4
            + k1 * int(B) * cap_t * 4,
            transcendentals=int(B) * cap_t * ns_surf),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(*ops_in)
    return jnp.concatenate(outs, axis=0)           # (k1, B*cap_t)
