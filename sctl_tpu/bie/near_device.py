"""Device-resident near-singular quadrature assembly.

The reference assembles its near-correction matrices on the host
(boundary_integral.txx:816+, one adaptive/special quadrature per
(target, element) pair); at 1e5-unknown scale that is minutes of
single-core work and was the dominant cold-setup cost (BENCH_r03:
1330 s).  This module is the TPU-first redesign of that stage: the
*rule descriptors* (preimages, shell-radii ladders, band classes) are
built on the host — they are tiny — and every floating-point-heavy
stage (panelization, geometry, kernel blocks, basis contractions, the
far-quadrature subtraction) runs as a handful of jitted device
programs whose results STAY on device, feeding _setup_device_apply
directly.  Uploads are O(P) scalars, downloads are O(P) bits (the
two-order disagreement masks); this matters because the axon tunnel
measures ~88 MB/s up and ~5 MB/s down.

f32 accuracy engineering (the part the f64-on-CPU reference never
needed): every displacement is computed in a LOCAL frame —

  - ladder bands / far subtraction: element-centered coordinates
    (|X - ctr_e| <= patch radius, so f32 rounding is relative to the
    patch scale, not the domain scale);
  - Duffy shells: parameter-space offsets delta = uv - u0 are built
    directly from the shell radii (never as a difference of absolute
    coordinates), and the surface is evaluated as an exact-difference
    chart  dX = X(u0 + delta) - X(u0)  via trig/rational identities
    (DeviceGeom.delta), so |dX| carries full relative precision even
    at 1e-4-scale shells where absolute-frame f32 would lose every
    digit.  The pair's target enters as r0 = xt - X(u0), computed
    once on the host in f64.

The quadrature DEFINITIONS (shell ladder, panel blend, band model,
two-order disagreement checks) are identical to the host path in
patches.py / legacy_quadrature.py; on a f64 backend the two paths
agree to ~1e-10 (tests/test_bie.py), which is how the engine is
validated in CI without TPU hardware.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..linalg.quadrule import leg_quad_rule
from ..ops.kernels import KernelSpec
from ..ops.uker import uker_matrix

__all__ = ["DeviceGeom", "TorusGeom", "SphereGeom",
           "assemble_near_device"]


# ---------------------------------------------------------------------------
# device chart geometry (exact-difference evaluation)
# ---------------------------------------------------------------------------

class DeviceGeom:
    """Per-geometry device evaluation protocol used by the Duffy stage.

    delta(eids, u0, duv) -> (dX, n, J): for per-row elements `eids`
    (C,), pair preimages `u0` (C, 2) and parameter offsets `duv`
    (C, M, 2), return the exact-difference surface displacement
    dX = X(u0+duv) - X(u0) (C, M, 3), the outward unit normal at
    u0+duv (C, M, 3) and the surface Jacobian (C, M) — all computed
    so that small |duv| keeps full relative precision in dX.
    """

    def delta(self, eids, u0, duv):
        raise NotImplementedError


def _dcos(a0, da):
    """cos(a0+da) - cos(a0) without cancellation:
    -2 sin(da/2) sin(a0 + da/2)."""
    return -2.0 * jnp.sin(0.5 * da) * jnp.sin(a0 + 0.5 * da)


def _dsin(a0, da):
    """sin(a0+da) - sin(a0) = 2 sin(da/2) cos(a0 + da/2)."""
    return 2.0 * jnp.sin(0.5 * da) * jnp.cos(a0 + 0.5 * da)


class TorusGeom(DeviceGeom):
    """Torus (major R, minor r), nu x nv patches — the device mirror
    of patches.torus_patches' chart map, with analytic normals and
    Jacobian (the host path uses FD tangents; analytic avoids the
    f32 FD cancellation entirely)."""

    def __init__(self, nu, nv, R, r, flip=1.0):
        self.nu, self.nv, self.R, self.r = nu, nv, R, r
        self.flip = flip

    def delta(self, eids, u0, duv):
        nu, nv, R, r = self.nu, self.nv, self.R, self.r
        dt = duv.dtype
        two_pi = dt.type(2 * np.pi)
        eu = (eids // nv).astype(dt)
        ev = (eids % nv).astype(dt)
        th0 = two_pi * (eu + u0[:, 0]) / nu            # (C,)
        ph0 = two_pi * (ev + u0[:, 1]) / nv
        dth = two_pi * duv[..., 0] / nu                # (C, M)
        dph = two_pi * duv[..., 1] / nv
        th0 = th0[:, None]
        ph0 = ph0[:, None]
        th1 = th0 + dth
        cth0, sth0 = jnp.cos(th0), jnp.sin(th0)
        cph0 = jnp.cos(ph0)
        dcth = _dcos(th0, dth)
        dsth = _dsin(th0, dth)
        dcph = _dcos(ph0, dph)
        dsph = _dsin(ph0, dph)
        w0 = R + r * cph0                              # (C, 1)
        # X = (w cos(th), w sin(th), r sin(ph)), w = R + r cos(ph)
        # dX_x = w0 * dcos(th) + r dcos(ph) * cos(th1)
        dx = w0 * dcth + r * dcph * jnp.cos(th1)
        dy = w0 * dsth + r * dcph * jnp.sin(th1)
        dz = r * dsph
        dX = jnp.stack([dx, dy, dz], -1)
        ph1 = ph0 + dph
        cph1, sph1 = jnp.cos(ph1), jnp.sin(ph1)
        cth1, sth1 = jnp.cos(th1), jnp.sin(th1)
        n = self.flip * jnp.stack(
            [cph1 * cth1, cph1 * sth1, sph1], -1)
        J = (two_pi / nu) * (two_pi / nv) * r * (R + r * cph1)
        return dX, n, J


class SphereGeom(DeviceGeom):
    """Cubed-sphere charts (patches.sphere_patches): X = radius *
    p/|p| with p affine in the patch-local uv.  Exact-difference form:

      X1 - X0 = radius * [ A d / |p1| + p0 (|p0|^2-|p1|^2)
                           / (|p0||p1|(|p0|+|p1|)) ]

    with |p0|^2-|p1|^2 = -(2 p0.(A d) + |A d|^2) — every factor is a
    product of O(1) and small terms, no cancellation."""

    def __init__(self, n_per_face, radius, axes, flip=1.0):
        self.n = n_per_face
        self.radius = radius
        # axes rows: (a, b, c, sgn) as in patches.sphere_patches
        self.ax = np.asarray([(a, b, c) for (a, b, c, _) in axes])
        self.sgn = np.asarray([s for (_, _, _, s) in axes],
                              np.float64)
        self.flip = flip

    def _p0_A(self, eids, u0):
        """Affine chart p(uv) = p0 + A @ (uv - u0) per row."""
        n = self.n
        npf = n * n
        f = eids // npf
        w = eids % npf
        h = 1.0 / n
        uu = ((w // n) * h + u0[:, 0] * h) * 2 - 1
        vv = ((w % n) * h + u0[:, 1] * h) * 2 - 1
        C = len(eids)
        dt = u0.dtype
        p0 = jnp.zeros((C, 3), dt)
        rows = jnp.arange(C)
        a = jnp.asarray(self.ax[:, 0])[f]
        b = jnp.asarray(self.ax[:, 1])[f]
        c = jnp.asarray(self.ax[:, 2])[f]
        sg = jnp.asarray(self.sgn, dt)[f]
        p0 = p0.at[rows, a].set(uu)
        p0 = p0.at[rows, b].set(vv * sg)
        p0 = p0.at[rows, c].set(sg)
        # A columns: dp/du = 2h e_a, dp/dv = 2h sgn e_b
        A = jnp.zeros((C, 3, 2), dt)
        A = A.at[rows, a, 0].set(2 * h)
        A = A.at[rows, b, 1].set(2 * h * sg)
        return p0, A

    def delta(self, eids, u0, duv):
        rad = u0.dtype.type(self.radius)
        p0, A = self._p0_A(eids, u0)                   # (C,3),(C,3,2)
        Ad = jnp.einsum("cij,cmj->cmi", A, duv)        # (C,M,3)
        p0_ = p0[:, None, :]
        r0 = jnp.sqrt((p0_ * p0_).sum(-1))             # (C,1)
        p1 = p0_ + Ad
        r1 = jnp.sqrt((p1 * p1).sum(-1))               # (C,M)
        num = -(2.0 * (p0_ * Ad).sum(-1) + (Ad * Ad).sum(-1))
        dX = rad * (Ad / r1[..., None]
                    + p0_ * (num / (r0 * r1 * (r0 + r1)))[..., None])
        n = self.flip * p1 / r1[..., None]
        # J = |tu x tv| for X = rad p/|p|: with P = (I - nn^T)/|p|,
        # tu = rad P A[:,0], tv = rad P A[:,1]
        tu = A[:, None, :, 0] - n * (n * A[:, None, :, 0]).sum(
            -1, keepdims=True)
        tv = A[:, None, :, 1] - n * (n * A[:, None, :, 1]).sum(
            -1, keepdims=True)
        cr = jnp.cross(tu, tv)
        J = (rad / r1) ** 2 * jnp.sqrt((cr * cr).sum(-1))
        return dX, n, J


# ---------------------------------------------------------------------------
# small host-side helpers
# ---------------------------------------------------------------------------

def _uv_rule(order):
    x1, w1 = leg_quad_rule(order)
    uv = np.stack(np.meshgrid(x1, x1, indexing="ij"), -1).reshape(-1, 2)
    ww = np.outer(w1, w1).reshape(-1)
    return uv, ww


def _bary_w(x1):
    den = x1[:, None] - x1[None, :]
    np.fill_diagonal(den, 1.0)
    return 1.0 / den.prod(axis=1)


def _basis_dev(x1_np, uv, dtype):
    """Tensor Lagrange basis on device: uv (..., 2) -> (..., q^2),
    first-form barycentric (lagrange.py:interpolation_matrix) with a
    tiny-denominator guard instead of the exact-hit branch."""
    x1 = jnp.asarray(x1_np, dtype)
    w = jnp.asarray(_bary_w(np.asarray(x1_np, np.float64)), dtype)
    tiny = jnp.asarray(1e-30 if dtype == jnp.float64 else 1e-18, dtype)

    def axis(t):                                   # (...,) -> (..., q)
        d = t[..., None] - x1
        hit = d == 0.0
        l_t = d.prod(-1)
        m = (l_t[..., None] * w
             / jnp.where(jnp.abs(d) < tiny, tiny, d))
        # exact node hit: the row is the one-hot limit (host path's
        # hit branch, lagrange.py interpolation_matrix)
        return jnp.where(hit.any(-1, keepdims=True),
                         hit.astype(dtype), m)

    mu = axis(uv[..., 0])
    mv = axis(uv[..., 1])
    return (mu[..., :, None] * mv[..., None, :]).reshape(
        uv.shape[:-1] + (len(x1_np) ** 2,))


def _blocks(ker, d, ns, dtype):
    return _blocks_n(ker.name, float(ker.scale_factor), d, ns)


def _blocks_n(kname: str, scale: float, d, ns):
    dtype = d.dtype
    r2 = (d * d).sum(-1)
    tiny = jnp.asarray(1e-280 if dtype == jnp.float64 else 1e-30,
                       dtype)
    rinv = jnp.where(r2 > tiny,
                     jax.lax.rsqrt(jnp.where(r2 > tiny, r2, 1.0)),
                     0.0)
    if dtype == jnp.float64:
        rinv = jnp.where(r2 > tiny, 1.0 / jnp.sqrt(
            jnp.where(r2 > tiny, r2, 1.0)), 0.0)
    m = uker_matrix(kname, d, rinv, ns, jnp)
    return m * jnp.asarray(scale, dtype)


def _pad_idx(idx, C, fill):
    """Pad a chunk of indices to length C with a sacrificial row id."""
    out = np.full(C, fill, np.int64)
    out[:len(idx)] = idx
    return out


def _seg_matmul(bw, blk, seg: int = 512):
    """(C, nq, M) @ (C, M, k) with the M contraction split into `seg`-
    sized segments and the partials TREE-summed.

    The MXU accumulates a long f32 contraction serially in ~128-wide
    passes, so rounding grows linearly in M/128 — measured ~8e-6
    relative at M ~ 14k, which drowned the 30*tol two-order Duffy
    disagreement check and inflated the miss rate 41% -> 56%.
    Segmenting bounds each partial at ~seg/128 passes and the explicit
    halving tree adds only log2(M/seg) roundings: ~6e-7 at the same M.
    (In f64 — the CPU validation path — this is just a reassociation.)
    """
    C, nq, M = bw.shape
    k = blk.shape[-1]
    ns = -(-M // seg)
    if ns <= 1:
        return jnp.matmul(bw, blk)
    pad = ns * seg - M
    if pad:
        bw = jnp.pad(bw, ((0, 0), (0, 0), (0, pad)))
        blk = jnp.pad(blk, ((0, 0), (0, pad), (0, 0)))
    bw = bw.reshape(C, nq, ns, seg).transpose(0, 2, 1, 3)
    blk = blk.reshape(C, ns, seg, k)
    part = jnp.matmul(bw, blk)                     # (C, ns, nq, k)
    # single reduce over ns (XLA lowers it tree-ish; an explicit
    # halving tree compiled pathologically slowly on the axon backend)
    return part.sum(1)


# ---------------------------------------------------------------------------
# the jitted chunk programs — module-level, ALL arrays passed as
# arguments (closure-captured device arrays become HLO constants whose
# values enter the compile-cache key, defeating the persistent cache;
# as parameters the key depends only on shapes/dtypes)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("kname", "scale"),
         donate_argnums=(0,))
def _ladder_chunk_fn(out, xt_loc, ip, sel, Xg, ng, wJ, basisT,
                     kname, scale):
    """One ladder-band chunk: gather per-pair rule geometry, kernel
    blocks, weighted-basis contraction, scatter into the out rows."""
    d = xt_loc[:, None, :] - Xg[ip]                # (C, S, 3)
    blk = _blocks_n(kname, scale, d, ng[ip])
    bw = basisT[None] * wJ[ip][:, None, :]         # (C, nq, S)
    res = _seg_matmul(bw, blk.reshape(d.shape[0], d.shape[1], -1))
    return out.at[sel].set(res)


@partial(jax.jit, static_argnames=("kname", "scale"),
         donate_argnums=(0,))
def _far_chunk_fn(out, xt_loc, pe, sel, Xf, nf_, wf, interp,
                  kname, scale):
    """Far-quadrature subtraction chunk (uniform per-element far
    rule): blocks at the element's far nodes, weight, contract with
    the shared density-interpolation matrix, scatter-subtract."""
    d = xt_loc[:, None, :] - Xf[pe]                # (C, nf, 3)
    blk = _blocks_n(kname, scale, d, nf_[pe])
    blk = blk * wf[pe][..., None, None]
    res = jnp.einsum("nf,cfk->cnk", interp,
                     blk.reshape(d.shape[0], d.shape[1], -1))
    return out.at[sel].add(-res)


# ---------------------------------------------------------------------------
# the engine
# ---------------------------------------------------------------------------

def assemble_near_device(op, dtype=None, chunk_scale: float = 1.0):
    """Assemble op's near-correction matrices on device.

    Returns (out, fallback_count): `out` is a (P, nq*k0, k1) device
    array of K_near(t,e) - K_far(t,e) in `dtype` (f32 on TPU, f64 on
    a f64-enabled CPU backend), pairs ordered as op.near_pairs.

    Requirements: a single ParametricPatchList element list carrying a
    `device_geom` (DeviceGeom) for the Duffy stage; uniform node /
    far-node counts per element (true for ParametricPatchList).
    """
    import time as _time
    prof = {}
    _t0 = _time.perf_counter()

    def _tick(name):
        nonlocal _t0
        t = _time.perf_counter()
        prof[name] = prof.get(name, 0.0) + (t - _t0)
        _t0 = t

    lst = op.elem_lists[0]
    ker = op.kernel
    geom: DeviceGeom = lst.device_geom
    if dtype is None:
        dtype = jnp.float32 if jax.default_backend() in ("tpu", "axon") \
            else (jnp.float64 if jax.config.jax_enable_x64
                  else jnp.float32)
    k0, k1 = ker.kdim0, ker.kdim1
    nq = lst.q ** 2
    nf = lst.qf ** 2
    pair_t = np.array([t for (t, _) in op.near_pairs], np.int64)
    pair_e = np.array([e for (_, e) in op.near_pairs], np.int64)
    P = len(pair_t)
    out = jnp.zeros((P + 1, nq, k0 * k1), dtype)   # +1 sacrificial row
    if P == 0:
        return out[:P].reshape(P, nq * k0, k1), 0
    Xt = op.Xt_eff
    tol = op.tol

    # -- host: preimages, bands (identical to near_interac_batch) ----
    _tick("init")
    u0, adapt, dphys, ok = lst._preimage_batch(Xt[pair_t], pair_e)
    _tick("preimage")
    X_all = lst._node_X_all()
    diam = np.linalg.norm(X_all.max(1) - X_all.min(1), axis=1)
    orders = [m * lst.qf for m in lst._LADDER]
    band = np.full(P, -1, np.int64)
    for k in range(len(orders) - 1, -1, -1):
        dk = (2.0 * (diam[pair_e] / orders[k])
              * (0.1 * tol) ** (-1.0 / orders[k]))
        band = np.where(dphys >= dk, k, band)
    fallback = ~ok
    band = np.where(fallback, -2, band)

    ctr = X_all.mean(1)                            # element centers
    Xt_loc = (Xt[pair_t] - ctr[pair_e]).astype(np.float64)

    # -- ladder bands: ONE compiled program for all bands ------------
    # Every band's rule is padded to the largest band's point count
    # S_pad and the geometry tables always span all E elements, so the
    # chunk program's argument shapes — hence its compiled executable
    # — are IDENTICAL across bands (and across runs: one compile, one
    # persistent-cache entry).  Padded rule points sit at a dummy
    # offset with ZERO weight.
    E = lst.size()
    kname, kscale = ker.name, float(ker.scale_factor)
    bands = [(k, orders[k], np.where(band == k)[0])
             for k in range(len(orders))]
    bands = [b for b in bands if len(b[2])]
    if bands:
        S_pad = max(qk * qk for _, qk, _ in bands)
        C = max(64, int(chunk_scale * 8.0e6) // S_pad)
        for k, qk, idx in bands:
            uv, ww = _uv_rule(qk)
            S = len(ww)
            basis = lst._basis(uv)                 # (S, nq) host f64
            _tick("ladder_misc")
            # geometry only for the band's OWN elements, scattered
            # into the E-row tables (table shapes stay band-invariant
            # for the one-executable property; rows of absent
            # elements are never indexed)
            ue = np.unique(pair_e[idx])
            Xg, ng, Jg = lst._geom_many(
                np.repeat(ue, S), np.tile(uv, (len(ue), 1)))
            _tick("ladder_geom")
            Xg_p = np.full((E, S_pad, 3), 1e3, dtype)
            Xg_p[ue, :S] = (Xg.reshape(len(ue), S, 3)
                            - ctr[ue][:, None, :])  # element-centered
            ng_p = np.zeros((E, S_pad, 3), dtype)
            ng_p[ue, :S] = ng.reshape(len(ue), S, 3)
            wJ_p = np.zeros((E, S_pad), dtype)
            wJ_p[ue, :S] = ww[None, :] * Jg.reshape(len(ue), S)
            bas_p = np.zeros((nq, S_pad), dtype)
            bas_p[:, :S] = basis.T
            dXg = jnp.asarray(Xg_p)
            dng = jnp.asarray(ng_p)
            dwJ = jnp.asarray(wJ_p)
            dbas = jnp.asarray(bas_p)
            _tick("ladder_upload")
            for c0 in range(0, len(idx), C):
                sl = idx[c0:c0 + C]
                out = _ladder_chunk_fn(
                    out,
                    jnp.asarray(_pad_rows_f(
                        Xt_loc[sl].astype(dtype), C)),
                    jnp.asarray(_pad_idx(pair_e[sl], C, 0)),
                    jnp.asarray(_pad_idx(sl, C, P)),
                    dXg, dng, dwJ, dbas,
                    kname=kname, scale=kscale)
            out.block_until_ready()
            _tick(f"ladder_dev_b{k}")

    # -- Duffy singular class ----------------------------------------
    # Same donated-buffer pattern as the ladder: every stage scatters
    # straight into `out` (and the per-pair metric buffers), no
    # (D, nq, k) intermediates — materializing hi/lo stacks and
    # fencing them cost ~1000 s of pile-up on the axon pipeline.
    didx = np.where(band == -1)[0]
    miss = np.zeros(P, bool)
    if len(didx):
        # host rule descriptors
        r0vec = (Xt[pair_t[didx]]
                 - lst._xyz_many(pair_e[didx], u0[didx]))
        order_hi, order_lo = (16, 12) if tol >= 1e-7 else (24, 18)
        met = jnp.zeros((2, P + 1), dtype)         # [scale, dmax]
        _tick("duffy_prep")
        out, met = _duffy_sweep(op, lst, geom, ker, didx, pair_e, u0,
                                adapt, r0vec, order_hi, dtype, out,
                                met, "set", chunk_scale)
        _tick("duffy_hi")
        out, met = _duffy_sweep(op, lst, geom, ker, didx, pair_e, u0,
                                adapt, r0vec, order_lo, dtype, out,
                                met, "cmp", chunk_scale)
        # two-order disagreement (same 30*tol rule as the host path),
        # then the +8-order escalation rung before any host fallback
        # (the host batch path's retry, patches.py
        # near_interac_batch).  Metrics REDUCE on device; the
        # download is two (P,) rows — pulling full matrices through
        # the ~5 MB/s tunnel measured 387 s.
        met_h = np.asarray(met)
        _tick("duffy_lo")
        scale = np.maximum(met_h[0, didx], 1e-300)
        dmax = met_h[1, didx]
        retry = didx[dmax > 30 * tol * scale]
        prof["duffy_retry_n"] = len(retry)
        _tick("duffy_check")
        if len(retry):
            r0r = (Xt[pair_t[retry]]
                   - lst._xyz_many(pair_e[retry], u0[retry]))
            out, met = _duffy_sweep(op, lst, geom, ker, retry,
                                    pair_e, u0, adapt, r0r,
                                    order_hi + 8, dtype, out, met,
                                    "cmpset", chunk_scale)
            met_h = np.asarray(met)
            s2 = np.maximum(met_h[0, retry], 1e-300)
            d2 = met_h[1, retry]
            # f32 noise floor: the pipeline's own arithmetic scatter
            # (measured p90 ~3e-5 vs an f64 oracle; input-rounding
            # bound ~6e-6).  Below it, hi24-vs-hi16 disagreement says
            # nothing about QUADRATURE convergence, and a host-f64
            # fallback would be invisible to the f32-stored operator —
            # so only genuinely-unconverged pairs go to the host.
            floor = 1e-4 if dtype == jnp.float32 else 0.0
            miss[retry[d2 > np.maximum(30 * tol, floor) * s2]] = True
            _tick("duffy_esc")

    # -- far-quadrature subtraction (all pairs, uniform nf) ----------
    Xf_e = (op.Xf.reshape(E, nf, 3)
            - ctr[:, None, :])                     # element-centered
    nf_e = op.Xnf.reshape(E, nf, 3)
    wf_e = op.wf.reshape(E, nf)
    interp = lst.far_field_density_matrix(0)       # (nq, nf) shared
    dXf = jnp.asarray(np.asarray(Xf_e, dtype))
    dnf = jnp.asarray(np.asarray(nf_e, dtype))
    dwf = jnp.asarray(np.asarray(wf_e, dtype))
    dinterp = jnp.asarray(np.asarray(interp, dtype))
    Cf = max(256, int(chunk_scale * 8.0e6) // nf)

    _tick("far_prep")
    for c0 in range(0, P, Cf):
        sl = np.arange(c0, min(c0 + Cf, P))
        out = _far_chunk_fn(
            out,
            jnp.asarray(_pad_rows_f(Xt_loc[sl].astype(dtype), Cf)),
            jnp.asarray(_pad_idx(pair_e[sl], Cf, 0)),
            jnp.asarray(_pad_idx(sl, Cf, P)),
            dXf, dnf, dwf, dinterp, kname=kname, scale=kscale)
    out.block_until_ready()
    _tick("far_dev")

    # -- host fallback for GN failures and Duffy misses --------------
    fb = np.where(fallback | miss)[0]
    if len(fb):
        from ..ops.kernels_np import block_matrix_np
        vals = np.zeros((len(fb), nq, k0 * k1))
        for j, pi in enumerate(fb):
            e = pair_e[pi]
            m = np.asarray(lst.near_interac(
                ker, Xt[pair_t[pi]], int(e), tol))   # (nq*k0, k1)
            s, t = op.far_dsp[e], op.far_dsp[e + 1]
            kf = block_matrix_np(ker, Xt[pair_t[pi]][None],
                                 op.Xf[s:t], op.Xnf[s:t])
            kf = kf * op.wf[None, s:t, None, None]
            fbk = np.tensordot(kf, interp,
                               axes=([1], [1]))    # (1, k0, k1, nq)
            m = m.reshape(nq, k0, k1) - fbk[0].transpose(2, 0, 1)
            vals[j] = m.reshape(nq, k0 * k1)
        out = out.at[jnp.asarray(fb)].set(
            jnp.asarray(np.asarray(vals, dtype)))
    _tick("fallback")
    prof["fallback_n"] = len(fb)
    op._near_prof = prof
    import os as _os
    if _os.environ.get("SCTL_NEAR_PROF"):
        print("[near_device]", {k: (round(v, 1)
                                    if isinstance(v, float) else v)
                                for k, v in prof.items()}, flush=True)

    out = out[:P].reshape(P, nq, k0, k1).reshape(P, nq * k0, k1)
    return out, len(fb)


def _pad_rows_f(a, C):
    out = np.zeros((C,) + a.shape[1:], a.dtype)
    out[:len(a)] = a
    return out


def _duffy_sweep(op, lst, geom, ker, didx, pair_e, u0, adapt, r0vec,
                 order, dtype, out, met, mode, chunk_scale):
    """One Duffy order over the given singular pairs: local-frame
    panelization (legacy_quadrature.duffy_quad_batch's panel blend,
    built on device from the host radii ladder), exact-difference
    geometry, kernel blocks, basis contraction — scattered straight
    into the donated (out, met) buffers.

    mode: "set"    — out[p] = v, met[0, p] = max|v|;
          "cmp"    — met[1, p] = max|v - out[p]| (out unchanged);
          "cmpset" — both (the escalation rung)."""
    from .legacy_quadrature import duffy_radii_batch
    D = len(didx)
    P = out.shape[0] - 1
    radii = duffy_radii_batch(u0[didx], order,
                              np.where(adapt[didx] < 1e-7, 0.0,
                                       adapt[didx]))
    K = radii.shape[1] - 1
    K = int(-(-K // 2) * 2)                        # stable compile key
    radii = np.pad(radii, ((0, 0), (0, K + 1 - radii.shape[1])),
                   mode="edge")
    npts = K * 4 * order * order
    C = max(32, int(chunk_scale * 4.0e6) // npts)
    qnodes = tuple(float(v) for v in lst._x1)

    for c0 in range(0, D, C):
        sl = np.arange(c0, min(c0 + C, D))
        out, met = _duffy_chunk_fn(
            out, met,
            jnp.asarray(_pad_rows_f(u0[didx[sl]].astype(dtype), C)),
            jnp.asarray(_pad_rows_f(radii[sl].astype(dtype), C)),
            jnp.asarray(_pad_rows_f(r0vec[sl].astype(dtype), C)),
            jnp.asarray(_pad_idx(pair_e[didx[sl]], C, 0)),
            jnp.asarray(_pad_idx(didx[sl], C, P)),
            kname=ker.name, scale=float(ker.scale_factor),
            geom=geom, order=order, qnodes=qnodes,
            kdim=ker.kdim0 * ker.kdim1, mode=mode)
    return out, met


@partial(jax.jit, static_argnames=("kname", "scale", "geom", "order",
                                   "qnodes", "kdim", "mode"),
         donate_argnums=(0, 1))
def _duffy_chunk_fn(out, met, c, rad, r0, eid, sel, *, kname, scale,
                    geom, order, qnodes, kdim, mode):
    """One Duffy chunk: c (C,2) preimage, rad (C,K+1) shell ladder,
    r0 (C,3) = xt - X(u0), eid (C,) elements, sel (C,) out rows.

    Panelization is the device mirror of duffy_quad_batch's panel
    blend, in LOCAL parameter offsets (see module docstring)."""
    dt = c.dtype
    nq = len(qnodes) ** 2
    x1 = np.asarray(qnodes, np.float64)
    K = rad.shape[1] - 1
    q1, w1 = leg_quad_rule(order)
    yy, zz = np.meshgrid(q1, q1, indexing="ij")
    n2 = order * order
    dyy = jnp.asarray(yy.ravel().astype(dt))
    dzz = jnp.asarray(zz.ravel().astype(dt))
    dww = jnp.asarray(np.outer(w1, w1).ravel().astype(dt))
    eps = 16 * (np.finfo(np.float64).eps)          # same live rule as
    # the host path (f64 threshold: panels that thin carry no weight
    # either way)
    r0_, r1_ = rad[:, :-1], rad[:, 1:]             # (C, K)

    def clip_lo(v, c_):                            # local clip of c+v
        # clip(c+v) - c computed in local frame: v in [-c, 1-c]
        return jnp.clip(v, -c_, 1.0 - c_)

    duv = []
    wts = []
    for d0 in range(2):
        cd0 = c[:, d0][:, None]
        cd1 = c[:, 1 - d0][:, None]
        for sgn in (-1.0, 1.0):
            f0 = clip_lo(sgn * r0_, cd0)           # (C, K) local
            f1 = clip_lo(sgn * r1_, cd0)
            lo0 = clip_lo(-r0_, cd1)
            hi0 = clip_lo(r0_, cd1)
            lo1 = clip_lo(-r1_, cd1)
            hi1 = clip_lo(r1_, cd1)
            th = jnp.abs(f1 - f0)
            w0 = hi0 - lo0
            w1_ = hi1 - lo1
            live = th * jnp.maximum(w0, w1_) >= eps
            z = dzz[None, None, :]
            y = dyy[None, None, :]
            dd0 = f0[..., None] * (1 - z) + f1[..., None] * z
            dd1 = ((lo0[..., None] * (1 - y) + hi0[..., None] * y)
                   * (1 - z)
                   + (lo1[..., None] * (1 - y)
                      + hi1[..., None] * y) * z)
            pan = (jnp.stack([dd0, dd1], -1) if d0 == 0
                   else jnp.stack([dd1, dd0], -1))
            duv.append(pan)                        # (C, K, n2, 2)
            wts.append(live[..., None] * dww * th[..., None]
                       * (w0[..., None] * (1 - z)
                          + w1_[..., None] * z))
    duv = jnp.stack(duv, 2).reshape(-1, K * 4 * n2, 2)
    wt = jnp.stack(wts, 2).reshape(-1, K * 4 * n2)
    dX, n, J = geom.delta(eid, c, duv)
    d = r0[:, None, :] - dX                        # (C, M, 3)
    blk = _blocks_n(kname, scale, d, n)
    basis = _basis_dev(x1, c[:, None, :] + duv, dt)
    bw = basis * (wt * J)[..., None]               # (C, M, nq)
    v = _seg_matmul(bw.transpose(0, 2, 1),
                    blk.reshape(blk.shape[0], -1, kdim))
    C = v.shape[0]
    if mode in ("cmp", "cmpset"):
        dmx = jnp.abs(v - out[sel]).reshape(C, -1).max(1)
        met = met.at[1, sel].set(dmx)
    if mode in ("set", "cmpset"):
        out = out.at[sel].set(v)
        met = met.at[0, sel].set(jnp.abs(v).reshape(C, -1).max(1))
    return out, met
