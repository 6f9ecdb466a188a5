"""FFT-diagonalized M2L prototype + head-to-head vs the blocked GEMM
M2L (VERDICT r3 #1; reference role: the PVFMM Hadamard formulation
behind fmm-wrapper.txx:788-936).

The KIFMM equivalent/check surfaces are the surface points of a p^3
lattice, so every per-offset M2L operator K_d is a 3D cross-
correlation on that lattice: embedding surface densities into a
(2p)^3 cyclic grid diagonalizes all 316 operators by one rFFT per box
(kernel tapes K_hat[d] precomputed).  Per-interaction cost drops from
r2*r = 128*72 compressed MACs to (2p)^2*(p+1) = 1008 complex
multiplies — ~4x fewer flops — but on TPU those flops land on the
VPU/HBM (channel-diagonal products cannot use the MXU) while the
compressed GEMMs run 3-pass bf16 on the MXU.  This prototype measures
both at p=6 f32 on the real chip and records the outcome.

Usage: python scripts/fft_m2l_proto.py [depth=5]

Measured (real chip, 2026-08-20, depth 5 = 32^3 boxes, Laplace p=6,
level-5 sweep only, device sweep verified vs dense per-offset
matrices at depth 3, rel err 5.1e-07 f32):

    FFT M2L real-split (check potentials):  426.6 ms
    blocked GEMM M2L (full compressed):      26.2 ms   -> 16.3x

VERDICT: the FFT formulation LOSES decisively on TPU.  The flop count
drops ~4x but the 316-offset Hadamard is channel-diagonal — it cannot
use the MXU, and its acc arrays ((2p)^2*(p+1) = 1008 f32 channels x
32k boxes x 2 planes = 264 MB) are re-read/written every one of the
316 scan steps => ~80 GB of HBM traffic vs ~3 GB for the compressed
GEMM path whose inner loops run bf16 3-pass on the MXU.  The PVFMM
trade (fewer flops, more bandwidth) is exactly backwards for this
hardware; the compressed-GEMM M2L stays.  Kept as the recorded
experiment behind VERDICT r3 #1 / fmm-wrapper.txx:788-936.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def fence(x):
    return float(jnp.sum(x))


def timeit(fn, *args, iters=3):
    fn(*args)
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        fn(*args)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from sctl_tpu.config import enable_compile_cache
    enable_compile_cache()
    from sctl_tpu.fmm.kifmm import (KIFMMOperators, cube_surface,
                                    _vlist_offsets, RAD_IN)
    from sctl_tpu.ops import Laplace3D_FxU
    from sctl_tpu.ops.kernels_np import full_matrix_np
    from sctl_tpu.ops.pallas_m2l import (m2l_grid_blocked,
                                         blocked_m2l_mats)

    p = 6
    m = 2 * p                                   # cyclic grid side
    side = 1.0 / (1 << depth)                   # box side at `depth`
    h = RAD_IN * side / 2 / ((p - 1) / 2)       # lattice spacing
    surf = cube_surface(p)                      # (ns, 3) in [-1,1]
    gi = np.rint((surf + 1) / 2 * (p - 1)).astype(np.int64)  # [0,p-1]
    ns = len(surf)
    d, valid = _vlist_offsets()

    # kernel tapes: T_d[a] = K(h*a - d*side), a in [-(p-1), p-1]^3
    # wrapped into the (2p)^3 cyclic grid; K_hat = rfftn(T_d)
    ax = np.arange(m)
    aw = np.where(ax <= p - 1, ax, ax - m)      # cyclic offsets
    A = np.stack(np.meshgrid(aw, aw, aw, indexing="ij"),
                 -1).reshape(-1, 3)
    tapes = np.zeros((316, m, m, m))
    for o, dd in enumerate(d):
        r = h * A - dd * side
        rn = np.linalg.norm(r, axis=1)
        tapes[o] = np.where(
            rn > 0, Laplace3D_FxU.scale_factor
            / np.maximum(rn, 1e-300), 0.0).reshape(m, m, m)
    K_hat = np.fft.rfftn(tapes, axes=(1, 2, 3))  # (316, m, m, p+1)

    # correctness probe: one offset, random density vs dense K_d
    rng = np.random.default_rng(0)
    q = rng.normal(size=(ns,))
    qg = np.zeros((m, m, m))
    qg[gi[:, 0], gi[:, 1], gi[:, 2]] = q
    o = 57
    ug = np.fft.irfftn(np.fft.rfftn(qg) * K_hat[o], s=(m, m, m),
                       axes=(0, 1, 2))
    u_fft = ug[gi[:, 0], gi[:, 1], gi[:, 2]]
    s_in = surf * (RAD_IN * side / 2)
    Kd = full_matrix_np(Laplace3D_FxU, s_in, s_in + d[o] * side).T
    u_ref = Kd @ q
    err = np.abs(u_fft - u_ref).max() / np.abs(u_ref).max()
    print(f"single-offset check-potential rel err: {err:.2e}",
          flush=True)
    assert err < 1e-12

    # ---- timed sweep at the finest level of `depth` ----
    nside = 1 << depth
    B = nside ** 3
    nf = m * m * (p + 1)                        # rfft channels
    print(f"depth={depth} B={B} ns={ns} freq-channels={nf}")

    ops = KIFMMOperators(Laplace3D_FxU, Laplace3D_FxU, Laplace3D_FxU,
                         p, depth, 1.0)
    rc, r2c = ops.m2l_cap_r, ops.m2l_cap_r2

    # FFT pipeline, REAL-split (the axon TPU backend has no complex64
    # at all — jnp.fft and complex arithmetic both raise UNIMPLEMENTED
    # on device, measured 2026-08-20).  The forward
    # embed+rFFT3 is folded into ONE (ns -> nf) real matrix pair
    # (E[s] = rfftn(delta at gi[s]) is just a lattice phase), and the
    # inverse irFFT3+extract into one (nf -> ns) pair, so both
    # transforms are single MXU GEMMs per box; only the 316-offset
    # Hadamard accumulation stays elementwise (VPU/HBM).
    nf_ = m * m * (p + 1)
    kz = np.arange(p + 1)
    ky = np.arange(m)
    ph = (gi[:, 0, None, None, None] * ky[:, None, None]
          + gi[:, 1, None, None, None] * ky[None, :, None]
          + gi[:, 2, None, None, None] * kz[None, None, :])
    Ec = np.exp(-2j * np.pi * ph / m).reshape(ns, nf_)
    Er = jnp.asarray(Ec.real.astype(np.float32))
    Ei = jnp.asarray(Ec.imag.astype(np.float32))
    # inverse: u = irfftn(acc)[gi] = acc_r @ Gr + acc_i @ Gi
    eye_f = np.eye(nf_).reshape(nf_, m, m, p + 1)
    Gr = np.fft.irfftn(eye_f, s=(m, m, m), axes=(1, 2, 3)).reshape(
        nf_, m ** 3)[:, (gi[:, 0] * m + gi[:, 1]) * m + gi[:, 2]]
    Gi = np.fft.irfftn(1j * eye_f, s=(m, m, m),
                       axes=(1, 2, 3)).reshape(
        nf_, m ** 3)[:, (gi[:, 0] * m + gi[:, 1]) * m + gi[:, 2]]
    Gr = jnp.asarray(Gr.astype(np.float32))
    Gi = jnp.asarray(Gi.astype(np.float32))
    Kr = jnp.asarray(K_hat.real.reshape(316, nf_).astype(np.float32))
    Ki = jnp.asarray(K_hat.imag.reshape(316, nf_).astype(np.float32))
    # parity masks on the box grid, one (n,n,n) mask per offset band
    par = np.arange(nside) % 2
    pidx = (4 * par[:, None, None] + 2 * par[None, :, None]
            + par[None, None, :])
    q_boxes = jnp.asarray(
        rng.normal(size=(nside, nside, nside, ns)), jnp.float32)

    @jax.jit
    def m2l_fft(qb):
        hi = lax.Precision.HIGHEST
        qr = jnp.einsum("xyzn,nf->xyzf", qb, Er,
                        precision=hi)
        qi = jnp.einsum("xyzn,nf->xyzf", qb, Ei,
                        precision=hi)
        pad = ((3, 3), (3, 3), (3, 3), (0, 0))
        qrp = jnp.pad(qr, pad)
        qip = jnp.pad(qi, pad)
        masks = jnp.asarray(valid[pidx].astype(np.float32))

        def step(acc, blk):
            dd, kr, ki, mk = blk
            ar, ai = acc
            sr = lax.dynamic_slice(
                qrp, (3 + dd[0], 3 + dd[1], 3 + dd[2], 0),
                (nside, nside, nside, nf_))
            si = lax.dynamic_slice(
                qip, (3 + dd[0], 3 + dd[1], 3 + dd[2], 0),
                (nside, nside, nside, nf_))
            mk4 = mk[..., None]
            ar = ar + mk4 * (sr * kr - si * ki)
            ai = ai + mk4 * (sr * ki + si * kr)
            return (ar, ai), None

        z = jnp.zeros((nside, nside, nside, nf_), jnp.float32)
        (ar, ai), _ = lax.scan(step, (z, z),
                               (jnp.asarray(d), Kr, Ki,
                                jnp.moveaxis(masks, 3, 0)))
        return (jnp.einsum("xyzf,fn->xyzn", ar, Gr, precision=hi)
                + jnp.einsum("xyzf,fn->xyzn", ai, Gi, precision=hi))

    # device-path correctness at depth<=4: the full masked sweep vs
    # dense per-offset V-list matrices (host f64)
    if depth <= 4:
        u_dev = np.asarray(m2l_fft(q_boxes))
        qn = np.asarray(q_boxes, np.float64)
        u_np = np.zeros_like(u_dev, dtype=np.float64)
        mks = valid[pidx]                        # (n, n, n, 316)
        for o, dd in enumerate(d):
            Kd_o = full_matrix_np(                       # targets at 0,
                Laplace3D_FxU, s_in, s_in + dd * side).T  # src at +dd

            lo = np.maximum(-dd, 0)
            hi_ = nside - np.maximum(dd, 0)
            tsl = tuple(slice(lo[k], hi_[k]) for k in range(3))
            ssl = tuple(slice(lo[k] + dd[k], hi_[k] + dd[k])
                        for k in range(3))
            u_np[tsl] += (mks[tsl + (o,)][..., None]
                          * np.einsum("ts,xyzs->xyzt", Kd_o, qn[ssl]))
        errd = (np.abs(u_dev - u_np).max()
                / max(np.abs(u_np).max(), 1e-300))
        print(f"device sweep vs dense rel err: {errd:.2e}", flush=True)
        assert errd < 2e-5                       # f32 device path

    t_fft = timeit(lambda a: fence(m2l_fft(a)), q_boxes)
    print(f"FFT M2L real-split (check potentials, level {depth}): "
          f"{t_fft*1e3:.1f} ms", flush=True)

    # blocked GEMM pipeline on the same data (compressed, incl. dc2e
    # folded into U — strictly MORE work than the FFT form's bare
    # check potentials)
    W = blocked_m2l_mats(np.asarray(ops.ca_unit, np.float64),
                         ops.offsets, ops.parity_valid, rc, r2c)
    W_d = jnp.asarray(W, jnp.float32)
    V = jnp.asarray(ops.vb_unit[:, :r2c], jnp.float32)
    U = jnp.asarray(ops.cb_unit[:, :rc], jnp.float32)
    hh = nside // 2

    @jax.jit
    def m2l_blk(qb):
        hi = lax.Precision.HIGHEST
        qr2 = jnp.einsum("xyzn,nk->xyzk", qb, V, precision=hi)
        qbk = qr2.reshape(hh, 2, hh, 2, hh, 2, r2c).transpose(
            0, 2, 4, 1, 3, 5, 6).reshape(hh, hh, hh, 8 * r2c)
        qbp = jnp.pad(qbk, ((1, 1), (1, 1), (1, 1), (0, 0)))
        accb = m2l_grid_blocked(qbp, W_d, hh, rc, r2c)
        acc = accb.reshape(hh, hh, hh, 2, 2, 2, rc).transpose(
            0, 3, 1, 4, 2, 5, 6).reshape(nside, nside, nside, rc)
        return jnp.einsum("xyzr,nr->xyzn", acc, U, precision=hi)

    t_blk = timeit(lambda a: fence(m2l_blk(a)), q_boxes)
    print(f"blocked GEMM M2L (full compressed, level {depth}): "
          f"{t_blk*1e3:.1f} ms", flush=True)
    print(f"FFT/blocked ratio: {t_fft/t_blk:.2f}x", flush=True)


if __name__ == "__main__":
    main()
