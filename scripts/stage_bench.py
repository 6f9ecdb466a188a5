"""Per-stage KIFMM timing on the real chip (developer tool).

Measures the depth-6 1e7-point Laplace pipeline stage by stage with
the axon timing rules (fresh inputs per call, scalar-readback fence):
S2M+M2M (upward), M2L (scan vs Pallas z-tiled), L2L+L2T, P2P stencil,
and the full eval.  Usage: python scripts/stage_bench.py [n] [depth].
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def fence(x):
    return float(jnp.sum(x))


def timeit(fn, *args, iters=3):
    fn(*args)                                    # compile + warm
    ts = []
    for i in range(iters):
        a2 = [a * (1.0 + 1e-6 * (i + 1)) if isinstance(a, jnp.ndarray)
              and jnp.issubdtype(a.dtype, jnp.floating) else a
              for a in args]
        for a in a2:
            if isinstance(a, jnp.ndarray):
                fence(a)
        t0 = time.perf_counter()
        fn(*a2)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    from sctl_tpu.config import enable_compile_cache
    enable_compile_cache()
    from sctl_tpu.fmm import KIFMM
    from sctl_tpu.ops import Laplace3D_FxU

    rng = np.random.default_rng(0)
    xs = rng.random((n, 3))
    f = rng.normal(size=(n, 1))
    kif = KIFMM(Laplace3D_FxU, p=6, depth=depth).setup(xs, xs)
    fp, fp_ovf = kif._pad_density(f)
    data = kif._data
    L = kif.depth
    ns = kif._ops.n_surf * kif._ops.k0t
    B = kif.src_tree.n_boxes
    print(f"n={n} depth={depth} B={B} cap_s={kif.cap_s} "
          f"cap_t={kif.cap_t} ns={ns}")

    # upward (S2M + M2M): reuse _eval_impl front via a trimmed jit
    hi = jax.lax.Precision.HIGHEST

    @jax.jit
    def up(fp, fp_ovf, data):
        xck = data["surf_out_L"][None] + data["ctr"][:, None, :]

        def s2m_box(args):
            xc, xs_, nsr, fb = args
            return kif.ker_s2m.apply_pairwise(xc, xs_, nsr, fb)

        u_check = jax.lax.map(
            s2m_box, (xck, data["xs_pad"], data["ns_pad"], fp),
            batch_size=4096).reshape(B, -1)
        q = jnp.einsum("mn,bn->bm", data["uc2e_L"], u_check,
                       precision=hi)
        outs = [jnp.sum(q)]
        for lvl in range(L, 2, -1):
            q = jnp.dot(q.reshape(-1, 8 * ns), data["m2m_cat"][lvl - 1],
                        precision=hi)
            outs.append(jnp.sum(q))
        return sum(outs)

    t_up = timeit(lambda a, b: fence(up(a, b, data)), fp, fp_ovf)
    print(f"S2M+M2M: {t_up*1e3:.1f} ms")

    # M2L variants
    qs = {lvl: jnp.asarray(
        rng.normal(size=((1 << (3 * lvl)), ns)), kif.dtype)
        for lvl in range(2, L + 1)}
    qtup = tuple(qs[lvl] for lvl in range(2, L + 1))

    for variant in ("scan", "pallas", "blocked"):
        kif.use_pallas_m2l = variant != "scan"
        kif._m2l_blocked = variant == "blocked"

        @jax.jit
        def m2l(qtup, data):
            qlv = {lvl: qtup[lvl - 2] for lvl in range(2, L + 1)}
            v = kif._m2l_sweep(qlv, data)
            return sum(jnp.sum(x) for x in v.values())

        t = timeit(lambda a: fence(m2l(a, data)), qtup)
        print(f"M2L ({variant}): {t*1e3:.1f} ms", flush=True)

    # P2P stencil
    @jax.jit
    def p2p(fp, data):
        return jnp.sum(kif._p2p_stencil_pallas(fp, data))

    t_p2p = timeit(lambda a: fence(p2p(a, data)), fp)
    print(f"P2P stencil: {t_p2p*1e3:.1f} ms")

    # L2T
    qd = jnp.asarray(rng.normal(size=(B, ns)), kif.dtype)

    @jax.jit
    def l2t(qd, data):
        xeq = data["surf_out_L"][None] + data["ctr"][:, None, :]
        k0 = kif.ker_l2t.kdim0

        def box(args):
            xt, xe, q_ = args
            return kif.ker_l2t.apply_pairwise(xt, xe, xe,
                                              q_.reshape(-1, k0))
        u = jax.lax.map(box, (data["xt_pad"], xeq, qd),
                        batch_size=4096)
        return jnp.sum(u)

    t_l2t = timeit(lambda a: fence(l2t(a, data)), qd)
    print(f"L2T: {t_l2t*1e3:.1f} ms")

    # full eval, both M2L variants
    for variant in (False, True):
        kif.use_pallas_m2l = variant
        ev = jax.jit(lambda a, b, d: sum(
            jnp.sum(x) for x in kif._eval_impl(a, b, d)))
        t = timeit(lambda a, b: fence(ev(a, b, data)), fp, fp_ovf)
        print(f"FULL eval (m2l={'pallas' if variant else 'scan'}): "
              f"{t*1e3:.1f} ms -> {n/t/1e6:.1f} Mpts/s")


if __name__ == "__main__":
    main()
