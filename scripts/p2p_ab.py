"""Dev A/B: packed9 stencil kernel vs slab-build cost vs cap choice."""
import sys, time
import jax, jax.numpy as jnp, numpy as np

def fence(x): return float(jnp.sum(x))

def timeit(fn, *args, iters=3):
    fn(*args)
    ts = []
    for i in range(iters):
        t0 = time.perf_counter(); fn(*args)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts)//2]

def main():
    from sctl_tpu.config import enable_compile_cache, config
    enable_compile_cache()
    from sctl_tpu.fmm import KIFMM
    from sctl_tpu.ops import Laplace3D_FxU
    from sctl_tpu.ops.pallas_p2p import p2p_stencil9

    n = 10_000_000
    rng = np.random.default_rng(0)
    xs = rng.random((n, 3)); f = rng.normal(size=(n, 1))
    kif = KIFMM(Laplace3D_FxU, p=6, depth=6).setup(xs, xs)
    fp, _ = kif._pad_density(f)
    data = kif._data
    L = kif.depth; nn = 1 << L
    print(f"cap_s={kif.cap_s} SL={kif.SL} cap_t={kif.cap_t}", flush=True)

    # 1. slab build alone
    fslab = jax.jit(lambda a, d: kif._f_slab(a, d))
    t = timeit(lambda a: fence(fslab(a, data)), fp)
    print(f"f_slab build: {t*1e3:.1f} ms", flush=True)

    # 2. kernel alone (pre-built slab)
    f_s = jax.block_until_ready(fslab(fp, data))
    k9 = jax.jit(lambda fs, d: jnp.sum(p2p_stencil9(
        kif.ker_s2t, nn, kif.SL, kif.cap_t, d["xt_rast"],
        d["xs_slab"], d["ns_slab"], fs)))
    t = timeit(lambda a: fence(k9(a, data)), f_s)
    print(f"stencil9 kernel alone: {t*1e3:.1f} ms", flush=True)

    # 3. kernel + slab fused (production path)
    p2 = jax.jit(lambda a, d: jnp.sum(kif._p2p_stencil_pallas(a, d)))
    t = timeit(lambda a: fence(p2(a, data)), fp)
    print(f"stencil9 + slab fused: {t*1e3:.1f} ms", flush=True)

    # 4. S2M via production path (sl kernel) at this cap
    up = jax.jit(lambda a, d: jnp.sum(kif._s2m_checks(a, d))
                 if hasattr(kif, "_s2m_checks") else None)
    print("done", flush=True)

if __name__ == "__main__":
    main()
