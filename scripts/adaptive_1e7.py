"""AdaptiveFMM at its design scale: 1e7 surface-concentrated points
on the real chip (VERDICT r4 #5; reference role: the PVFMM wrapper's
production regime, fmm-wrapper.txx:788-801).

Measures host setup time, per-eval wall-clock (fresh densities +
scalar-readback fencing — the axon relay result-caches identical
dispatches and block_until_ready returns early), throughput, and
accuracy against a blocked direct sum on a 1k-target subsample.

Usage: python scripts/adaptive_1e7.py [n]    (default 1e7)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from sctl_tpu.config import enable_compile_cache
    enable_compile_cache()
    from sctl_tpu.fmm import AdaptiveFMM
    from sctl_tpu.ops import Laplace3D_FxU, direct_eval_blocked

    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000
    rng = np.random.default_rng(7)
    # torus surface with mild jitter: a genuinely 2-D-manifold-in-3-D
    # distribution (the case a uniform octree cannot refine into)
    th = rng.uniform(0, 2 * np.pi, n)
    ph = rng.uniform(0, 2 * np.pi, n)
    R, r = 2.0, 0.5
    x = np.stack([(R + r * np.cos(ph)) * np.cos(th),
                  (R + r * np.cos(ph)) * np.sin(th),
                  r * np.sin(ph)], 1)
    x += rng.normal(scale=1e-3, size=x.shape)
    f = rng.normal(size=(n, 1))

    t0 = time.perf_counter()
    fm = AdaptiveFMM(Laplace3D_FxU, p=6, max_pts=256, use_pallas_ulist=False).setup(x, x)
    t_setup = time.perf_counter() - t0
    n_leaf = len(fm.tree.leaf_keys)
    print(f"setup {t_setup:.1f}s  leaves {n_leaf}  depth {fm.L} "
          f"cap_s {fm.cap_s}", flush=True)

    params = fm.eval_params()
    fj = jnp.asarray(f, fm.dtype)

    @jax.jit
    def fused(fj, params):
        u = fm.eval_jnp(fj, params)
        return u, jnp.sum(u)

    u, s = fused(fj, params)
    float(s)                                     # compile + warm
    times = []
    for rep in range(3):
        fj2 = jnp.asarray(f * (1.0 + 1e-6 * (rep + 1)), fm.dtype)
        float(jnp.sum(fj2))                      # materialize upload
        t0 = time.perf_counter()
        u, s = fused(fj2, params)
        float(s)                                 # fenced readback
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[1]
    print(f"eval {dt:.3f}s  {n / dt / 1e6:.1f} Mpts/s", flush=True)

    # accuracy vs direct sum on a subsample
    sub = rng.choice(n, 1000, replace=False)
    u_fmm = np.asarray(fm.eval(f))[sub]
    ud = np.asarray(direct_eval_blocked(
        Laplace3D_FxU, jnp.asarray(x[sub]), jnp.asarray(x),
        jnp.asarray(f)))
    rel = float(np.abs(u_fmm - ud).max() / np.abs(ud).max())
    print(f"rel_err_vs_direct {rel:.2e}", flush=True)
    import json
    print(json.dumps({
        "metric": "adaptive_fmm_laplace_surface",
        "n": n, "setup_s": round(t_setup, 1),
        "eval_s": round(dt, 3),
        "mpts_per_s": round(n / dt / 1e6, 1),
        "rel_err": float(f"{rel:.2e}"),
        "leaves": int(n_leaf), "max_level": int(fm.L)}),
        flush=True)


if __name__ == "__main__":
    main()
