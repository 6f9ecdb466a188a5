"""Stage attribution for the adaptive-FMM eval on the real chip
(dev tool): times the full eval, then re-times it with each
interaction-list table stubbed empty (U / V / W / X), all via DATA
edits only — the traced program skips empty tables, so each variant
isolates one stage's cost without code changes.

Usage: python scripts/adaptive_stages.py [n] [pallas_ulist 0|1]
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
    from sctl_tpu.ops import Laplace3D_FxU

    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 2_000_000
    use_pallas = bool(int(sys.argv[2])) if len(sys.argv) > 2 else False
    rng = np.random.default_rng(7)
    th = rng.uniform(0, 2 * np.pi, n)
    ph = rng.uniform(0, 2 * np.pi, n)
    R, r = 2.0, 0.5
    x = np.stack([(R + r * np.cos(ph)) * np.cos(th),
                  (R + r * np.cos(ph)) * np.sin(th),
                  r * np.sin(ph)], 1)
    x += rng.normal(scale=1e-3, size=x.shape)
    f = rng.normal(size=(n, 1))

    t0 = time.perf_counter()
    fm = AdaptiveFMM(Laplace3D_FxU, p=6, max_pts=256,
                     use_pallas_ulist=use_pallas).setup(x, x)
    print(f"setup {time.perf_counter() - t0:.1f}s "
          f"leaves {len(fm.tree.leaf_keys)} depth {fm.L} "
          f"pallas_ulist {use_pallas}", flush=True)

    params = fm.eval_params()
    fj = jnp.asarray(f, fm.dtype)

    def timed(tag, params):
        @jax.jit
        def fused(fj, params):
            u = fm.eval_jnp(fj, params)
            return jnp.sum(u)
        t0 = time.perf_counter()
        float(fused(fj, params))
        t_compile = time.perf_counter() - t0
        ts = []
        for rep in range(3):
            fj2 = jnp.asarray(f * (1.0 + 1e-6 * (rep + 1)), fm.dtype)
            float(jnp.sum(fj2))
            t0 = time.perf_counter()
            float(fused(fj2, params))
            ts.append(time.perf_counter() - t0)
        dt = sorted(ts)[1]
        print(f"{tag:12s} {dt:8.3f}s  (compile {t_compile:.0f}s)",
              flush=True)
        return dt

    t_full = timed("full", params)

    import copy
    d = params["data"]

    def variant(**edits):
        d2 = dict(d)
        d2.update(edits)
        return {"data": d2, "io": params["io"]}

    n_leaf = d["ulist"].shape[0]
    try:
        no_u = variant(ulist=jnp.full((n_leaf, 0), -1, jnp.int32))
        t_nou = timed("no-U", no_u)
    except Exception as e:
        print("no-U failed:", repr(e)[:200], flush=True)
        t_nou = None

    # Pcap=0 -> the level loop's `if tpad.shape[1] == 0: continue`
    # skips the whole V scan; m2l_c stays untouched (unread)
    empty_v = tuple((tp[:, :0], sp[:, :0])
                    for tp, sp in d["vtab"])
    try:
        t_nov = timed("no-V", variant(vtab=empty_v))
    except Exception as e:
        print("no-V failed:", repr(e)[:200], flush=True)
        t_nov = None

    no_w = variant(wlist_t=tuple(None for _ in d["wlist_t"]))
    try:
        t_now = timed("no-W", no_w)
    except Exception as e:
        print("no-W failed:", repr(e)[:200], flush=True)
        t_now = None

    no_x = variant(xlist_t=tuple(None for _ in d["xlist_t"]))
    try:
        t_nox = timed("no-X", no_x)
    except Exception as e:
        print("no-X failed:", repr(e)[:200], flush=True)
        t_nox = None

    print("--- attribution (full - variant) ---", flush=True)
    for tag, t in (("U", t_nou), ("V", t_nov), ("W", t_now),
                   ("X", t_nox)):
        if t is not None:
            print(f"{tag}: {t_full - t:8.3f}s", flush=True)


if __name__ == "__main__":
    main()
