"""Dev tool: measure (a) full-eval with/without the Pallas S2M/L2T
routing, (b) the dense ceiling of the lane-oriented P2P tile function
in the exact stencil shape ((cap_t, 9*(3*cap_s+64)) tiles, z fori_loop,
no slicing/masking) — the attainable rate for p2p_stencil's compute.

Usage: python scripts/p2p_ceiling.py [n] [depth]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fence(x):
    return float(jnp.sum(x))


def timeit(fn, *args, iters=3):
    fn(*args)
    ts = []
    for i in range(iters):
        a2 = [a * (1.0 + 1e-6 * (i + 1)) if isinstance(a, jnp.ndarray)
              else a for a in args]
        for a in a2:
            if isinstance(a, jnp.ndarray):
                fence(a)
        t0 = time.perf_counter()
        fn(*a2)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def dense_ceiling(nside=64, cap_t=48, S9=2304):
    """Grid (n, n), z-loop of n, dense (cap_t, S9) Laplace FxU tile
    straight from VMEM blocks — no dynamic slices, no concat, no
    masks.  Upper bound for the current stencil structure."""
    from sctl_tpu.ops.pallas_p2p import _ltile_lap_fxu

    n = nside

    def body(xt_ref, xs_ref, f_ref, out_ref):
        def step(z, _):
            out_ref[0, 0, z] = _ltile_lap_fxu(
                xt_ref[0, 0, z], xs_ref[0, 0], jnp.zeros(()),
                f_ref[0, 0])
            return 0
        lax.fori_loop(0, n, step, 0)

    rng = np.random.default_rng(0)
    xt = jnp.asarray(rng.random((n, n, n, 3, cap_t)), jnp.float32)
    xs = jnp.asarray(rng.random((n, n, 3, S9)), jnp.float32)
    f = jnp.asarray(rng.random((n, n, 1, S9)), jnp.float32)

    fn = pl.pallas_call(
        body,
        grid=(n, n),
        in_specs=[
            pl.BlockSpec((1, 1, n, 3, cap_t), lambda x, y: (x, y, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, S9), lambda x, y: (x, y, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, S9), lambda x, y: (x, y, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n, cap_t, 1),
                               lambda x, y: (x, y, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n, n, cap_t, 1),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(n) ** 3 * cap_t * S9 * 8,
            bytes_accessed=(xt.size + xs.size + f.size) * 4,
            transcendentals=int(n) ** 3 * cap_t * S9),
    )

    g = jax.jit(lambda a, b, c: jnp.sum(fn(a, b, c)))
    t = timeit(lambda a: fence(g(a, xs, f)), xt)
    slots = n ** 3 * cap_t * S9
    print(f"dense ceiling: {t*1e3:.1f} ms  "
          f"{slots/t/1e9:.0f} Gslots/s  (stencil does {slots/1e9:.1f} "
          f"Gslots)")
    return t


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    from sctl_tpu.config import enable_compile_cache
    enable_compile_cache()

    dense_ceiling()

    from sctl_tpu.fmm import KIFMM
    from sctl_tpu.ops import Laplace3D_FxU

    rng = np.random.default_rng(0)
    xs = rng.random((n, 3))
    f = rng.normal(size=(n, 1))
    kif = KIFMM(Laplace3D_FxU, p=6, depth=depth).setup(xs, xs)
    fp, fp_ovf = kif._pad_density(f)
    data = kif._data

    for sl in (True, False):
        kif.use_pallas_sl = sl
        ev = jax.jit(lambda a, b, d: sum(
            jnp.sum(x) for x in kif._eval_impl(a, b, d)))
        t = timeit(lambda a, b: fence(ev(a, b, data)), fp, fp_ovf)
        print(f"FULL eval (pallas_sl={sl}): {t*1e3:.1f} ms -> "
              f"{n/t/1e6:.1f} Mpts/s")


if __name__ == "__main__":
    main()
