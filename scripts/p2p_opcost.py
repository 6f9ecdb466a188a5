"""Dev microbench: where does the P2P stencil tile's time go?

Runs the dense (cap_t, S9) z-loop tile (the exact p2p_stencil compute
shape) with pieces of the Laplace FxU tile function knocked out, to
attribute cost to r^2 diffs / rsqrt / masking selects / the weighted
lane reduction.  Usage: python scripts/p2p_opcost.py
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
        t0 = time.perf_counter()
        fn(*args)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def make(variant, nside=64, cap_t=48, S9=2304):
    n = nside

    def tile(xt_l, xs_l, f_l):
        if variant == "reduce_only":
            return jnp.sum(f_l[0][None, :] * xt_l[0][:, None],
                           axis=1, keepdims=True)
        acc = None
        for d in range(3):
            dx = xt_l[d][:, None] - xs_l[d][None, :]
            acc = dx * dx if acc is None else acc + dx * dx
        r2 = acc
        if variant == "no_rsqrt":
            x = r2
        elif variant == "rsqrt_nomask":
            x = lax.rsqrt(r2)
        elif variant == "rsqrt_max":
            x = lax.rsqrt(jnp.maximum(r2, 1e-30))
            x = jnp.where(r2 > 0, x, 0.0)
        elif variant == "recip_approx":
            x = pl.reciprocal(r2, approx=True)
        elif variant == "full":
            r2s = jnp.where(r2 > 0, r2, 1.0)
            x = lax.rsqrt(r2s)
            x = jnp.where(r2 > 0, x, 0.0)
        elif variant == "newton":
            r2s = jnp.where(r2 > 0, r2, 1.0)
            x = lax.rsqrt(r2s)
            x = x * (1.5 - 0.5 * r2s * x * x)
            x = jnp.where(r2 > 0, x, 0.0)
        else:
            raise ValueError(variant)
        return jnp.sum(x * f_l[0][None, :], axis=1, keepdims=True)

    def body(xt_ref, xs_ref, f_ref, out_ref):
        def step(z, _):
            out_ref[0, 0, z] = tile(xt_ref[0, 0, z], xs_ref[0, 0],
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
            pl.BlockSpec((1, 1, n, 3, cap_t),
                         lambda x, y: (x, y, 0, 0, 0),
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
    slots = n ** 3 * cap_t * S9
    t = timeit(lambda: fence(g(xt, xs, f)))
    print(f"{variant:14s}: {t*1e3:7.1f} ms  {slots/t/1e9:6.0f} Gslots/s",
          flush=True)


if __name__ == "__main__":
    from sctl_tpu.config import enable_compile_cache
    enable_compile_cache()
    for v in ("full", "newton", "rsqrt_nomask", "rsqrt_max", "no_rsqrt",
              "recip_approx", "reduce_only"):
        make(v)
