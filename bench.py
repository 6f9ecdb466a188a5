"""Benchmark driver: prints ONE JSON line with the headline metric.

Current headline (pre-FMM): Laplace3D P2P direct-sum pair throughput on
one chip via the Pallas kernel — the per-chip hot loop underneath FMM
near-field and BIE near interactions (BASELINE.md: the north-star metric
becomes FMM points/sec/chip at 1e7 points once the tree FMM lands; this
bench will switch to it then).

vs_baseline: ratio to 10 Gpairs/s — an estimate of a 64-core x86 node
running the reference's AVX-512 SIMD hot loop (BASELINE.json targets
>=5x per-chip vs that node; the reference publishes no numbers of its
own, BASELINE.md).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_p2p(n: int = 65536, iters: int = 5) -> float:
    from sctl_tpu.ops import Laplace3D_FxU
    from sctl_tpu.ops.pallas_p2p import p2p

    rng = np.random.default_rng(0)
    xt = jnp.asarray(rng.normal(size=(n, 3)), dtype=jnp.float32)
    xs = jnp.asarray(rng.normal(size=(n, 3)) + 3.0, dtype=jnp.float32)
    # fresh densities per call: the runtime result-caches identical
    # (executable, inputs) dispatches, which would fake the timing
    fs = [jnp.asarray(rng.normal(size=(n, 1)), dtype=jnp.float32)
          for _ in range(iters + 1)]

    # sync via scalar readback: on the axon platform block_until_ready
    # returns before remote execution completes; materializing a value
    # is the only reliable fence
    float(jnp.sum(p2p(Laplace3D_FxU, xt, xs, fs[-1])))       # compile
    times = []
    for f in fs[:iters]:
        t0 = time.perf_counter()
        float(jnp.sum(p2p(Laplace3D_FxU, xt, xs, f)))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]            # median
    return n * n / dt


def main():
    pairs_per_s = bench_p2p()
    baseline_pairs_per_s = 10e9   # est. 64-core x86 node (see docstring)
    print(json.dumps({
        "metric": "laplace_p2p_pairs_per_sec_per_chip",
        "value": round(pairs_per_s / 1e9, 3),
        "unit": "Gpairs/s",
        "vs_baseline": round(pairs_per_s / baseline_pairs_per_s, 3),
    }))


if __name__ == "__main__":
    main()
