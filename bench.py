"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline (BASELINE.json): Laplace KIFMM throughput at 1e7 uniform
points, points/sec/chip, device-resident evaluation (density on device,
potential on device — the steady state of a GMRES/BIE outer loop).

vs_baseline: ratio to 1e7 pts/s — an estimate of a 64-core x86 node
running a PVFMM-class CPU FMM at the same size/accuracy (the reference
publishes no numbers of its own, BASELINE.md; north star is >=5x).

Timing rules for this environment (see .claude/skills/verify/SKILL.md):
fresh input values per call (the runtime result-caches identical
dispatches) and scalar-readback fencing (block_until_ready returns
before remote execution completes).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_fmm(n: int = 10_000_000, iters: int = 3) -> float:
    from sctl_tpu.fmm import KIFMM
    from sctl_tpu.ops import Laplace3D_FxU

    rng = np.random.default_rng(0)
    xs = rng.random((n, 3))
    f = rng.normal(size=(n, 1))
    kifmm = KIFMM(Laplace3D_FxU, p=6, depth=6).setup(xs, xs)
    fp, fp_ovf = kifmm._pad_density(f)
    jit = jax.jit(kifmm._eval_impl)

    def run(a, b):
        up, uo = jit(a, b, kifmm._data)
        return float(jnp.sum(up)) + float(jnp.sum(uo))

    run(fp, fp_ovf)                                  # compile + warm
    times = []
    for rep in range(iters):
        fp2 = fp * (1.0 + 1e-6 * (rep + 1))          # fresh values
        float(jnp.sum(fp2))                          # materialize
        t0 = time.perf_counter()
        run(fp2, fp_ovf)                             # fenced readback
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    return n / dt


def main():
    pts_per_s = bench_fmm()
    baseline_pts_per_s = 1e7      # est. 64-core x86 node (see docstring)
    print(json.dumps({
        "metric": "laplace_kifmm_points_per_sec_per_chip_1e7",
        "value": round(pts_per_s / 1e6, 2),
        "unit": "Mpts/s",
        "vs_baseline": round(pts_per_s / baseline_pts_per_s, 3),
    }))


if __name__ == "__main__":
    main()
