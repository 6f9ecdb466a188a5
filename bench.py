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

    @jax.jit
    def fused(a, b, data):
        up, uo = kifmm._eval_impl(a, b, data)
        return jnp.sum(up) + jnp.sum(uo)     # ONE scalar readback
                                             # (remote dispatch floor)

    def run(a, b):
        return float(fused(a, b, kifmm._data))

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


def bench_bie(iters: int = 3) -> dict:
    """Headline metric 2 (BASELINE.md): Stokes BIE GMRES wall-clock —
    interior Dirichlet on a torus via the double-layer ansatz, solved
    with the fully device-resident GMRES (gmres_device) over the traced
    operator (compute_potential_jnp).  Solves to the f32 floor (tol
    1e-6 relative residual; the 1e-10 anchor needs the f64 CPU path —
    see BASELINE.md accuracy ladder).  vs_baseline = wall-clock ratio
    against the host-loop GMRES over the same jitted operator (the
    device-residency win; setup/precompute excluded from both)."""
    from sctl_tpu.bie import BoundaryIntegralOp, torus_patches
    from sctl_tpu.ops import Stokes3D_DxU, Stokes3D_FxU, \
        direct_eval_blocked
    from sctl_tpu.linalg import gmres, gmres_device

    lst = torus_patches(nu=8, nv=4, q=6, R=2.0, r=0.5)
    op = BoundaryIntegralOp(Stokes3D_DxU)
    op.set_accuracy(1e-7)
    op.add_elem_list(lst)
    op.setup()
    X, _, _ = lst.get_node_coord()
    src = np.array([[6.0, 0.0, 0.0]])
    q = np.array([[1.0, -0.5, 0.8]])
    bc = np.asarray(direct_eval_blocked(
        Stokes3D_FxU, jnp.asarray(X), jnp.asarray(src),
        jnp.asarray(q))).reshape(-1)

    def A(sig):
        return op.compute_potential_jnp(sig).reshape(-1) - 0.5 * sig

    tol = 1e-6
    solve = jax.jit(lambda b: gmres_device(A, b, tol=tol, max_iter=60))
    x, it, err = solve(jnp.asarray(bc))
    float(jnp.sum(x))                                # compile + warm
    times = []
    for rep in range(iters):
        b2 = jnp.asarray(bc) * (1.0 + 1e-6 * (rep + 1))
        float(jnp.sum(b2))
        t0 = time.perf_counter()
        x2, it2, err2 = solve(b2)
        float(jnp.sum(x2)) + float(err2)             # fenced readback
        times.append(time.perf_counter() - t0)
    dt_dev = sorted(times)[len(times) // 2]

    t0 = time.perf_counter()
    x_h, it_h = gmres(A, jnp.asarray(bc) * (1 + 5e-7), tol=tol,
                      max_iter=60)
    float(jnp.sum(x_h))
    dt_host = time.perf_counter() - t0

    rel_res = float(err) / float(jnp.linalg.norm(jnp.asarray(bc)))
    return {
        "metric": "stokes_bie_gmres_wallclock_torus",
        "value": round(dt_dev, 4),
        "unit": "s",
        "vs_baseline": round(dt_host / dt_dev, 3),
        "n_unknowns": int(bc.size),
        "iterations": int(it),
        "rel_residual": float(f"{rel_res:.3e}"),
        "note": "f32 chip pipeline; 1e-10 anchor on f64 CPU path",
    }


def main():
    # persistent executable cache: the depth-6 KIFMM program compiles
    # ~100 s cold; cached runs skip it (harmless no-op if the backend
    # does not support serialization)
    from sctl_tpu.config import enable_compile_cache
    enable_compile_cache()
    try:
        print(json.dumps(bench_bie()))
    except Exception as e:                            # never mask line 1
        print(json.dumps({"metric": "stokes_bie_gmres_wallclock_torus",
                          "error": repr(e)[:200]}))
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
