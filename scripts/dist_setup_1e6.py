"""Distributed AdaptiveFMMDist setup at >= 1e6 points (VERDICT r4 #4):
one DistPtTree build over the sharded points feeds the host list
derivation (no second tree), and the setup/eval host+device times are
measured on the 8-device virtual CPU mesh.

Usage: python scripts/dist_setup_1e6.py [n]    (default 1e6)
"""

import os
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    import numpy as np
    import json
    from jax.sharding import Mesh
    from sctl_tpu.comm import Comm
    from sctl_tpu.fmm import AdaptiveFMMDist
    from sctl_tpu.ops import Laplace3D_FxU

    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000
    rng = np.random.default_rng(11)
    th = rng.uniform(0, 2 * np.pi, n)
    ph = rng.uniform(0, 2 * np.pi, n)
    R, r = 2.0, 0.5
    x = np.stack([(R + r * np.cos(ph)) * np.cos(th),
                  (R + r * np.cos(ph)) * np.sin(th),
                  r * np.sin(ph)], 1)
    f = rng.normal(size=(n, 1))

    mesh = Mesh(np.array(jax.devices()), ("x",))
    comm = Comm(mesh)
    t0 = time.perf_counter()
    fm = AdaptiveFMMDist(Laplace3D_FxU, comm).setup(x, x)
    t_setup = time.perf_counter() - t0
    t0 = time.perf_counter()
    u = fm.eval(f)
    t_eval = time.perf_counter() - t0

    sub = rng.choice(n, 400, replace=False)
    from sctl_tpu.ops import direct_eval_blocked
    import jax.numpy as jnp
    ud = np.asarray(direct_eval_blocked(
        Laplace3D_FxU, jnp.asarray(x[sub]), jnp.asarray(x),
        jnp.asarray(f)))
    rel = float(np.abs(np.asarray(u)[sub] - ud).max()
                / np.abs(ud).max())
    print(json.dumps({
        "metric": "adaptive_fmm_dist_setup_1e6",
        "n": n, "ndev": 8, "setup_s": round(t_setup, 1),
        "eval_s": round(t_eval, 1),
        "rel_err": float(f"{rel:.2e}"),
        "n_leaf": int(fm.n_leaf)}), flush=True)


if __name__ == "__main__":
    main()
