"""Build and disk-cache the hiprec KIFMM operator tables for the
accuracy-ladder rungs (tests/test_accuracy_ladder.py p=10/12): one-time
offline precompute, the reference's cached-tables discipline
(common.hpp:9-11 SCTL_DATA_PATH; sph_harm.hpp:207-258 MatrixStorage).

Usage: python scripts/build_hiprec_tables.py [p ...]   (default: 10 12)
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp
    from sctl_tpu.fmm.kifmm import KIFMMOperators, _op_cache_path
    from sctl_tpu.ops.kernels import Laplace3D_FxU

    ps = [int(a) for a in sys.argv[1:]] or [10, 12]
    for p in ps:
        path = _op_cache_path(Laplace3D_FxU, p, 1e-10, hiprec=True)
        if os.path.exists(path):
            print(f"p={p}: cache exists: {path}")
            continue
        t0 = time.time()
        KIFMMOperators(Laplace3D_FxU, Laplace3D_FxU, Laplace3D_FxU,
                       p=p, depth=2, scale=1.0, dtype=jnp.float64,
                       rcond=1e-10, hiprec=True)
        print(f"p={p}: built in {time.time() - t0:.0f}s -> {path}",
              flush=True)


if __name__ == "__main__":
    main()
