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


def make_lite(ker, p, rcond):
    """Convert a full v4hp table file into the committable lite
    artifact (see KIFMMOperators._load_cache_lite): keep the
    longdouble-derived small matrices exactly, quantize the ld
    refinement of ca_unit to per-offset-scaled f16, drop everything
    f64-rebuildable."""
    import numpy as np
    from sctl_tpu.fmm.kifmm import (_kmat, _op_cache_path,
                                    _vlist_offsets, cube_surface,
                                    KIFMMOperators, RAD_IN)

    path = _op_cache_path(ker, p, rcond, hiprec=True)
    lp = path[:-4] + "_lite.npz"
    z = np.load(path)
    s_in = cube_surface(p) * (RAD_IN / 2)
    offsets, _ = _vlist_offsets()
    M = np.stack([z["dc2e_unit"] @ _kmat(ker, s_in, s_in + d * 1.0)
                  for d in offsets])
    C = np.einsum("nm,omk->onk", z["cb_unit"].T, M, optimize=True)
    ca64 = np.einsum("ork,kn->orn", C, z["vb_unit"], optimize=True)
    delta = z["ca_unit"] - ca64
    scale = np.maximum(np.abs(delta).max(axis=(1, 2)), 1e-300)
    rel = float(np.abs(delta).max()
                / max(np.abs(z["ca_unit"]).max(), 1e-300))
    out = {n: z[n] for n in KIFMMOperators._LITE_NAMES}
    # int8 1/127-resolution quantization: error 0.8% of the per-offset
    # max delta, i.e. ~1e-11 of ca at the measured delta scales —
    # orders under the ~7e-9 hiprec rung plateau, at half f16's bytes
    out["ca_delta"] = np.int8(np.round(
        delta / scale[:, None, None] * 127.0))
    out["ca_scale"] = scale
    np.savez(lp, **out)
    print(f"p={p}: lite -> {lp} "
          f"({os.path.getsize(lp) / 1e6:.0f} MB, "
          f"max|delta|/max|ca| = {rel:.2e})", flush=True)


def main():
    import jax.numpy as jnp
    from sctl_tpu.fmm.kifmm import KIFMMOperators, _op_cache_path
    from sctl_tpu.ops.kernels import Laplace3D_FxU

    ps = [int(a) for a in sys.argv[1:]] or [10, 12]
    for p in ps:
        path = _op_cache_path(Laplace3D_FxU, p, 1e-10, hiprec=True)
        if os.path.exists(path):
            print(f"p={p}: cache exists: {path}")
        else:
            t0 = time.time()
            KIFMMOperators(Laplace3D_FxU, Laplace3D_FxU, Laplace3D_FxU,
                           p=p, depth=2, scale=1.0, dtype=jnp.float64,
                           rcond=1e-10, hiprec=True)
            print(f"p={p}: built in {time.time() - t0:.0f}s -> {path}",
                  flush=True)
        if not os.path.exists(path[:-4] + "_lite.npz"):
            make_lite(Laplace3D_FxU, p, 1e-10)


if __name__ == "__main__":
    main()
