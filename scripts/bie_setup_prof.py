"""Phase-timing profile of the 1e5-unknown BIE bench setup (dev tool).

Wraps the expensive setup phases of bench.bench_bie's operator with
wall-clock timers to locate the cold-setup cost (ROADMAP #9):
far-node collection, AdaptiveFMM setup, near-list search, near-matrix
assembly (ladder vs Duffy vs fallback).  Also saves the near cache so
subsequent bench runs skip the cold path.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    from sctl_tpu.config import config, enable_compile_cache
    enable_compile_cache()
    from sctl_tpu.bie import BoundaryIntegralOp, torus_patches
    from sctl_tpu.bie import boundary_integral as bi
    from sctl_tpu.ops import Stokes3D_DxU

    nu, nv, q = 48, 20, 6
    lst = torus_patches(nu=nu, nv=nv, q=q, R=2.0, r=0.5)
    op = BoundaryIntegralOp(Stokes3D_DxU)
    op.set_accuracy(1e-6)
    op.add_elem_list(lst)
    op.near_cache = os.path.join(
        config.data_path, f"bie_near_torus{nu}x{nv}q{q}_stokes_v1.npz")

    # phase timers via monkeypatching
    t = {}

    def wrap(obj, name):
        fn = getattr(obj, name)

        def wrapped(*a, **k):
            t0 = time.perf_counter()
            r = fn(*a, **k)
            t[name] = t.get(name, 0.0) + time.perf_counter() - t0
            print(f"  {name}: {t[name]:.1f}s", flush=True)
            return r
        setattr(obj, name, wrapped)

    wrap(op, "_build_near_list")
    wrap(op, "_build_near_matrices")
    wrap(op, "_setup_device_apply")
    wrap(lst, "near_interac_batch")

    t0 = time.perf_counter()
    op.setup()
    print(f"TOTAL setup: {time.perf_counter() - t0:.1f}s", flush=True)
    print(f"near pairs: {len(op.near_pairs)}", flush=True)
    print(f"far nodes: {len(op.Xf)}  fmm: {op._far_fmm is not None}",
          flush=True)


if __name__ == "__main__":
    main()
