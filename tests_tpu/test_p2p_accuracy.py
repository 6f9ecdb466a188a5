"""Hardware accuracy check of the Pallas P2P path (ADVICE r3 #2).

The CI suite runs every Pallas kernel with interpret=True (XLA's
precise rsqrt); this test runs the REAL Mosaic lowering and backs the
ops/pallas_p2p._rinv_t docstring claims:

  (a) with the Newton step OFF (the default), the hardware kernel
      matches a dense f64 oracle at the f32 accumulation floor;
  (b) one Newton refinement step changes nothing (lax.rsqrt lowers to
      a full-f32 VPU op), so dropping it is safe.

Reference anchor: approx_rsqrt<digits> Newton refinement,
vec.txx:357-370; Eval-vs-reference consistency, fmm-wrapper.txx:81.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import tpu_only


@tpu_only()
@pytest.mark.parametrize("name", ["Laplace3D-FxU", "Stokes3D-FxU"])
def test_p2p_hw_matches_f64_oracle_newton_off(name):
    from sctl_tpu.config import config
    from sctl_tpu.ops.kernels import KERNELS
    from sctl_tpu.ops.kernels_np import full_matrix_np
    from sctl_tpu.ops.pallas_p2p import p2p

    assert not config.p2p_newton  # the shipping default
    ker = KERNELS[name]
    rng = np.random.default_rng(11)
    nt, ns = 512, 512
    xt = rng.random((nt, 3))
    xs = rng.random((ns, 3)) + np.array([1.5, 0.0, 0.0])
    f = rng.normal(size=(ns, ker.kdim0))
    u64 = (full_matrix_np(ker, xt, xs).T @ f.ravel()).reshape(nt, -1)
    u_hw = np.asarray(p2p(
        ker, jnp.asarray(xt, jnp.float32), jnp.asarray(xs, jnp.float32),
        jnp.asarray(f, jnp.float32), interpret=False))
    rel = np.abs(u_hw - u64).max() / np.abs(u64).max()
    # f32 floor: ~sqrt(ns)*eps accumulation + ~1 ulp rsqrt
    assert rel < 5e-6, rel


@tpu_only()
def test_p2p_hw_newton_step_buys_nothing():
    """The Newton refinement does not improve hardware accuracy: both
    variants sit at the same f32 floor vs an f64 oracle (each f32 op
    rounds, so outputs differ by a few ulps — bit-identity is not the
    claim; equal accuracy is).  Backs config.p2p_newton default False.
    The flag is trace-time, so caches are cleared between variants."""
    from sctl_tpu.config import config
    from sctl_tpu.ops.kernels import KERNELS
    from sctl_tpu.ops.kernels_np import full_matrix_np
    from sctl_tpu.ops.pallas_p2p import p2p

    ker = KERNELS["Laplace3D-FxU"]
    rng = np.random.default_rng(12)
    xt = rng.random((256, 3))
    xs = rng.random((256, 3)) + np.array([2.0, 0.0, 0.0])
    f = rng.normal(size=(256, 1))
    u64 = (full_matrix_np(ker, xt, xs).T @ f.ravel()).reshape(256, 1)
    scale = np.abs(u64).max()
    rel = {}
    for newton in (False, True):
        jax.clear_caches()
        config.p2p_newton = newton
        try:
            u_hw = np.asarray(p2p(
                ker, jnp.asarray(xt, jnp.float32),
                jnp.asarray(xs, jnp.float32),
                jnp.asarray(f, jnp.float32), interpret=False))
        finally:
            config.p2p_newton = False
        rel[newton] = np.abs(u_hw - u64).max() / scale
    jax.clear_caches()
    assert rel[False] < 5e-6, rel          # Newton-off at the floor
    assert rel[False] < 4.0 * rel[True] + 1e-9, rel  # no accuracy buy
