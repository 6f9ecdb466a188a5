"""Pallas P2P kernel vs XLA direct oracle (interpret mode on CPU;
reference anchor: vec-test-style fast-vs-reference consistency +
ParticleFMM::test Eval-vs-EvalDirect, fmm-wrapper.txx:81)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sctl_tpu.ops import KERNELS, direct_eval
from sctl_tpu.ops.pallas_p2p import p2p

RNG = np.random.default_rng(7)


@pytest.mark.parametrize("name", list(KERNELS))
def test_pallas_matches_direct(name):
    ker = KERNELS[name]
    nt, ns = 200, 300   # exercises padding (not tile-aligned)
    xt = jnp.asarray(RNG.normal(size=(nt, 3)))
    xs = jnp.asarray(RNG.normal(size=(ns, 3)) + 4.0)
    nrm = RNG.normal(size=(ns, 3))
    nrm = jnp.asarray(nrm / np.linalg.norm(nrm, axis=1, keepdims=True))
    f = jnp.asarray(RNG.normal(size=(ns, ker.kdim0)))
    u_ref = np.asarray(direct_eval(ker, xt, xs, f, ns=nrm))
    u_pl = np.asarray(p2p(ker, xt, xs, f, ns=nrm, block_t=128,
                          block_s=128, interpret=True))
    scale = np.abs(u_ref).max() + 1e-30
    np.testing.assert_allclose(u_pl / scale, u_ref / scale, atol=2e-5)


def test_p2p_ulist_all_kernels_vs_direct():
    """Per-box U-list kernel (lane-oriented tiles) against the dense
    direct sum, every kernel in the library (interpret mode)."""
    import jax.numpy as jnp
    from sctl_tpu.ops.pallas_p2p import p2p_ulist
    from sctl_tpu.ops.kernels import KERNELS
    from sctl_tpu.ops.kernels_np import full_matrix_np

    rng = np.random.default_rng(4)
    G, T, S = 2, 8, 128
    xt = rng.random((G, T, 3))
    xs = rng.random((G, S, 3))
    ns = rng.normal(size=(G, S, 3))
    ns /= np.linalg.norm(ns, axis=-1, keepdims=True)
    for name, ker in KERNELS.items():
        f = rng.normal(size=(G, S, ker.kdim0))
        # zero some tail densities (padding behavior)
        f[:, S - 5:] = 0.0
        u = np.asarray(p2p_ulist(
            ker,
            jnp.asarray(xt.transpose(0, 2, 1), jnp.float32),
            jnp.asarray(xs.transpose(0, 2, 1), jnp.float32),
            jnp.asarray(ns.transpose(0, 2, 1), jnp.float32),
            jnp.asarray(f.transpose(0, 2, 1), jnp.float32),
            interpret=True))
        for g in range(G):
            M = full_matrix_np(ker, xt[g], xs[g], ns[g])  # (S*k0, T*k1)
            u_ref = (M.T @ f[g].ravel()).reshape(T, ker.kdim1) \
                / ker.scale_factor
            scale = np.abs(u_ref).max()
            assert np.abs(u[g] - u_ref).max() < 2e-4 * scale, name
