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
