"""numpy kernel mirrors vs the jnp kernel library (all 8 kernels)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sctl_tpu.ops import KERNELS
from sctl_tpu.ops.kernels_np import full_matrix_np

RNG = np.random.default_rng(3)


@pytest.mark.parametrize("name", list(KERNELS))
def test_np_matches_jnp(name):
    ker = KERNELS[name]
    xt = RNG.normal(size=(7, 3))
    xs = RNG.normal(size=(11, 3)) + 2.0
    nrm = RNG.normal(size=(11, 3))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    m_np = full_matrix_np(ker, xt, xs, nrm)
    m_jnp = np.asarray(ker.full_matrix(jnp.asarray(xt),
                                       jnp.asarray(xs),
                                       jnp.asarray(nrm)))
    np.testing.assert_allclose(m_np, m_jnp, atol=1e-13)
