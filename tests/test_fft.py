"""FFT facade tests (reference anchor: src/test-fft.cpp — R2C/C2C/C2R
round trips, multi-dim, batched)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sctl_tpu.linalg import FFT
from sctl_tpu.linalg.fft import FFTType, dft_matrix

RNG = np.random.default_rng(0)


@pytest.mark.parametrize("dims", [(16,), (8, 12), (4, 6, 8)])
@pytest.mark.parametrize("howmany", [1, 3])
def test_r2c_c2r_roundtrip(dims, howmany):
    plan_f = FFT().setup(FFTType.R2C, howmany, dims)
    plan_b = FFT().setup(FFTType.C2R, howmany, dims)
    x = jnp.asarray(RNG.normal(size=plan_f.in_size()))
    y = plan_f.execute(x)
    assert y.shape[0] == plan_f.out_size()
    x2 = plan_b.execute(y)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-12)


@pytest.mark.parametrize("dims", [(16,), (8, 12)])
def test_c2c_roundtrip(dims):
    plan_f = FFT().setup(FFTType.C2C, 2, dims)
    plan_b = FFT().setup(FFTType.C2C_INV, 2, dims)
    x = jnp.asarray(RNG.normal(size=plan_f.in_size()))
    y = plan_f.execute(x)
    x2 = plan_b.execute(y)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-12)


def test_c2c_matches_numpy():
    n = 32
    plan = FFT().setup(FFTType.C2C, 1, (n,))
    xr = RNG.normal(size=n)
    xi = RNG.normal(size=n)
    flat = np.stack([xr, xi], axis=1).reshape(-1)
    y = np.asarray(plan.execute(jnp.asarray(flat))).reshape(n, 2)
    ref = np.fft.fft(xr + 1j * xi)
    np.testing.assert_allclose(y[:, 0] + 1j * y[:, 1], ref, atol=1e-11)


def test_dft_matrix():
    n = 12
    F = np.asarray(dft_matrix(n))
    Fi = np.asarray(dft_matrix(n, inverse=True))
    np.testing.assert_allclose(Fi @ F, np.eye(n), atol=1e-12)
    x = RNG.normal(size=n)
    np.testing.assert_allclose(F @ x, np.fft.fft(x), atol=1e-12)


def test_fft_dd_roundtrip():
    """QuadReal-path FFT (reference: test-fft.cpp with SCTL_QUAD_T):
    roundtrip accuracy far beyond float64."""
    from sctl_tpu.linalg.fft import fft_dd
    from sctl_tpu import quadmath as qm
    n = 16
    re = RNG.normal(size=n)
    im = RNG.normal(size=n)
    fr, fi = fft_dd(re, im)
    # matches float64 FFT at f64 level
    ref = np.fft.fft(re + 1j * im)
    np.testing.assert_allclose(fr.to_float64(), ref.real, atol=1e-12)
    np.testing.assert_allclose(fi.to_float64(), ref.imag, atol=1e-12)
    # roundtrip at DD accuracy (beyond f64 eps)
    br, bi = fft_dd(fr, fi, inverse=True)
    err_r = np.abs((br - qm.DD(re)).to_float64()).max()
    err_i = np.abs((bi - qm.DD(im)).to_float64()).max()
    assert err_r < 1e-28 and err_i < 1e-28, (err_r, err_i)
