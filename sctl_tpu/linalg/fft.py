"""FFT facade (reference: include/sctl/fft_wrapper.hpp/.txx — FFT<T>
R2C/C2C/C2C_INV/C2R batched multi-dimensional transforms with
Setup(type, howmany, dims)/Execute).

On TPU the FFTW role is played by XLA's native FFT; this facade keeps
the reference's Setup/Execute API shape (plan object with fft_type,
howmany, dims) and its data layout: input is a flat vector of `howmany`
contiguous transforms.  The reference's no-FFTW fallback (separable
DFT-matrix GEMMs, fft_wrapper.txx:70-110) is unnecessary — XLA always
provides FFT — but a dft_matrix helper is exposed because spherical
harmonics uses explicit DFT matrices for odd grid sizes.

Normalization matches FFTW (and the reference): forward unscaled,
inverse scaled by 1/N.  R2C keeps N//2+1 complex outputs.
"""

from __future__ import annotations

import enum
import math
from typing import Sequence

import jax.numpy as jnp
import numpy as np


class FFTType(enum.Enum):
    R2C = "r2c"
    C2C = "c2c"
    C2C_INV = "c2c_inv"
    C2R = "c2r"


class FFT:
    """Plan-style facade: FFT().setup(type, howmany, dims); execute(x)."""

    def __init__(self, dtype=jnp.float64):
        self.dtype = dtype
        self.fft_type = None
        self.howmany = 0
        self.dims: Sequence[int] = ()

    def setup(self, fft_type: FFTType, howmany: int,
              dims: Sequence[int]) -> "FFT":
        self.fft_type = FFTType(fft_type)
        self.howmany = int(howmany)
        self.dims = tuple(int(d) for d in dims)
        return self

    # -- size bookkeeping (reference: FFT::Dim0/Dim1) --------------------
    def _n_real(self) -> int:
        return int(np.prod(self.dims))

    def _n_cplx(self) -> int:
        d = list(self.dims)
        d[-1] = d[-1] // 2 + 1
        return int(np.prod(d))

    def in_size(self) -> int:
        t = self.fft_type
        if t == FFTType.R2C:
            return self.howmany * self._n_real()
        if t == FFTType.C2R:
            return self.howmany * self._n_cplx() * 2
        return self.howmany * self._n_real() * 2

    def out_size(self) -> int:
        t = self.fft_type
        if t == FFTType.R2C:
            return self.howmany * self._n_cplx() * 2
        if t == FFTType.C2R:
            return self.howmany * self._n_real()
        return self.howmany * self._n_real() * 2

    # -- execution -------------------------------------------------------
    def execute(self, x):
        """Transform a flat array of `howmany` contiguous signals.

        Real transforms take/return real flat arrays; complex data is
        interleaved (re, im) pairs, matching the reference's layout of
        Complex<Real> vectors.
        """
        t = self.fft_type
        assert t is not None, "call setup() first"
        x = jnp.asarray(x)
        cdtype = jnp.complex128 if self.dtype == jnp.float64 \
            else jnp.complex64
        if t == FFTType.R2C:
            xr = x.reshape((self.howmany,) + self.dims)
            y = jnp.fft.rfftn(xr.astype(self.dtype),
                              axes=range(1, 1 + len(self.dims)))
            return _c2flat(y)
        if t == FFTType.C2C:
            xc = _flat2c(x, (self.howmany,) + self.dims, cdtype)
            y = jnp.fft.fftn(xc, axes=range(1, 1 + len(self.dims)))
            return _c2flat(y)
        if t == FFTType.C2C_INV:
            xc = _flat2c(x, (self.howmany,) + self.dims, cdtype)
            y = jnp.fft.ifftn(xc, axes=range(1, 1 + len(self.dims)))
            return _c2flat(y)
        if t == FFTType.C2R:
            d = list(self.dims)
            d[-1] = d[-1] // 2 + 1
            xc = _flat2c(x, (self.howmany,) + tuple(d), cdtype)
            y = jnp.fft.irfftn(xc, s=self.dims,
                               axes=range(1, 1 + len(self.dims)))
            return y.reshape(-1).astype(self.dtype)
        raise ValueError(t)


def _flat2c(x, shape, cdtype):
    xr = x.reshape(-1, 2)
    return (xr[:, 0] + 1j * xr[:, 1]).astype(cdtype).reshape(shape)


def _c2flat(y):
    flat = y.reshape(-1)
    return jnp.stack([flat.real, flat.imag], axis=1).reshape(-1)


def fft_dd(re, im, inverse: bool = False):
    """1-D DFT in double-double precision (the reference's QuadReal FFT
    path, src/test-fft.cpp with SCTL_QUAD_T: no FFTW for f128 -> dense
    DFT-matrix transform, fft_wrapper.txx:70-110).

    re/im: DD or float arrays of length n.  Returns (re_out, im_out)
    as DD.  O(n^2) host computation — precompute-grade.
    """
    from .. import quadmath as qm
    re = re if isinstance(re, qm.DD) else qm.DD(np.asarray(re, float))
    im = im if isinstance(im, qm.DD) else qm.DD(np.asarray(im, float))
    n = len(re.hi)
    k = np.arange(n, dtype=np.float64)
    sign = 1.0 if inverse else -1.0
    # angles k*j*2pi/n in DD: build row by row (exact k*j as float64
    # products are exact up to n^2 < 2^53)
    out_re = qm.DD.zeros(n)
    out_im = qm.DD.zeros(n)
    two_pi = qm.dd_2pi()
    inv_n = qm.dd_div(qm.DD(1.0), qm.DD(float(n)))
    for j in range(n):
        ang = qm.dd_mul(qm.dd_mul(two_pi, inv_n),
                        qm.DD(sign * k * j))
        s, c = qm._dd_sincos(ang)
        # out[j] = sum_k (re + i im)(c + i s)
        rr = qm.dd_add(qm.dd_mul(re, c), qm.dd_neg(qm.dd_mul(im, s)))
        ii = qm.dd_add(qm.dd_mul(re, s), qm.dd_mul(im, c))
        out_re[j] = _dd_sum(rr)
        out_im[j] = _dd_sum(ii)
    if inverse:
        out_re = qm.dd_mul(out_re, inv_n)
        out_im = qm.dd_mul(out_im, inv_n)
    return out_re, out_im


def _dd_sum(a):
    """Sum of a DD vector (sequential compensated)."""
    from .. import quadmath as qm
    acc = qm.DD(0.0)
    for i in range(len(a.hi)):
        acc = qm.dd_add(acc, qm.DD(a.hi[i], a.lo[i]))
    return acc


def dft_matrix(n: int, inverse: bool = False, dtype=jnp.complex128):
    """Dense DFT matrix (the reference fallback's building block,
    fft_wrapper.txx:70-110; used by sph_harm for odd grids)."""
    k = np.arange(n)
    sign = 2j if inverse else -2j
    m = np.exp(sign * math.pi * np.outer(k, k) / n)
    if inverse:
        m = m / n
    return jnp.asarray(m, dtype=dtype)
