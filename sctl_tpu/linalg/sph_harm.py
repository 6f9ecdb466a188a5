"""Spherical harmonic transforms.

TPU-native equivalent of the reference's scalar SH machinery (reference:
include/sctl/sph_harm.hpp:21-150, sph_harm.txx:300-312 — Grid2SHC /
SHC2Grid as per-order Legendre-matrix products + FFT in longitude,
pointwise SHCEval, gradient synthesis; precomputed-matrix cache
`MatrixStorage` up to SCTL_SHMAXDEG, sph_harm.hpp:207-258).  The
Stokes-on-sphere layer potentials (StokesEvalSL/DL/KSelf) build on these
and are staged for a later round.

Representation:
  grid   : (Nt, Np) samples, theta = Gauss-Legendre colatitude nodes
           (Nt >= p+1), phi = Np >= 2p+1 uniform longitudes.
  shc    : packed real coefficients, length (p+1)^2:
           for l = 0..p: [c_{l,0}, c_{l,1}, s_{l,1}, ..., c_{l,l},
           s_{l,l}] with fully (4pi)-normalized real basis
           Y_{l,0} = N_l0 P_l0(cos t)
           Y_{l,m}^c = N_lm P_lm(cos t) cos(m phi)
           Y_{l,m}^s = N_lm P_lm(cos t) sin(m phi).

The analysis is FFT over phi (XLA FFT) followed by one batched
Legendre GEMM per order m (MXU); synthesis is the transpose.  Legendre
matrices are host-precomputed and cached per (p, Nt), mirroring the
reference's MatrixStore.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .quadrule import leg_quad_rule


def sh_dim(p: int) -> int:
    return (p + 1) ** 2


@functools.lru_cache(maxsize=None)
def _legendre_tables(p: int, nt: int):
    """Normalized associated Legendre values at GL nodes.

    Returns (P (p+1, p+1, nt), dPdt (p+1, p+1, nt), theta (nt,),
    wts (nt,)): P[m, l] is N_lm P_l^m(cos theta) (zero for l < m);
    dPdt its theta-derivative.  Stable (l,m) three-term recurrence on
    the fully normalized functions.
    """
    x01, w01 = leg_quad_rule(nt)
    ct = 1 - 2 * x01              # cos(theta) in (-1, 1), descending
    theta = np.arccos(ct)
    st = np.sqrt(1 - ct * ct)
    w = 2 * w01                   # d(cos t) weight on [-1,1]

    P = np.zeros((p + 1, p + 1, nt))
    # diagonal: normalized P_mm
    P[0, 0] = 1.0 / np.sqrt(4 * np.pi)
    for m in range(1, p + 1):
        P[m, m] = -np.sqrt((2 * m + 1) / (2.0 * m)) * st * P[m - 1,
                                                             m - 1]
    # upward in l
    for m in range(p + 1):
        if m + 1 <= p:
            P[m, m + 1] = np.sqrt(2 * m + 3.0) * ct * P[m, m]
        for l in range(m + 2, p + 1):
            a = np.sqrt((4.0 * l * l - 1) / (l * l - m * m))
            b = np.sqrt(((l - 1.0) ** 2 - m * m) / (4.0 * (l - 1.0) ** 2
                                                    - 1))
            P[m, l] = a * (ct * P[m, l - 1] - b * P[m, l - 2])
    # theta-derivative via d/dt = -st d/d(ct); use relation
    # dP_lm/dt = (l ct P_lm - (l+m) r_lm P_{l-1,m}) / (-st) with
    # normalization-adjusted ratio; safer: finite relation
    dP = np.zeros_like(P)
    for m in range(p + 1):
        for l in range(m, p + 1):
            if l > m:
                c = np.sqrt(((2.0 * l + 1) * (l * l - m * m))
                            / (2.0 * l - 1))
                dP[m, l] = (l * ct * P[m, l] - c * P[m, l - 1]) / \
                    np.where(st > 1e-14, -st, 1.0)
            else:
                dP[m, l] = (l * ct * P[m, l]) / np.where(
                    st > 1e-14, -st, 1.0)
    return P, dP, theta, w


class SphericalHarmonics:
    """Transform object for degree p on an (nt, np_) grid
    (reference API: SphericalHarmonics::Grid2SHC / SHC2Grid /
    SHCEval / WriteVTK, sph_harm.hpp:21-150)."""

    def __init__(self, p: int, nt: int = None, np_: int = None):
        self.p = p
        self.nt = nt or (p + 1)
        self.np_ = np_ or (2 * p + 2)
        assert self.nt >= p + 1 and self.np_ >= 2 * p + 1
        P, dP, theta, w = _legendre_tables(p, self.nt)
        self._P = jnp.asarray(P)
        self._dP = jnp.asarray(dP)
        self.theta = theta
        self._w = jnp.asarray(w)

    # -- grid <-> coefficients -------------------------------------------
    # Real orthonormal basis: Y_l0 = P[0,l];
    # Y^{c,s}_{lm} = sqrt(2) P[m,l] {cos,sin}(m phi).
    def grid2shc(self, f) -> jnp.ndarray:
        """(.., nt, np_) -> (.., (p+1)^2) analysis
        (reference: Grid2SHC, sph_harm.txx:300): rfft over phi, then a
        weighted Legendre GEMM per order m."""
        p, np_ = self.p, self.np_
        f = jnp.asarray(f)
        fm = jnp.fft.rfft(f, axis=-1) * (2 * np.pi / np_)  # (.., nt, nf)
        sq2 = np.sqrt(2.0)
        cs, ss = [], []
        for m in range(p + 1):
            Pw = self._P[m] * self._w[None, :]       # (p+1, nt)
            re = jnp.einsum("ln,...n->...l", Pw, fm[..., :, m].real)
            im = jnp.einsum("ln,...n->...l", Pw, -fm[..., :, m].imag)
            if m == 0:
                cs.append(re)
                ss.append(jnp.zeros_like(im))
            else:
                cs.append(sq2 * re)
                ss.append(sq2 * im)
        packed = []
        for l in range(p + 1):
            packed.append(cs[0][..., l][..., None])
            for m in range(1, l + 1):
                packed.append(cs[m][..., l][..., None])
                packed.append(ss[m][..., l][..., None])
        return jnp.concatenate(packed, axis=-1)

    def shc2grid(self, shc) -> jnp.ndarray:
        """(.., (p+1)^2) -> (.., nt, np_) synthesis
        (reference: SHC2Grid, sph_harm.txx:300-312)."""
        p, nt, np_ = self.p, self.nt, self.np_
        shc = jnp.asarray(shc)
        c, s = self._unpack(shc)                    # (.., m, l)
        nf = np_ // 2 + 1
        batch = shc.shape[:-1]
        cdtype = jnp.complex128 if shc.dtype == jnp.float64 \
            else jnp.complex64
        fm = jnp.zeros(batch + (nt, nf), dtype=cdtype)
        sq2 = np.sqrt(2.0)
        for m in range(p + 1):
            A = jnp.einsum("ln,...l->...n", self._P[m], c[..., m, :])
            B = jnp.einsum("ln,...l->...n", self._P[m], s[..., m, :])
            if m == 0:
                fm = fm.at[..., :, 0].set((np_ * A).astype(cdtype))
            else:
                fm = fm.at[..., :, m].set(
                    (np_ / 2.0) * sq2 * (A - 1j * B))
        return jnp.fft.irfft(fm, n=np_, axis=-1)

    def _unpack(self, shc):
        """packed -> (c[.., m, l], s[.., m, l]) with zeros for l<m."""
        p = self.p
        batch = shc.shape[:-1]
        c = jnp.zeros(batch + (p + 1, p + 1), dtype=shc.dtype)
        s = jnp.zeros(batch + (p + 1, p + 1), dtype=shc.dtype)
        i = 0
        for l in range(p + 1):
            c = c.at[..., 0, l].set(shc[..., i])
            i += 1
            for m in range(1, l + 1):
                c = c.at[..., m, l].set(shc[..., i])
                s = s.at[..., m, l].set(shc[..., i + 1])
                i += 2
        return c, s

    # -- pointwise evaluation ----------------------------------------------
    def eval(self, shc, theta, phi):
        """Evaluate the SH expansion at arbitrary (theta, phi) points
        (reference: SHCEval)."""
        p = self.p
        theta = np.asarray(theta)
        phi = np.asarray(phi)
        c, s = map(np.asarray, self._unpack(jnp.asarray(shc)))
        P = _legendre_at(p, np.cos(theta))          # (p+1, p+1, M)
        sq2 = np.sqrt(2.0)
        out = 0.0
        for m in range(p + 1):
            gm = np.einsum("lM,l->M", P[m], c[m])
            hm = np.einsum("lM,l->M", P[m], s[m])
            if m == 0:
                out = out + gm
            else:
                out = out + sq2 * (gm * np.cos(m * phi)
                                   + hm * np.sin(m * phi))
        return out


def _legendre_at(p: int, ct: np.ndarray):
    """Normalized P[m, l] at arbitrary cos(theta) values."""
    ct = np.atleast_1d(ct)
    st = np.sqrt(np.maximum(1 - ct * ct, 0.0))
    P = np.zeros((p + 1, p + 1, len(ct)))
    P[0, 0] = 1.0 / np.sqrt(4 * np.pi)
    for m in range(1, p + 1):
        P[m, m] = -np.sqrt((2 * m + 1) / (2.0 * m)) * st * P[m - 1,
                                                             m - 1]
    for m in range(p + 1):
        if m + 1 <= p:
            P[m, m + 1] = np.sqrt(2 * m + 3.0) * ct * P[m, m]
        for l in range(m + 2, p + 1):
            a = np.sqrt((4.0 * l * l - 1) / (l * l - m * m))
            b = np.sqrt(((l - 1.0) ** 2 - m * m)
                        / (4.0 * (l - 1.0) ** 2 - 1))
            P[m, l] = a * (ct * P[m, l - 1] - b * P[m, l - 2])
    return P
