"""Spherical harmonic transforms — scalar and vector — plus the
Stokes-on-sphere layer potentials.

TPU-native equivalent of the reference's SH machinery (reference:
include/sctl/sph_harm.hpp:21-150, sph_harm.txx:300-312 — Grid2SHC /
SHC2Grid as per-order Legendre-matrix products + FFT in longitude,
pointwise SHCEval, gradient synthesis; precomputed-matrix cache
`MatrixStorage` up to SCTL_SHMAXDEG, sph_harm.hpp:207-258; vector SH
Grid2VecSHC / VecSHC2Grid / VecSHCEval sph_harm.hpp:95-120,
sph_harm.txx:656-911; Stokes sphere layer potentials
StokesEvalSL/DL/KL/KSelf sph_harm.hpp:122-141, sph_harm.txx:913-2000).

Vector-basis conventions (geometric, normalization-independent — the
same families the reference builds at sph_harm.txx:1030-1042):
    V_nm = -(n+1) Y_nm r̂ + r∇Y_nm      (decays as r^{-n-2} exterior)
    W_nm =      n Y_nm r̂ + r∇Y_nm      (grows as r^{n-1} interior)
    X_nm = r̂ × r∇Y_nm                   (toroidal)
built over THIS module's real packed scalar basis (the reference uses a
complex e^{-imφ} pairing; the Stokes spectral coefficients depend only
on (n, family) so they carry over to any fixed real combination).

The Stokes single/double layer diagonalize in (n, family) with
radius-dependent scalars (sph_harm.txx:1050-1090 SL, 1258-1290 DL,
1873-1905 KSelf).  The traction operator at arbitrary targets
(StokesEvalKL) is built TPU-first: forward-mode autodiff (jax.jvp) of
the single-layer velocity plus the spectral pressure — no hand-derived
VSH-derivative tables (the reference's sph_harm.txx:1341-1739).

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


def _sh_disk_cache(name: str, build, min_bytes: int = 1 << 22):
    """MatrixStorage analogue (reference sph_harm.hpp:207-258: high-
    degree SH tables are built once and served from disk, enabling
    SCTL_SHMAXDEG = 1024): np.savez cache under SCTL_DATA_PATH for
    table dicts whose total size exceeds `min_bytes` (small-degree
    tables stay memory-only — the lru_cache already covers them)."""
    import os
    from ..config import config
    path = os.path.join(config.data_path, f"sh_{name}_v1.npz")
    if os.path.exists(path):
        try:
            with np.load(path) as z:
                return {k: z[k] for k in z.files}
        except Exception:
            pass
    out = build()
    if sum(v.nbytes for v in out.values()) >= min_bytes:
        try:
            os.makedirs(config.data_path, exist_ok=True)
            np.savez(path, **out)
        except OSError:
            pass
    return out


@functools.lru_cache(maxsize=None)
def _legendre_tables(p: int, nt: int):
    """Normalized associated Legendre values at GL nodes.

    Returns (P (p+1, p+1, nt), theta (nt,), wts (nt,)): P[m, l] is
    N_lm P_l^m(cos theta) (zero for l < m).  Stable (l,m) three-term
    recurrence on the fully normalized functions.  (Derivative/csc
    tables come from `_legendre_trio`, which is pole-safe.)  Served
    from the disk cache at high degree (the reference's MatrixStorage
    discipline, sph_harm.hpp:13, 207-258).
    """
    if p >= 128:
        d = _sh_disk_cache(f"legendre_p{p}_nt{nt}",
                           lambda: dict(zip(
                               ("P", "theta", "w"),
                               _legendre_tables_build(p, nt))))
        return d["P"], d["theta"], d["w"]
    return _legendre_tables_build(p, nt)


def _legendre_tables_build(p: int, nt: int):
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
    # upward in l, VECTOR over m (O(p) numpy calls, not O(p^2) —
    # the reference reaches SCTL_SHMAXDEG = 1024, sph_harm.hpp:13)
    for l in range(1, p + 1):
        m2 = np.arange(0, l - 1)
        if len(m2):
            a = np.sqrt((4.0 * l * l - 1) / (l * l - m2 * m2))
            b = np.sqrt(((l - 1.0) ** 2 - m2 * m2)
                        / (4.0 * (l - 1.0) ** 2 - 1))
            P[m2, l] = a[:, None] * (ct[None] * P[m2, l - 1]
                                     - b[:, None] * P[m2, l - 2])
        P[l - 1, l] = np.sqrt(2 * l + 1.0) * ct * P[l - 1, l - 1]
    return P, theta, w


class SphericalHarmonics:
    """Transform object for degree p on an (nt, np_) grid
    (reference API: SphericalHarmonics::Grid2SHC / SHC2Grid /
    SHCEval / WriteVTK, sph_harm.hpp:21-150)."""

    def __init__(self, p: int, nt: int = None, np_: int = None):
        self.p = p
        self.nt = nt or (p + 2)
        self.np_ = np_ or (2 * p + 2)
        assert self.nt >= p + 1 and self.np_ >= 2 * p + 1
        P, theta, w = _legendre_tables(p, self.nt)
        self._P = jnp.asarray(P)
        self.theta = theta
        self._w = jnp.asarray(w)
        # static pack/unpack index maps: packed slot k <-> flattened
        # (cos|sin, m, l) slot of the rectangular (2, p+1, p+1) stack.
        # All transforms are single batched einsums over the stacked
        # per-m Legendre blocks + one static gather — trace size O(1)
        # in p (the reference serves p up to SCTL_SHMAXDEG = 1024 via
        # cached matrices, sph_harm.hpp:13, 207-258; a per-m Python
        # loop would emit O(p) HLO ops and cap practical degree).
        li, mi, si = _packed_index(p)
        dim = (p + 1) ** 2
        flat = (si * (p + 1) + mi) * (p + 1) + li
        self._pk_gather = jnp.asarray(flat, jnp.int32)
        inv = np.full(2 * dim, dim, np.int64)      # dim -> zero pad
        inv[flat] = np.arange(dim)
        self._pk_scatter = jnp.asarray(inv, jnp.int32)
        # analysis/synthesis m-scalings of the real packed basis
        csc = np.full(p + 1, np.sqrt(2.0))
        csc[0] = 1.0
        ssc = np.full(p + 1, np.sqrt(2.0))
        ssc[0] = 0.0                               # no sin(0*phi) term
        self._an_c, self._an_s = csc[:, None], ssc[:, None]
        self._sy_c = (csc * self.np_ / 2)[:, None]
        self._sy_c[0, 0] = self.np_
        self._sy_s = (ssc * self.np_ / 2)[:, None]
        self._dPQ = None           # lazy: vector transforms only

    @property
    def _dP(self):
        self._build_dpq()
        return self._dPQ[0]

    @property
    def _Q(self):
        self._build_dpq()
        return self._dPQ[1]

    def _build_dpq(self):
        """Pole-safe derivative + csc tables for the vector
        transforms — built lazily so scalar transforms at high degree
        don't pay the O(p^2) host loops or the device memory."""
        if self._dPQ is not None:
            return
        p = self.p

        def build():
            ct, st = np.cos(self.theta), np.sin(self.theta)
            Pt, dPt, Qt = _legendre_trio(p, ct, st, np)
            dPa = np.zeros((p + 1, p + 1, self.nt))
            Qa = np.zeros((p + 1, p + 1, self.nt))
            for m in range(p + 1):
                for l in range(m, p + 1):
                    dPa[m, l] = dPt[m][l]
                    if m >= 1:
                        Qa[m, l] = Qt[m][l]
            return {"dP": dPa, "Q": Qa}

        d = (_sh_disk_cache(f"dpq_p{p}_nt{self.nt}", build)
             if p >= 128 else build())
        self._dPQ = (jnp.asarray(d["dP"]), jnp.asarray(d["Q"]))

    # -- grid <-> coefficients -------------------------------------------
    # Real orthonormal basis: Y_l0 = P[0,l];
    # Y^{c,s}_{lm} = sqrt(2) P[m,l] {cos,sin}(m phi).
    def grid2shc(self, f) -> jnp.ndarray:
        """(.., nt, np_) -> (.., (p+1)^2) analysis
        (reference: Grid2SHC, sph_harm.txx:300): rfft over phi, then a
        weighted Legendre GEMM per order m."""
        p, np_ = self.p, self.np_
        f = jnp.asarray(f)
        fm = jnp.fft.rfft(f, axis=-1)[..., :p + 1] \
            * (2 * np.pi / np_)                      # (.., nt, p+1)
        Pw = self._P * self._w[None, None, :]        # (m, l, nt)
        c = jnp.einsum("mln,...nm->...ml", Pw, fm.real) \
            * jnp.asarray(self._an_c, f.dtype)
        s = jnp.einsum("mln,...nm->...ml", Pw, -fm.imag) \
            * jnp.asarray(self._an_s, f.dtype)
        return self._pack(c, s)

    def shc2grid(self, shc) -> jnp.ndarray:
        """(.., (p+1)^2) -> (.., nt, np_) synthesis
        (reference: SHC2Grid, sph_harm.txx:300-312)."""
        p, np_ = self.p, self.np_
        shc = jnp.asarray(shc)
        c, s = self._unpack(shc)                    # (.., m, l)
        nf = np_ // 2 + 1
        A = jnp.einsum("mln,...ml->...nm", self._P,
                       c * jnp.asarray(self._sy_c, shc.dtype))
        B = jnp.einsum("mln,...ml->...nm", self._P,
                       s * jnp.asarray(self._sy_s, shc.dtype))
        fm = jnp.pad(A - 1j * B,
                     [(0, 0)] * (A.ndim - 1) + [(0, nf - (p + 1))])
        return jnp.fft.irfft(fm, n=np_, axis=-1)

    def shc2grid_grad(self, shc):
        """(.., (p+1)^2) -> (X, X_theta, X_phi), each (.., nt, np_):
        the synthesis plus its theta- and phi-derivatives on the grid
        (reference: SHC2Grid with the X_theta/X_phi outputs,
        sph_harm.hpp:64-67, SHC2Grid_ sph_harm.txx:2221 — theta via
        the MatLegendreGrad tables, phi as the im-scaled Fourier
        synthesis)."""
        p, np_ = self.p, self.np_
        shc = jnp.asarray(shc)
        c, s = self._unpack(shc)
        nf = np_ // 2 + 1
        cw = c * jnp.asarray(self._sy_c, shc.dtype)
        sw = s * jnp.asarray(self._sy_s, shc.dtype)
        pad = [(0, 0)] * shc.ndim + [(0, nf - (p + 1))]
        A = jnp.einsum("mln,...ml->...nm", self._P, cw)
        B = jnp.einsum("mln,...ml->...nm", self._P, sw)
        At = jnp.einsum("mln,...ml->...nm", self._dP, cw)
        Bt = jnp.einsum("mln,...ml->...nm", self._dP, sw)
        fm = jnp.pad(A - 1j * B, pad)
        fmt = jnp.pad(At - 1j * Bt, pad)
        X = jnp.fft.irfft(fm, n=np_, axis=-1)
        X_theta = jnp.fft.irfft(fmt, n=np_, axis=-1)
        mm = jnp.arange(nf)
        X_phi = jnp.fft.irfft(fm * (1j * mm), n=np_, axis=-1)
        return X, X_theta, X_phi

    def shc2grid_transpose(self, X):
        """Adjoint of shc2grid: grid values -> packed coefficients via
        the TRANSPOSE (not the inverse) of the synthesis operator
        (reference: SHC2GridTranspose, sph_harm.hpp:160 — used where
        the adjoint, not the weighted analysis grid2shc, is required,
        e.g. Galerkin projections).  X (.., nt, np_)."""
        import jax
        X = jnp.asarray(X)
        batch = X.shape[:-2]
        shape = batch + (sh_dim(self.p),)
        t = jax.linear_transpose(self.shc2grid,
                                 jnp.zeros(shape, X.dtype))
        return t(X)[0]

    def shc2pole(self, shc):
        """(.., (p+1)^2) -> (.., 2): values at the north (theta=0) and
        south (theta=pi) poles (reference: SHC2Pole,
        sph_harm.hpp:79, sph_harm.txx:350 — only the m=0 modes are
        nonzero at the poles)."""
        p = self.p
        shc = jnp.asarray(shc)
        P0 = _legendre_at(p, np.array([1.0, -1.0]))[0]  # (p+1, 2)
        idx = np.array([l * l for l in range(p + 1)])   # c_{l,0} slots
        c0 = shc[..., idx]
        return jnp.einsum("...l,lk->...k", c0,
                          jnp.asarray(P0, shc.dtype))

    def write_vtk(self, path: str, coord_shc=None, value_shc=None,
                  p_out: int = None):
        """Write the spherical grid as a quad surface mesh, optionally
        warped by a 3-component coordinate SHC and colored by a value
        SHC (reference: SphericalHarmonics::WriteVTK,
        sph_harm.hpp:81, sph_harm.txx:371-455)."""
        from ..tree.vtu import VTUData
        po = p_out if p_out is not None else self.p
        sh = self if po == self.p else SphericalHarmonics(po)
        nt, np_ = sh.nt, sh.np_
        theta = sh.theta
        phi = 2 * np.pi * np.arange(np_) / np_
        if coord_shc is not None:
            cs = np.asarray(coord_shc).reshape(3, -1)
            if cs.shape[1] != sh_dim(po):      # resample p -> p_out
                cs = np.asarray(
                    sh.grid2shc(self.shc2grid(jnp.asarray(cs))))
            X = np.asarray(sh.shc2grid(jnp.asarray(cs)))  # (3,nt,np_)
        else:
            st, ct = np.sin(theta), np.cos(theta)
            X = np.stack([st[:, None] * np.cos(phi)[None, :],
                          st[:, None] * np.sin(phi)[None, :],
                          ct[:, None] * np.ones((1, np_))])
        pts = X.reshape(3, -1).T                         # (nt*np_, 3)
        # quads between adjacent theta rows, phi wraps around
        i = np.arange(nt - 1)[:, None]
        j = np.arange(np_)[None, :]
        j1 = (j + 1) % np_
        conn = np.stack([i * np_ + j, i * np_ + j1,
                         (i + 1) * np_ + j1, (i + 1) * np_ + j],
                        axis=-1).reshape(-1, 4)
        data = VTUData()
        fields = {}
        if value_shc is not None:
            vs = np.asarray(value_shc)
            vs = vs.reshape(-1, vs.shape[-1])
            if vs.shape[1] != sh_dim(po):
                vs = np.asarray(
                    sh.grid2shc(self.shc2grid(jnp.asarray(vs))))
            V = np.asarray(sh.shc2grid(jnp.asarray(vs)))
            fields["value"] = V.reshape(len(vs), -1).T
        data.add_quads(pts, conn, **fields)
        data.write_vtu(path)
        return data

    def _unpack(self, shc):
        """packed -> (c[.., m, l], s[.., m, l]) with zeros for l<m —
        one static gather (trace size O(1) in p)."""
        p = self.p
        batch = shc.shape[:-1]
        z = jnp.zeros(batch + (1,), dtype=shc.dtype)
        cs = jnp.concatenate([shc, z], axis=-1)[..., self._pk_scatter]
        cs = cs.reshape(batch + (2, p + 1, p + 1))
        return cs[..., 0, :, :], cs[..., 1, :, :]

    def _pack(self, c, s):
        """(c[.., m, l], s[.., m, l]) -> packed (.., (p+1)^2) — one
        static gather."""
        p = self.p
        batch = c.shape[:-2]
        cs = jnp.stack([c, s], axis=-3).reshape(batch + (-1,))
        return cs[..., self._pk_gather]

    # -- vector transforms -------------------------------------------------
    def grid2vecshc(self, F) -> jnp.ndarray:
        """(.., 3, nt, np_) Cartesian vector field -> (.., 3, (p+1)^2)
        packed (V, W, X) coefficients (reference: Grid2VecSHC,
        sph_harm.txx:656-758).

        Algorithm: rotate to spherical components; y = scalar analysis
        of f_r; tangential projections onto Psi = r grad Y and
        Phi = r̂ x Psi via per-order GEMMs with the dP/dtheta and
        m P/sin(theta) tables; then v = (n g - y)/(2n+1),
        w = ((n+1) g + y)/(2n+1) (the reference's phiV/phiW mixing at
        sph_harm.txx:744-746).
        """
        p, np_ = self.p, self.np_
        F = jnp.asarray(F)
        theta = jnp.asarray(self.theta)
        ct, st = jnp.cos(theta), jnp.sin(theta)
        phi = 2 * np.pi * jnp.arange(np_) / np_
        cp, sp = jnp.cos(phi), jnp.sin(phi)
        fx, fy, fz = F[..., 0, :, :], F[..., 1, :, :], F[..., 2, :, :]
        ctg, stg = ct[:, None], st[:, None]
        cpg, spg = cp[None, :], sp[None, :]
        f_r = stg * cpg * fx + stg * spg * fy + ctg * fz
        f_t = ctg * cpg * fx + ctg * spg * fy - stg * fz
        f_p = -spg * fx + cpg * fy

        y = self.grid2shc(f_r)                     # (.., M)

        fmt = jnp.fft.rfft(f_t, axis=-1)[..., :p + 1] \
            * (2 * np.pi / np_)                    # (.., nt, m)
        fmp = jnp.fft.rfft(f_p, axis=-1)[..., :p + 1] \
            * (2 * np.pi / np_)
        dPw = self._dP * self._w[None, None, :]    # (m, l, nt)
        Qw = self._Q * self._w[None, None, :]
        Ct, St = fmt.real, -fmt.imag
        Cp, Sp = fmp.real, -fmp.imag
        mv = jnp.arange(p + 1, dtype=F.dtype)[:, None]   # (m, 1)
        an = jnp.asarray(self._an_c, F.dtype)            # (m, 1)

        def E(M_, v):
            return jnp.einsum("mln,...nm->...ml", M_, v)

        gc = an * (E(dPw, Ct) - mv * E(Qw, Sp))    # (.., m, l)
        gs = an * (E(dPw, St) + mv * E(Qw, Cp))
        xc = an * (mv * E(Qw, St) + E(dPw, Cp))
        xs = an * (-mv * E(Qw, Ct) + E(dPw, Sp))
        ll = jnp.asarray(np.arange(p + 1, dtype=np.float64))
        inv = 1.0 / jnp.where(ll > 0, ll * (ll + 1), 1.0)
        g = self._pack(gc * inv, gs * inv)         # (.., M)
        x = self._pack(xc * inv, xs * inv)
        l_idx, _, _ = _packed_index(p)
        lv = jnp.asarray(l_idx.astype(np.float64))
        v = (lv * g - y) / (2 * lv + 1)
        w = ((lv + 1) * g + y) / (2 * lv + 1)
        # W_00 = X_00 = 0 identically
        w = w.at[..., 0].set(0.0)
        x = x.at[..., 0].set(0.0)
        return jnp.stack([v, w, x], axis=-2)       # (.., 3, M)

    def vecshc2grid(self, S) -> jnp.ndarray:
        """(.., 3, (p+1)^2) packed (V, W, X) -> (.., 3, nt, np_)
        Cartesian grid values (reference: VecSHC2Grid,
        sph_harm.txx:758-859)."""
        p, nt, np_ = self.p, self.nt, self.np_
        S = jnp.asarray(S)
        v, w, x = S[..., 0, :], S[..., 1, :], S[..., 2, :]
        l_idx, _, _ = _packed_index(p)
        lv = jnp.asarray(l_idx.astype(np.float64))
        f_r = self.shc2grid(-(lv + 1) * v + lv * w)

        gc, gs = self._unpack(v + w)               # (.., m, l)
        xc, xs = self._unpack(x)
        nf = np_ // 2 + 1
        mv = jnp.arange(p + 1, dtype=S.dtype)[None, :]   # (1, m): the
        # m-factor lands on the OUTPUT column axis of the einsums
        sy = jnp.asarray(self._sy_c[:, 0], S.dtype)[None, :]

        def E(M_, c):
            return jnp.einsum("mln,...ml->...nm", M_, c)

        At = E(self._dP, gc) - mv * E(self._Q, xs)   # (.., nt, m)
        Bt = E(self._dP, gs) + mv * E(self._Q, xc)
        Ap = mv * E(self._Q, gs) + E(self._dP, xc)
        Bp = -mv * E(self._Q, gc) + E(self._dP, xs)
        pad = [(0, 0)] * (At.ndim - 1) + [(0, nf - (p + 1))]
        fmt = jnp.pad(sy * (At - 1j * Bt), pad)
        fmp = jnp.pad(sy * (Ap - 1j * Bp), pad)
        f_t = jnp.fft.irfft(fmt, n=np_, axis=-1)
        f_p = jnp.fft.irfft(fmp, n=np_, axis=-1)

        theta = jnp.asarray(self.theta)
        ct, st = jnp.cos(theta)[:, None], jnp.sin(theta)[:, None]
        phi = 2 * np.pi * jnp.arange(np_) / np_
        cp, sp = jnp.cos(phi)[None, :], jnp.sin(phi)[None, :]
        fx = st * cp * f_r + ct * cp * f_t - sp * f_p
        fy = st * sp * f_r + ct * sp * f_t + cp * f_p
        fz = ct * f_r - st * f_t
        return jnp.stack([fx, fy, fz], axis=-3)

    def vecshc_eval(self, S, theta, phi) -> jnp.ndarray:
        """Evaluate the vector SH expansion at arbitrary (theta, phi)
        on the unit sphere -> Cartesian (.., N, 3) (reference:
        VecSHCEval, sph_harm.txx:861-911)."""
        S = jnp.asarray(S)
        theta = jnp.asarray(theta)
        phi = jnp.asarray(phi)
        return _vsh_synth_at(S[..., 0, :], S[..., 1, :], S[..., 2, :],
                             self.p, theta, phi, jnp)

    # -- pointwise evaluation ----------------------------------------------
    def eval(self, shc, theta, phi):
        """Evaluate the SH expansion at arbitrary (theta, phi) points
        (reference: SHCEval)."""
        p = self.p
        theta = np.asarray(theta)
        phi = np.asarray(phi)
        c, s = map(np.asarray, self._unpack(jnp.asarray(shc)))
        P = _legendre_at(p, np.cos(theta))          # (p+1, p+1, M)
        gm = np.einsum("mlM,ml->mM", P, c)
        hm = np.einsum("mlM,ml->mM", P, s)
        mv = np.arange(p + 1)[:, None]
        an = np.asarray(self._an_c)                 # (m, 1): 1, sq2..
        return (an * (gm * np.cos(mv * phi[None])
                      + hm * np.sin(mv * phi[None]))).sum(0)


# -- vector spherical harmonics + Stokes sphere layer potentials --------
#
# Packed vector coefficients: S[..., 3, (p+1)^2] with family axis
# (V, W, X) over the scalar packed layout.  w_00 and x_00 are
# identically zero (W_00 = X_00 = 0).


@functools.lru_cache(maxsize=None)
def _packed_index(p: int):
    """Constant index maps for the packed layout: for packed slot k,
    (l_k, m_k, is_sin_k)."""
    l_idx, m_idx, s_idx = [], [], []
    for l in range(p + 1):
        l_idx.append(l), m_idx.append(0), s_idx.append(0)
        for m in range(1, l + 1):
            l_idx.extend([l, l]), m_idx.extend([m, m])
            s_idx.extend([0, 1])
    return (np.array(l_idx), np.array(m_idx), np.array(s_idx))


def _legendre_trio(p: int, ct, st, xp=jnp):
    """Traceable normalized associated-Legendre tables at arbitrary
    points: P[m][l] (N,), dPdt[m][l] (theta-derivative, pole-safe
    ladder), Q[m][l] = P/sin(theta) (pole-safe recurrence, m >= 1).

    Returns nested lists indexed [m][l] of (N,) arrays (None where
    l < m).  Works with xp = numpy or jax.numpy (traceable for
    autodiff-based traction evaluation).
    """
    P = [[None] * (p + 2) for _ in range(p + 3)]
    Q = [[None] * (p + 2) for _ in range(p + 3)]
    c00 = 1.0 / np.sqrt(4 * np.pi)
    one = xp.ones_like(ct)
    P[0][0] = c00 * one
    Q[1][1] = -np.sqrt(3.0 / 2.0) * c00 * one      # P[1][1]/sin(t)
    P[1][1] = Q[1][1] * st
    for m in range(2, p + 2):
        f = -np.sqrt((2 * m + 1) / (2.0 * m))
        Q[m][m] = f * st * Q[m - 1][m - 1]
        P[m][m] = Q[m][m] * st
    for m in range(p + 2):
        if m + 1 <= p + 1:
            f = np.sqrt(2 * m + 3.0)
            P[m][m + 1] = f * ct * P[m][m]
            if m >= 1:
                Q[m][m + 1] = f * ct * Q[m][m]
        for l in range(m + 2, p + 2):
            a = np.sqrt((4.0 * l * l - 1) / (l * l - m * m))
            b = np.sqrt(((l - 1.0) ** 2 - m * m)
                        / (4.0 * (l - 1.0) ** 2 - 1))
            P[m][l] = a * (ct * P[m][l - 1] - b * P[m][l - 2])
            if m >= 1:
                Q[m][l] = a * (ct * Q[m][l - 1] - b * Q[m][l - 2])
    # pole-safe derivative ladder (Condon-Shortley-phased normalized
    # functions; verified against finite differences):
    # dP[m][l] = (sqrt((l-m)(l+m+1)) P[m+1][l]
    #             - sqrt((l+m)(l-m+1)) P[m-1][l]) / 2,  P[-1] := -P[1]
    dP = [[None] * (p + 2) for _ in range(p + 2)]
    for m in range(p + 2):
        for l in range(m, p + 2):
            if m == 0:
                lo = -P[1][l] if l >= 1 else 0.0
            else:
                lo = P[m - 1][l]
            hi = P[m + 1][l] if (m + 1 <= l) else 0.0
            dP[m][l] = 0.5 * (np.sqrt((l - m) * (l + m + 1.0)) * hi
                              - np.sqrt((l + m) * (l - m + 1.0)) * lo)
    return P, dP, Q


def _vsh_bases(p: int, theta, phi, xp=jnp):
    """Angular basis matrices at N points, packed over (p+1)^2 slots:
    BY (N,M) = Y; BT (N,M) = dY/dtheta; BP (N,M) = (dY/dphi)/sin(theta)
    (pole-safe: uses Q = P/sin).  Real basis: Y^c = sq2*P*cos(m phi),
    Y^s = sq2*P*sin(m phi) (sq2 = 1 at m=0)."""
    ct, st = xp.cos(theta), xp.sin(theta)
    P, dP, Q = _legendre_trio(p, ct, st, xp)
    l_idx, m_idx, s_idx = _packed_index(p)
    BY, BT, BP = [], [], []
    for k in range(len(l_idx)):
        l, m, is_sin = int(l_idx[k]), int(m_idx[k]), int(s_idx[k])
        sq = 1.0 if m == 0 else np.sqrt(2.0)
        cosm, sinm = xp.cos(m * phi), xp.sin(m * phi)
        trig = sinm if is_sin else cosm
        BY.append(sq * P[m][l] * trig)
        BT.append(sq * dP[m][l] * trig)
        if m == 0:
            BP.append(xp.zeros_like(theta))
        else:
            # d/dphi: cos -> -m sin;  sin -> m cos
            dtrig = (m * cosm) if is_sin else (-m * sinm)
            BP.append(sq * Q[m][l] * dtrig)
    stack = xp.stack
    return (stack(BY, axis=-1), stack(BT, axis=-1),
            stack(BP, axis=-1))


def _sph_to_cart(theta, phi, u_r, u_t, u_p, xp=jnp):
    """Rotate spherical components to Cartesian (the Q matrix of
    sph_harm.txx:887-895)."""
    ct, st = xp.cos(theta), xp.sin(theta)
    cp, sp = xp.cos(phi), xp.sin(phi)
    ux = st * cp * u_r + ct * cp * u_t - sp * u_p
    uy = st * sp * u_r + ct * sp * u_t + cp * u_p
    uz = ct * u_r - st * u_t
    return xp.stack([ux, uy, uz], axis=-1)


def _vsh_synth_at(veff, weff, xeff, p, theta, phi, xp=jnp,
                  per_target: bool = False):
    """Evaluate sum_k veff V_k + weff W_k + xeff X_k at (theta, phi).
    Coefficients are shared (.., M) by default, or per-target
    (.., N, M) with per_target=True.  Returns Cartesian (.., N, 3)."""
    BY, BT, BP = _vsh_bases(p, theta, phi, xp)   # (N, M)
    l_idx, _, _ = _packed_index(p)
    lv = l_idx.astype(np.float64)
    geff = veff + weff
    contract = (lambda c, B: xp.sum(c * B, axis=-1)) if per_target \
        else (lambda c, B: xp.einsum("...k,nk->...n", c, B))
    u_r = contract(-(lv + 1) * veff + lv * weff, BY)
    u_t = contract(geff, BT) - contract(xeff, BP)
    u_p = contract(geff, BP) + contract(xeff, BT)
    return _sph_to_cart(theta, phi, u_r, u_t, u_p, xp)


def _coord_to_sph(coord, xp=jnp):
    x, y, z = coord[..., 0], coord[..., 1], coord[..., 2]
    rho = xp.sqrt(x * x + y * y)
    r = xp.sqrt(x * x + y * y + z * z)
    theta = xp.arctan2(rho, z)
    phi = xp.arctan2(y, x)
    return r, theta, phi


def _stokes_factors(kind: str, p: int, r, interior: bool, xp=jnp):
    """Per-degree radius factors (fVV, fVW, fWW, fWV, fXX), each
    (N, p+1): fAB = contribution of an A-family density coefficient to
    the B-family of the resulting field.  Coefficient tables from the
    reference (SL sph_harm.txx:1050-1090, DL 1258-1290, KSelf
    1873-1905)."""
    n = xp.asarray(np.arange(p + 1, dtype=np.float64))
    r = r[..., None]                               # (N, 1)
    rp = lambda e: r ** e                          # noqa: E731
    z = xp.zeros_like(r * n)
    if kind == "SL":
        if interior:
            fVV = n / ((2 * n + 1) * (2 * n + 3)) * rp(n + 1)
            fVW = -(n + 1) / (4 * n + 2) * (rp(n - 1) - rp(n + 1))
            fWW = (n + 1) / ((2 * n + 1) * (2 * n - 1)) * rp(n - 1)
            fWV = z
            fXX = 1 / (2 * n + 1) * rp(n)
        else:
            fVV = n / ((2 * n + 1) * (2 * n + 3)) * rp(-n - 2)
            fVW = z
            fWW = (n + 1) / ((2 * n + 1) * (2 * n - 1)) * rp(-n)
            fWV = n / (4 * n + 2) * (rp(-n - 2) - rp(-n))
            fXX = 1 / (2 * n + 1) * rp(-n - 1)
    elif kind == "DL":
        if interior:
            fVV = -2 * n * (n + 2) / ((2 * n + 1) * (2 * n + 3)) \
                * rp(n + 1)
            fVW = -(n + 1) * (n + 2) / (2 * n + 1) \
                * (rp(n + 1) - rp(n - 1))
            fWW = -(2 * n * n + 1) / ((2 * n + 1) * (2 * n - 1)) \
                * rp(n - 1)
            fWV = z
            fXX = -(n + 2) / (2 * n + 1) * rp(n)
        else:
            fVV = (2 * n * n + 4 * n + 3) / ((2 * n + 1) * (2 * n + 3)) \
                * rp(-n - 2)
            fVW = z
            fWW = 2 * (n + 1) * (n - 1) / ((2 * n + 1) * (2 * n - 1)) \
                * rp(-n)
            fWV = 2 * n * (n - 1) / (4 * n + 2) * (rp(-n - 2) - rp(-n))
            fXX = (n - 1) / (2 * n + 1) * rp(-n - 1)
    elif kind == "KSELF":
        if interior:
            fVV = (2 * n * n + 4 * n + 3) / ((2 * n + 1) * (2 * n + 3)) \
                * rp(n)
            fVW = (n + 1) * (n - 1) / (2 * n + 1) * (rp(n) - rp(n - 2))
            fWW = 2 * (n + 1) * (n - 1) / ((2 * n + 1) * (2 * n - 1)) \
                * rp(n - 2)
            fWV = z
            fXX = (n - 1) / (2 * n + 1) * rp(n - 1)
        else:
            fVV = -2 * n * (n + 2) / ((2 * n + 1) * (2 * n + 3)) \
                * rp(-n - 3)
            fVW = z
            fWW = -(2 * n * n + 1) / ((2 * n + 1) * (2 * n - 1)) \
                * rp(-n - 1)
            fWV = n * (n + 2) / (2 * n + 1) * (rp(-n - 1) - rp(-n - 3))
            fXX = -(n + 2) / (2 * n + 1) * rp(-n - 2)
    else:
        raise ValueError(kind)
    # n = 0: only the V family is nonzero in the density; guard the
    # 1/(2n-1)-type singularities on unused families.
    mask0 = xp.asarray((np.arange(p + 1) == 0))
    fWW = xp.where(mask0, 0.0, fWW)
    fWV = xp.where(mask0, 0.0, fWV)
    fXX = xp.where(mask0, 0.0, fXX)
    return fVV, fVW, fWW, fWV, fXX


def _stokes_apply(kind: str, S, p: int, coord, interior: bool, xp=jnp):
    """Shared spectral layer-potential evaluator: S (.., 3, M) packed
    (V, W, X) density coefficients, coord (N, 3) -> (.., N, 3)."""
    S = xp.asarray(S)
    coord = xp.asarray(coord)
    r, theta, phi = _coord_to_sph(coord, xp)
    fVV, fVW, fWW, fWV, fXX = _stokes_factors(kind, p, r, interior, xp)
    l_idx, _, _ = _packed_index(p)
    v = S[..., 0, :][..., None, :]                 # (.., 1, M)
    w = S[..., 1, :][..., None, :]
    x = S[..., 2, :][..., None, :]
    Fl = lambda f: f[..., l_idx]                   # noqa: E731
    veff = Fl(fVV) * v + Fl(fWV) * w               # (.., N, M)
    weff = Fl(fVW) * v + Fl(fWW) * w
    xeff = Fl(fXX) * x
    return _vsh_synth_at(veff, weff, xeff, p, theta, phi, xp,
                         per_target=True)


def stokes_eval_sl(S, p: int, coord, interior: bool):
    """Stokes single-layer potential from VSH density coefficients
    (reference: StokesEvalSL, sph_harm.hpp:122-129, impl
    sph_harm.txx:913-1125)."""
    return _stokes_apply("SL", S, p, coord, interior)


def stokes_eval_dl(S, p: int, coord, interior: bool):
    """Stokes double-layer potential (reference: StokesEvalDL,
    sph_harm.txx:1127-1339)."""
    return _stokes_apply("DL", S, p, coord, interior)


def stokes_eval_kself(S, p: int, coord, interior: bool):
    """Traction of the single-layer field with radial normal
    (reference: StokesEvalKSelf, sph_harm.txx:1739-2000)."""
    return _stokes_apply("KSELF", S, p, coord, interior)


def stokes_pressure_sl(S, p: int, coord, interior: bool, xp=jnp):
    """Pressure of the single-layer Stokes field (the PV/PW terms of
    the reference's StokesEvalKL, sph_harm.txx:1590-1636):
    interior p(x) = sum v_nm (n+1) r^n Y_nm; exterior
    p(x) = sum w_nm n r^{-n-1} Y_nm."""
    S = xp.asarray(S)
    coord = xp.asarray(coord)
    r, theta, phi = _coord_to_sph(coord, xp)
    n = xp.asarray(np.arange(p + 1, dtype=np.float64))
    l_idx, _, _ = _packed_index(p)
    if interior:
        fac = ((n + 1) * r[..., None] ** n)[..., l_idx]
        c = S[..., 0, :]
    else:
        fac = (n * r[..., None] ** (-n - 1))[..., l_idx]
        c = S[..., 1, :]
    BY, _, _ = _vsh_bases(p, theta, phi, xp)
    return xp.sum((c[..., None, :] * fac) * BY, axis=-1)


def stokes_eval_kl(S, p: int, coord, norm, interior: bool):
    """Traction of the single-layer Stokes field at arbitrary targets
    with arbitrary normals (reference: StokesEvalKL,
    sph_harm.txx:1341-1739).

    TPU-first design: t = (grad u + grad u^T - p I) . n with grad u by
    forward-mode autodiff of the spectral single-layer velocity and p
    from the spectral pressure — replacing the reference's hand-derived
    VSH-derivative tables with jax.jvp.
    """
    import jax

    S = jnp.asarray(S)
    coord = jnp.asarray(coord, dtype=jnp.result_type(float))
    norm = jnp.asarray(norm, dtype=coord.dtype)

    u_fn = lambda c: stokes_eval_sl(S, p, c, interior)   # noqa: E731
    cols = []
    for j in range(3):
        tang = jnp.zeros_like(coord).at[..., j].set(1.0)
        _, du_j = jax.jvp(u_fn, (coord,), (tang,))
        cols.append(du_j)                          # (.., N, 3) = du/dx_j
    J = jnp.stack(cols, axis=-1)                   # (.., N, 3(i), 3(j))
    pr = stokes_pressure_sl(S, p, coord, interior)
    sym = J + jnp.swapaxes(J, -1, -2)
    t = jnp.einsum("...ij,...j->...i", sym, norm) \
        - pr[..., None] * norm
    return t


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


# -- SHCArrange coefficient layouts (reference: sph_harm.hpp:21-36) ------

class SHCArrange:
    """The reference's three coefficient storage layouts.  Here the
    (Ar, Ai) pair of degree-order (n, m) is this module's real-basis
    pair (c_{n,m}, s_{n,m}) (the layouts are storage ARRANGEMENTS;
    the reference's complex e^{imφ} pairing differs from the real
    basis only by fixed per-m scalings that cancel in any
    arrange -> rearrange roundtrip)."""
    ALL = "ALL"                        # (p+1)^2 complex, row-major
    ROW_MAJOR = "ROW_MAJOR"            # (p+1)(p+2)/2 complex, lower tri
    COL_MAJOR_NONZERO = "COL_MAJOR_NONZERO"  # (p+1)^2 reals, col-major


@functools.lru_cache(maxsize=None)
def _arrange_maps(p: int, arrange: str):
    """(gather, out_len): out[i] = packed[gather[i]] (or 0 where
    gather < 0).  All three layouts are pure index maps of the packed
    real coefficients."""
    li, mi, si = _packed_index(p)      # packed slot k -> (l, m, c|s)
    dim = (p + 1) ** 2
    slot = np.full((2, p + 1, p + 1), -1, np.int64)   # (c|s, m, l)
    slot[si, mi, li] = np.arange(dim)
    if arrange == SHCArrange.ALL:
        g = np.full(2 * (p + 1) ** 2, -1, np.int64)
        i = 0
        for n in range(p + 1):
            for m in range(p + 1):
                if m <= n:
                    g[i] = slot[0, m, n]
                    g[i + 1] = slot[1, m, n] if m else -1
                i += 2
        return g, len(g)
    if arrange == SHCArrange.ROW_MAJOR:
        out = []
        for n in range(p + 1):
            for m in range(n + 1):
                out.append(slot[0, m, n])
                out.append(slot[1, m, n] if m else -1)
        return np.asarray(out, np.int64), len(out)
    if arrange == SHCArrange.COL_MAJOR_NONZERO:
        out = []
        for m in range(p + 1):
            out += [slot[0, m, n] for n in range(m, p + 1)]
            if m:
                out += [slot[1, m, n] for n in range(m, p + 1)]
        return np.asarray(out, np.int64), len(out)
    raise ValueError(f"unknown SHCArrange {arrange!r}")


def shc_arrange(shc, p: int, arrange: str):
    """Packed real coefficients (.., (p+1)^2) -> the requested
    reference layout (reference: SHCArrange, sph_harm.hpp:21-36)."""
    g, n = _arrange_maps(p, arrange)
    xp = jnp if isinstance(shc, jnp.ndarray) else np
    s = xp.concatenate([shc, xp.zeros(shc.shape[:-1] + (1,),
                                      dtype=shc.dtype)], axis=-1)
    gi = xp.asarray(np.where(g >= 0, g, shc.shape[-1]))
    return s[..., gi]


def shc_rearrange(data, p: int, arrange: str):
    """Inverse of `shc_arrange`: layout -> packed real coefficients."""
    g, n = _arrange_maps(p, arrange)
    assert data.shape[-1] == n, (data.shape, n)
    dim = (p + 1) ** 2
    xp = jnp if isinstance(data, jnp.ndarray) else np
    inv = np.full(dim, -1, np.int64)
    valid = g >= 0
    inv[g[valid]] = np.where(valid)[0]
    assert (inv >= 0).all(), "layout does not cover the packed basis"
    return data[..., xp.asarray(inv)]
