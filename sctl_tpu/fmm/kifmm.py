"""Kernel-independent FMM (KIFMM) on a uniform Morton tree.

The reference outsources tree FMM to PVFMM (reference:
fmm-wrapper.txx:788-936, SURVEY.md §3.4); this is the native TPU
implementation (SURVEY.md §7 M7).  Method: equivalent-surface KIFMM
(Ying-Biros-Zorin), batched for the MXU:

  S2M  per-leaf check potentials (pairwise kernel, VPU) then
       q_up = uc2e @ u_check (batched GEMM)
  M2M  child->parent as 8 precomputed (n_surf x n_surf) GEMMs
  M2L  the V-list realized as grid shifts of the dense per-level box
       grid: per child parity, exactly 189 unstrided block shifts of a
       parity-factored layout, each a batched GEMM — no interaction
       lists, no gathers
  L2L  parent->child, 8 GEMMs; dc2e solve folded into precompute
  L2T  per-leaf equivalent->targets (pairwise kernel)
  P2P  lax.scan over the 27 neighbor offsets; each step a (B, Ct, Cs)
       batched pairwise sweep chunked with lax.map.  Box capacity is a
       97th-percentile quantile (64-multiple); the few points beyond it
       live in compact slot-2 arrays with dedicated sweeps

Operators are precomputed per level on host in float64 (pinv with
rcond), then cast to the device dtype (float32 on TPU).  Kernel roles
(cf. the reference's SetKernels M2M/M2L/... fmm-wrapper.hpp:73-100):

  ker_s2t : source->target, used for P2P and S2M check potentials
  ker_trans : equivalent-monopole translation kernel (Laplace3D-FxU for
      the Laplace family)
  ker_l2t : equivalent monopoles -> target quantity (FxU for potential
      targets, FxdU for gradients)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .. import profile
from ..ops.kernels import (KernelSpec, Laplace3D_FxU)
from ..tree.tree import UniformTree

# KIFMM surface radii (ratio of surface half-side to box half-side)
RAD_IN = 1.05   # upward-equivalent / downward-check surface
RAD_OUT = 2.95  # upward-check / downward-equivalent surface


def cube_surface(p: int) -> np.ndarray:
    """(n_surf, 3) points on the surface of the cube [-1,1]^3, a p^3
    grid minus the interior; n_surf = 6p^2 - 12p + 8."""
    g = np.linspace(-1, 1, p)
    pts = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    on_surf = (np.abs(pts) == 1).any(axis=1)
    return pts[on_surf]


def _kmat(ker: KernelSpec, xt: np.ndarray, xs: np.ndarray,
          ns: Optional[np.ndarray] = None) -> np.ndarray:
    """(Nt*k1, Ns*k0) host kernel matrix u = M @ f (incl. scale).

    Pure numpy (ops/kernels_np.py): the precompute makes hundreds of
    small matrix builds; device dispatches would dominate setup time.
    """
    from ..ops.kernels_np import full_matrix_np
    return full_matrix_np(ker, xt, xs, ns).T


def _pinv(a: np.ndarray, rcond: float = 1e-9) -> np.ndarray:
    u, s, vt = np.linalg.svd(a, full_matrices=False)
    cut = rcond * s[0]
    sinv = np.where(s > cut, 1 / np.where(s > cut, s, 1), 0.0)
    return (vt.T * sinv) @ u.T


def _pinv_ns(a: np.ndarray, rcond: float) -> np.ndarray:
    """Truncated pseudo-inverse refined in 80-bit extended precision
    (np.longdouble, eps ~ 1e-19): f64 SVD start, then Newton-Schulz
    X <- X (2I - A X), which is a fixed point at the truncated pinv
    and contracts its error quadratically within the retained
    subspaces.  The f64 SVD's ~eps*sigma_max absolute error on the
    near-cutoff singular values (relative error ~eps/rcond, the
    measured cause of the round-2 accuracy plateau: rcond=1e-12
    measured 270x WORSE than 1e-10 in f64) is driven below 1e-16 —
    the reference's precompute-in-QuadReal discipline
    (ode-solver.txx:77-112, math_utils.hpp:236-300)."""
    from ..quadmath import ld_gemm
    x = _pinv(a, rcond).astype(np.longdouble)
    al = a.astype(np.longdouble)
    eye2 = 2.0 * np.eye(a.shape[0], dtype=np.longdouble)
    for _ in range(3):
        # sliced error-free GEMMs (quadmath.ld_gemm) — BLAS speed,
        # beyond-longdouble accuracy vs numpy's scalar ld matmul
        x = ld_gemm(x, eye2 - ld_gemm(al, x))
    return x


def _vlist_offsets():
    """All 316 same-level relative offsets delta with |delta|_inf in
    {2,3}, plus the (8-parity, offset) validity table: delta is in the
    V-list of a child at parity c iff the parents are neighbors:
    |floor((c+delta)/2)|_inf <= 1."""
    rng = np.arange(-3, 4)
    d = np.stack(np.meshgrid(rng, rng, rng, indexing="ij"),
                 -1).reshape(-1, 3)
    far = np.abs(d).max(axis=1) >= 2
    d = d[far]                                     # (316, 3)
    par = np.stack(np.meshgrid([0, 1], [0, 1], [0, 1], indexing="ij"),
                   -1).reshape(-1, 3)              # (8, 3)
    pd = np.floor((par[:, None, :] + d[None, :, :]) / 2).astype(int)
    valid = (np.abs(pd).max(axis=2) <= 1)          # (8, 316)
    return d, valid


def _op_cache_path(ker_trans, p, rcond, hiprec=False):
    """Disk-cache path for precomputed UNIT-BOX operator tables (the
    reference's SCTL_DATA_PATH cached-tables discipline, common.hpp:
    9-11, sph_harm MatrixStore pattern).  Since v4 the tables are
    scale- and depth-independent: every level's operators follow from
    the unit tables by homogeneity scaling (KernelSpec.src_scal /
    trg_scal — the reference's BuildSrcTrgScal, fmm-wrapper.txx:607),
    so one cache entry serves every tree configuration."""
    import os
    from ..config import config
    hp = "hp" if hiprec else ""
    key = f"kifmm_{ker_trans.name}_p{p}_r{rcond:.3g}_unit_v4{hp}.npz"
    return os.path.join(config.data_path, key)


def _outer_scale(mat: np.ndarray, lam: float, row_exp, col_exp
                 ) -> np.ndarray:
    """mat ⊙ outer(lam^row_exp, lam^col_exp) with the per-component
    exponent tuples tiled over surface points (vector layout is
    point-major: index = point * k + component)."""
    row_exp = np.asarray(row_exp, np.float64)
    col_exp = np.asarray(col_exp, np.float64)
    rv = np.power(lam, np.tile(row_exp, mat.shape[0] // len(row_exp)))
    cv = np.power(lam, np.tile(col_exp, mat.shape[1] // len(col_exp)))
    return mat * rv[:, None] * cv[None, :]


def _rand_colbasis(A: np.ndarray, tol: float = 1e-10,
                   exact_below: int = 2048) -> np.ndarray:
    """Orthonormal column basis of A to relative tolerance `tol` —
    randomized range finder with power iteration (Halko-Martinsson-
    Tropp), exact SVD for small matrices.  Used by the M2L family
    compression where the exact SVD of the (ns, 316*ns) stack
    dominates cold-cache setup (~10x faster at p >= 10)."""
    m, n = A.shape
    if m <= exact_below:
        U, s, _ = np.linalg.svd(A, full_matrices=False)
        r = int(np.searchsorted(-(s / max(s[0], 1e-300)), -tol))
        return U[:, :max(r, 1)]
    rng = np.random.default_rng(0)
    k = min(m, 128)
    while True:
        G = rng.standard_normal((n, k + 16))
        Y = A @ G
        for _ in range(2):                    # power iterations
            Y = A @ (A.T @ Y)
        Q, _ = np.linalg.qr(Y)
        B = Q.T @ A
        U, s, _ = np.linalg.svd(B, full_matrices=False)
        r = int(np.searchsorted(-(s / max(s[0], 1e-300)), -tol))
        if r < k or k >= m:
            return Q @ U[:, :max(r, 1)]
        k = min(m, 2 * k)


class KIFMMOperators:
    """Per-(kernel family, p, rcond) precomputed operators, cached on
    disk under SCTL_DATA_PATH.

    Only UNIT-BOX tables are ever computed or cached: for homogeneous
    kernels every level's translation operator is the unit one with
    per-component outer diagonal scaling (K(a*r)[i,j] =
    a^-(s_i+t_j) K(r)[i,j]; the reference's BuildSrcTrgScal,
    fmm-wrapper.txx:607-660), so the cold-setup cost and the cache
    are independent of tree depth and problem scale:

      uc2e(lam)  = diag(lam^s) uc2e_unit diag(lam^t)
      m2m/l2l(l) = diag(lam_p^s)  *_unit  diag(lam_p^-s)   (lam_p =
                   parent side; elementwise outer rescale)
      m2l(lam)   = diag(lam^s) m2l_unit diag(lam^-s), and its
                   (U, A_d, V) compression scales as U -> D U,
                   V -> D^-1 V with A_d untouched.

    For single-exponent kernels (Laplace, pure Stokes) the m2m/l2l/
    m2l scalings cancel entirely — every level shares the SAME numpy
    (and device) arrays."""

    def __init__(self, ker_s2t: KernelSpec, ker_trans: KernelSpec,
                 ker_l2t: KernelSpec, p: int, depth: int, scale: float,
                 dtype=jnp.float32, rcond: Optional[float] = None,
                 hiprec: bool = False):
        if rcond is None:
            # f32 pipeline: pinv components with sigma below ~3e-5
            # amplify f32 rounding past the p<=8 accuracy target
            # (measured optimum; f64 keeps gaining down to 1e-9)
            rcond = 3e-5 if dtype == jnp.float32 else 1e-9
        self._rcond = rcond
        self._hiprec = bool(hiprec)
        surf = cube_surface(p)                     # unit cube surface
        self.n_surf = len(surf)
        self.p = p
        self.offsets, self.parity_valid = _vlist_offsets()

        cache_path = _op_cache_path(ker_trans, p, rcond, hiprec)
        if not self._load_cache(cache_path) and not (
                self._hiprec
                and self._load_cache_lite(cache_path, ker_trans, surf)):
            self._build_unit(ker_trans, surf, rcond)
            self._compress_m2l_unit()
            self._save_cache(cache_path)
        self._derive_levels(ker_trans, depth, scale, surf)
        self._to_device(dtype, ker_s2t, ker_trans, ker_l2t)

    def _build_unit(self, ker_trans, surf, rcond):
        """Unit-box tables: parent side 1 (children at 1/2), M2L at
        side 1."""
        # child corners in MORTON child-index order: with keys built as
        # spread(x) | spread(y)<<1 | spread(z)<<2, child index
        # c = x + 2y + 4z (morton.py morton_encode)
        child_pos = np.array([[c & 1, (c >> 1) & 1, (c >> 2) & 1]
                              for c in range(8)])
        s_exp = np.asarray(ker_trans.src_scal, np.float64)
        t_exp = np.asarray(ker_trans.trg_scal, np.float64)
        s_in = surf * (RAD_IN / 2)                 # equiv-up / check-dn
        s_out = surf * (RAD_OUT / 2)               # check-up / equiv-dn
        # hiprec: pinv + translation products in 80-bit longdouble
        # (precompute-in-QuadReal discipline); tables stored f64
        pinv = _pinv_ns if self._hiprec else _pinv
        f64 = (lambda a: np.asarray(a, np.float64))
        uc2e = pinv(_kmat(ker_trans, s_out, s_in), rcond)
        dc2e = pinv(_kmat(ker_trans, s_in, s_out), rcond)
        self.uc2e_unit = f64(uc2e)
        self.dc2e_unit = f64(dc2e)
        self._dc2e_work = dc2e                     # native precision
        # dc2e at the child side 1/2 (for l2l_unit); _outer_scale's
        # f64 scale vectors promote, preserving the work precision
        dc2e_half = _outer_scale(dc2e, 0.5, s_exp, t_exp)
        cc = (child_pos - 0.5) * 0.5               # child ctr offsets
        m2m_l, l2l_l = [], []
        for c in range(8):
            # child up-equiv -> parent up-check -> parent up-equiv
            k = _kmat(ker_trans, s_out, surf * (RAD_IN / 4) + cc[c])
            m2m_l.append(f64(uc2e @ k.astype(uc2e.dtype)))
            # parent dn-equiv -> child dn-check -> child dn-equiv
            k2 = _kmat(ker_trans, surf * (RAD_IN / 4) + cc[c], s_out)
            l2l_l.append(f64(dc2e_half @ k2.astype(dc2e.dtype)))
        self.m2m_unit = np.stack(m2m_l)            # (8, ns, ns)
        self.l2l_unit = np.stack(l2l_l)
        self._ker_trans_ref = ker_trans
        self._s_in_ref = s_in
        mats = []
        for d in self.offsets:
            # target box at origin; source box center at +d*side
            # (the shifted grid q[x+d] puts that source at slot x):
            # src up-equiv surface -> trg dn-check surface
            k = _kmat(ker_trans, s_in, s_in + d * 1.0)
            mats.append(self.dc2e_unit @ k)        # f64 (basis only in
        self.m2l_unit = np.stack(mats)             # hiprec; see below)

    def _compress_m2l_unit(self):
        """Joint two-sided factorization M_d = U A_d V^T of the unit
        M2L family: the column space has exact rank <= rank(dc2e) (the
        pinv rcond cutoff), measured ~80 of 152 at p=6 — per-offset
        GEMMs run in the compressed space, one basis GEMM per box
        expands after.  Lossless to ~1e-12 (randomized range finder
        above 2048 rows — exact-SVD cost dominated cold setup).

        hiprec: the compression tolerance is rcond-linked (the fixed
        1e-10 cutoff was the diagnosed round-2 limiter past the
        ~7e-9 plateau) and the compressed tables A_d = U^T (dc2e K_d) V
        are recomputed in longdouble — the f64 product dc2e @ K_d
        loses ~eps/rcond digits to cancellation against the ~1/rcond
        dc2e entries."""
        ctol = (max(1e-13, min(1e-10, 0.1 * self._rcond))
                if self._hiprec else 1e-10)
        M = self.m2l_unit                          # (316, ns, ns)
        ns_ = M.shape[1]
        A = np.transpose(M, (1, 0, 2)).reshape(ns_, -1)
        U = _rand_colbasis(A, ctol)
        r = min(max(8, -(-U.shape[1] // 8) * 8), ns_)  # sublane-align
        if U.shape[1] < r:
            U2, _, _ = np.linalg.svd(
                A - U @ (U.T @ A), full_matrices=False)
            U = np.concatenate([U, U2[:, :r - U.shape[1]]], axis=1)
        Ur = np.ascontiguousarray(U[:, :r])
        self.cb_unit = Ur
        C = np.einsum("nm,omk->onk", Ur.T, M, optimize=True)
        # second side: joint ROW basis V of the compressed family
        # (M_d = U A_d V^T) — the source grid is projected onto V
        # ONCE per level, so every scan step reads r2 <= ns channels
        # instead of ns (the M2L sweep is traffic-bound)
        B = np.transpose(C, (2, 0, 1)).reshape(ns_, -1)
        V = _rand_colbasis(B, ctol)
        r2 = min(max(8, -(-V.shape[1] // 8) * 8), ns_)
        if V.shape[1] < r2:
            V2, _, _ = np.linalg.svd(
                B - V @ (V.T @ B), full_matrices=False)
            V = np.concatenate([V, V2[:, :r2 - V.shape[1]]], axis=1)
        Vr = np.ascontiguousarray(V[:, :r2])
        self.vb_unit = Vr
        self.ca_unit = np.einsum("ork,kn->orn", C, Vr, optimize=True)
        self.cc_unit = C
        if self._hiprec:
            # recompute the tables the M2L sweep actually reads in
            # longdouble: A_d = (U^T dc2e) K_d V with one (r, ns)
            # projection W precomputed; ~0.75 ns^3 longdouble MACs per
            # offset, one-time and disk-cached
            from ..quadmath import ld_gemm
            W = ld_gemm(Ur.T, self._dc2e_work)
            Vl = Vr.astype(np.longdouble)
            for i, d in enumerate(self.offsets):
                k = _kmat(self._ker_trans_ref, self._s_in_ref,
                          self._s_in_ref + d * 1.0).astype(np.longdouble)
                # sliced error-free GEMMs at BLAS speed instead of
                # numpy's scalar longdouble matmul (quadmath.ld_gemm)
                self.ca_unit[i] = np.float64(ld_gemm(ld_gemm(W, k),
                                                     Vl))

    def _derive_levels(self, ker_trans, depth, scale, surf):
        """Per-level operator lists (the layout every consumer reads)
        from the unit tables by homogeneity scaling.  Levels whose
        scaling cancels (single-exponent kernels) share array objects;
        _to_device dedupes them into one device buffer."""
        s_exp = np.asarray(ker_trans.src_scal, np.float64)
        t_exp = np.asarray(ker_trans.trg_scal, np.float64)
        flat = len(set(s_exp)) == 1       # m2m/l2l/m2l scalings cancel
        lam = [scale / (1 << lvl) for lvl in range(depth + 1)]
        self.surf_in = [surf * (RAD_IN * l / 2) for l in lam]
        self.surf_out = [surf * (RAD_OUT * l / 2) for l in lam]
        self.uc2e = [_outer_scale(self.uc2e_unit, l, s_exp, t_exp)
                     for l in lam]
        self.dc2e = [_outer_scale(self.dc2e_unit, l, s_exp, t_exp)
                     for l in lam]

        def conj(mat, l):                  # diag(l^s) mat diag(l^-s)
            return mat if flat else _outer_scale(mat, l, s_exp, -s_exp)

        def conj3(stack, l):
            return stack if flat else np.stack(
                [_outer_scale(m, l, s_exp, -s_exp) for m in stack])

        # m2m/l2l at child level lvl scale with the PARENT side
        self.m2m = [conj3(self.m2m_unit, lam[lvl - 1])
                    for lvl in range(1, depth + 1)]
        self.l2l = [conj3(self.l2l_unit, lam[lvl - 1])
                    for lvl in range(1, depth + 1)]
        # the full per-level M2L stack is never consumed (every eval
        # path reads the compressed m2l_u/m2l_v/m2l_a/m2l_c family);
        # deriving it cost ~40 s and ~700 MB/level for Stokes FSxU
        rvec = lambda l: np.power(
            l, np.tile(s_exp, self.cb_unit.shape[0] // len(s_exp)))
        self.m2l_u = [self.cb_unit if flat
                      else self.cb_unit * rvec(l)[:, None] for l in lam]
        self.m2l_v = [self.vb_unit if flat
                      else self.vb_unit / rvec(l)[:, None] for l in lam]
        self.m2l_a = [self.ca_unit for _ in lam]
        self.m2l_c = [self.cc_unit if flat
                      else self.cc_unit / rvec(l)[None, None, :]
                      for l in lam]

    def _to_device(self, dtype, ker_s2t, ker_trans, ker_l2t):
        seen = {}                  # id(np array) -> device array: the
                                   # per-level lists share objects for
                                   # single-exponent kernels; dedupe so
                                   # each unique table uploads once

        def _host_cast(a):
            # convert on HOST first: uploading f64 then converting on
            # device doubles the tunnel bytes and issues one
            # convert_element_type dispatch per table
            return (np.asarray(a, dtype) if isinstance(a, np.ndarray)
                    else a)

        def cast(a):
            d = seen.get(id(a))
            if d is None:
                d = seen[id(a)] = jnp.asarray(_host_cast(a),
                                              dtype=dtype)
            return d

        self.uc2e_d = [cast(a) for a in self.uc2e]
        self.dc2e_d = [cast(a) for a in self.dc2e]
        self.m2m_d = [cast(a) for a in self.m2m]
        self.l2l_d = [cast(a) for a in self.l2l]
        self.m2l_u_d = [cast(a) for a in self.m2l_u]
        self.m2l_c_d = [cast(a) for a in self.m2l_c]
        self.m2l_v_d = [cast(a) for a in self.m2l_v]
        self.m2l_a_d = [cast(a) for a in self.m2l_a]
        at_seen = {}

        def at_cast(a):                # A_d^T for the Pallas M2L
            d = at_seen.get(id(a))
            if d is None:
                d = at_seen[id(a)] = jnp.asarray(
                    np.ascontiguousarray(np.transpose(
                        _host_cast(a), (0, 2, 1))), dtype=dtype)
            return d

        self.m2l_at_d = [at_cast(a) for a in self.m2l_a]
        # lane-quantized rank caps for the Pallas M2L: the MXU pads
        # channel dims to 128 lanes, so anything beyond a 128-multiple
        # costs a full extra lane tile — find the smallest 128-multiple
        # whose dropped tail (importance-ordered bases, measured from
        # the compressed family's Frobenius mass) stays below the f32
        # pipeline floor.  The scan/f64 paths keep the exact ranks.
        ca = np.asarray(self.ca_unit, np.float64)     # (316, r, r2)
        # The Pallas branch only ever runs the f32 pipeline (the gate
        # in _m2l_sweep), whose truncation floor is ~6e-5 (p=6 rung);
        # a 1e-5 Frobenius-tail fraction is conservative against it —
        # measured on the p=6 rung: dropping the 24-column r2 tail
        # (mass 1.5e-6, worst-case bound 1.2e-3) moves the eval error
        # 6.0e-5 -> 6.0e-5 (the tail directions barely couple to
        # smooth multipole data) while halving the padded lane tiles
        # (152 -> 256-lane pad becomes 128).  f64/hiprec paths use the
        # scan branch with exact ranks.
        cap_tol2 = max(self._rcond ** 2, 1e-5)

        def _cap(axis):
            other = tuple(i for i in range(3) if i != axis)
            nrm2 = (ca ** 2).sum(axis=other)
            tot = nrm2.sum()
            c = 128
            while c < len(nrm2) and nrm2[c:].sum() > cap_tol2 * tot:
                c += 128
            return int(min(c, len(nrm2)))

        self.m2l_cap_r = _cap(1)
        self.m2l_cap_r2 = _cap(2)
        # sibling-blocked M2L stack (26 parent directions, child-pair
        # blocks of A_d^T, near pairs zero): level-shared because the
        # per-offset A tables are (scaling rides U/V).  Only built
        # when the bf16 hi/lo resident stack fits VMEM (the same gate
        # class as the 316-offset kernel; Stokes-sized ranks exceed it
        # and stay on the scan path).
        rc, r2c = self.m2l_cap_r, self.m2l_cap_r2
        blk_mb = 26 * (8 * r2c) * (8 * rc) * 4 / 2 ** 20
        if dtype == jnp.float32 and blk_mb <= 80:
            from ..ops.pallas_m2l import blocked_m2l_mats
            W = blocked_m2l_mats(ca, self.offsets, self.parity_valid,
                                 rc, r2c)
            self.m2l_blk_d = jnp.asarray(W, dtype=dtype)
        else:
            self.m2l_blk_d = None
        # concatenated single-GEMM forms: q_parent = qc.(P,8n) @ m2m_cat
        # (8n,m); child = q_dn.(P,n) @ l2l_cat (n,8m) — one large MXU
        # GEMM per level instead of 8 small batched ones (measured 13x
        # on the real chip at depth 6).  Memoized by source-array id so
        # levels sharing tables share one device buffer.
        cat_seen = {}

        def cat_cast(a, f):
            d = cat_seen.get(id(a))
            if d is None:
                d = cat_seen[id(a)] = jnp.asarray(f(_host_cast(a)),
                                                  dtype=dtype)
            return d

        self.m2m_cat_d = [cat_cast(a, lambda a: np.transpose(
            a, (0, 2, 1)).reshape(8 * a.shape[2], a.shape[1]))
            for a in self.m2m]
        self.l2l_cat_d = [cat_cast(a, lambda a: np.transpose(
            a, (2, 0, 1)).reshape(a.shape[2], 8 * a.shape[1]))
            for a in self.l2l]
        self.surf_in_d = [cast(a) for a in self.surf_in]
        self.surf_out_d = [cast(a) for a in self.surf_out]
        self.ker_s2t = ker_s2t
        self.ker_trans = ker_trans
        self.ker_l2t = ker_l2t
        # translation dof per surface point: equivalent densities carry
        # k0t, check potentials k1t (Stokes FSxU: 4 -> 3; the
        # reference's reason for shipping FSxU, kernel_functions.hpp:213)
        self.k0t = ker_trans.kdim0
        self.k1t = ker_trans.kdim1

    # m2l_unit (the full 316-offset stack — 700 MB for Stokes FSxU) is
    # deliberately NOT cached: it exists only as the input of
    # _compress_m2l_unit on the build path; every consumer reads the
    # compressed cb/cc/vb/ca family.
    _UNIT_NAMES = ("uc2e_unit", "dc2e_unit", "m2m_unit", "l2l_unit",
                   "cb_unit", "cc_unit", "vb_unit", "ca_unit")

    def _save_cache(self, path):
        import os
        try:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            np.savez(path, **{n: getattr(self, n)
                              for n in self._UNIT_NAMES})
        except OSError:
            pass                                   # cache is best-effort

    def _load_cache(self, path) -> bool:
        import os
        if not os.path.exists(path):
            return False
        try:
            z = np.load(path)
            for n in self._UNIT_NAMES:
                setattr(self, n, z[n])
            self.m2l_unit = None       # build-path-only (see above)
            return True
        except Exception:
            return False

    # The committable hiprec artifact (VERDICT r4 #6: the ladder rung
    # tests must RUN in a fresh clone; the reference ships its
    # precomputed QuadReal tables the same way, common.hpp:9-11).  The
    # full v4hp file is 1.2 GB (p=10) / 2.7 GB (p=12) — dominated by
    # the per-offset ca/cc stacks, which are f64-REBUILDABLE in ~20 s
    # of BLAS from dc2e/cb/vb.  So the lite file stores only what
    # cannot be rebuilt cheaply: the longdouble-pinv products
    # (uc2e/dc2e/m2m/l2l), the joint bases (cb/vb), and the longdouble
    # refinement of ca_unit as an f16-quantized per-offset-scaled
    # delta.  |delta| ~ eps/rcond of the entry scale (the cancellation
    # the hiprec ld_gemm recompute removes); f16 keeps 5e-4 of THAT,
    # orders below the ~7e-9 hiprec rung plateau.
    _LITE_NAMES = ("uc2e_unit", "dc2e_unit", "m2m_unit", "l2l_unit",
                   "cb_unit", "vb_unit")

    def _load_cache_lite(self, path, ker_trans, surf) -> bool:
        import os
        lp = path[:-4] + "_lite.npz"
        if not os.path.exists(lp):
            return False
        try:
            z = np.load(lp)
            for n in self._LITE_NAMES:
                setattr(self, n, z[n])
            qd = z["ca_delta"]
            delta = np.float64(qd)
            if qd.dtype == np.int8:    # 1/127-resolution quantization
                delta /= 127.0
            delta *= z["ca_scale"][:, None, None]
        except Exception:
            return False
        s_in = surf * (RAD_IN / 2)
        M = np.stack([self.dc2e_unit
                      @ _kmat(ker_trans, s_in, s_in + d * 1.0)
                      for d in self.offsets])
        C = np.einsum("nm,omk->onk", self.cb_unit.T, M, optimize=True)
        self.cc_unit = C
        self.ca_unit = np.einsum("ork,kn->orn", C, self.vb_unit,
                                 optimize=True) + delta
        self.m2l_unit = None
        return True


def _quantile_cap(box_cnt: np.ndarray, q: float = 97.0,
                  lane_dim: bool = False) -> int:
    """Per-box capacity at the q-th percentile of occupied-box counts.

    Measured on v5e: the pairwise tile's LANE dim (sources) must be a
    64-multiple (48/56 hit a ~2x slower XLA layout), while the sublane
    dim (targets) scales cleanly in 8-multiples — so source caps round
    to 64, target caps to 8.
    """
    occ = box_cnt[box_cnt > 0]
    if len(occ) == 0:
        return 8
    cap = int(np.percentile(occ, q))
    cap = min(cap, int(box_cnt.max()))
    if lane_dim and cap > 32:
        return -(-cap // 64) * 64
    return max(8, -(-cap // 8) * 8)


def _overflow_slots(tree: UniformTree, cap: int):
    """Slot-2 layout for boxes with more than `cap` points: returns
    (boxes (Bo,), cap2, idx (Bo, cap2) sorted-point indices (clipped),
    valid (Bo, cap2)).  Processed exactly like the main padded arrays,
    just over the small set of overflowing boxes."""
    cnt, dsp = tree.box_cnt, tree.box_dsp
    boxes = np.where(cnt > cap)[0]
    if len(boxes) == 0:
        return (np.zeros(0, np.int64), 8,
                np.zeros((0, 8), np.int64), np.zeros((0, 8), bool))
    over = cnt[boxes] - cap
    cap2 = max(8, -(-int(over.max()) // 8) * 8)
    idx = dsp[boxes][:, None] + cap + np.arange(cap2)[None, :]
    valid = idx < dsp[boxes + 1][:, None]
    idx = np.clip(idx, 0, len(tree.X_sorted) - 1)
    return boxes, cap2, idx, valid


def _pad_boxes(tree: UniformTree, values: Optional[np.ndarray],
               cap: int):
    """Gather per-box padded point/value arrays from the Morton-sorted
    layout: (n_boxes, cap, k) + mask."""
    B = tree.n_boxes
    idx = tree.box_dsp[:-1, None] + np.arange(cap)[None, :]
    valid = idx < tree.box_dsp[1:, None]
    idx = np.clip(idx, 0, max(len(tree.X_sorted) - 1, 0))
    pts = tree.X_sorted[idx]                       # (B, cap, 3)
    vals = None if values is None else values[tree.perm][idx]
    return pts, vals, valid


class KIFMM:
    """Uniform-tree KIFMM evaluator for the Laplace kernel family."""

    def __init__(self, ker_s2t: KernelSpec, p: int = 6,
                 depth: Optional[int] = None,
                 pts_per_leaf: int = 256,
                 ker_l2t: Optional[KernelSpec] = None,
                 ker_s2m: Optional[KernelSpec] = None,
                 dtype=None,
                 use_pallas_p2p: Optional[bool] = None,
                 use_pallas_m2l: Optional[bool] = None,
                 use_pallas_sl: Optional[bool] = None,
                 rcond: Optional[float] = None,
                 hiprec: bool = False):
        import jax
        from ..ops.kernels import Laplace3D_FxdU, Stokes3D_FSxU
        # pinv cutoff for the equivalent-surface operators; None picks
        # the dtype default (KIFMMOperators.__init__) — tighten (e.g.
        # 1e-12 with p >= 10, f64) for the high rungs of the accuracy
        # ladder (BASELINE.md).  hiprec builds the operator tables in
        # 80-bit extended precision with rcond-linked M2L compression
        # cutoffs (required past ~7e-9; BASELINE.md rungs 7+)
        self.rcond = rcond
        self.hiprec = hiprec
        # compact U-list Pallas P2P on real TPU; the XLA 27-offset
        # sweep elsewhere (CPU tests run the same math through XLA)
        if use_pallas_p2p is None:
            use_pallas_p2p = jax.default_backend() in ("tpu", "axon")
        self.use_pallas_p2p = use_pallas_p2p
        # z-tiled windowed Pallas M2L (ops/pallas_m2l.py) on real TPU;
        # the per-parity scan elsewhere
        if use_pallas_m2l is None:
            use_pallas_m2l = jax.default_backend() in ("tpu", "axon")
        self.use_pallas_m2l = use_pallas_m2l
        from ..config import config as _cfg
        self._m2l_blocked = _cfg.m2l_blocked
        self._p2p_packed9 = _cfg.p2p_packed9
        # S2M check potentials + L2T through the shared-surface Pallas
        # kernels (ops/pallas_sl.py): surface points ride sublanes,
        # box slots ride lanes, per-box sums assembled by exact hi/lo
        # MXU one-hot matmuls — measured 52 -> 15 ms (S2M+M2M) and
        # 41 -> 14 ms (L2T) at the 1e7/depth-6 flagship.  (The round-3
        # p2p_ulist routing was SLOWER than XLA — per-box sublane
        # slicing and (T,1)->(1,T) relayouts — and was retired.)
        if use_pallas_sl is None:
            use_pallas_sl = jax.default_backend() in ("tpu", "axon")
        self.use_pallas_sl = use_pallas_sl
        self.ker_s2t = ker_s2t
        if ker_s2t.name.startswith("Stokes"):
            self.ker_trans = Stokes3D_FSxU
            self.ker_l2t = ker_l2t or Stokes3D_FSxU
        else:
            self.ker_trans = Laplace3D_FxU
            self.ker_l2t = ker_l2t or (
                Laplace3D_FxdU if ker_s2t.name == "Laplace3D-FxdU"
                else Laplace3D_FxU)
        # S2M check-potential kernel: same source type as ker_s2t but
        # target type = the translation kernel's (the upward check
        # surface carries ker_trans.kdim1 values per point to match
        # uc2e).  Kernels whose target type differs (FxdU: gradient
        # targets) evaluate S2M with the potential-target sibling —
        # the reference's kernel-role split (fmm-wrapper.hpp:73-100).
        if ker_s2m is None:
            ker_s2m = (Laplace3D_FxU
                       if ker_s2t.name == "Laplace3D-FxdU" else ker_s2t)
        if (ker_s2m.kdim0 != ker_s2t.kdim0
                or ker_s2m.kdim1 != self.ker_trans.kdim1):
            raise ValueError(
                f"ker_s2m {ker_s2m.name} dims ({ker_s2m.kdim0},"
                f"{ker_s2m.kdim1}) incompatible with ker_s2t "
                f"{ker_s2t.name} (kdim0={ker_s2t.kdim0}) and ker_trans "
                f"{self.ker_trans.name} (kdim1={self.ker_trans.kdim1})")
        self.ker_s2m = ker_s2m
        self.p = p
        self.pts_per_leaf = pts_per_leaf
        self.depth = depth
        x64 = jax.config.jax_enable_x64
        self.dtype = dtype or (
            jnp.float64 if (x64 and jax.default_backend()
                            not in ("tpu", "axon"))
            else jnp.float32)
        self._ops = None

    # -- setup -----------------------------------------------------------
    def setup(self, x_src: np.ndarray, x_trg: np.ndarray,
              n_src: Optional[np.ndarray] = None):
        if (self.ker_s2t.needs_normal or self.ker_s2m.needs_normal) \
                and n_src is None:
            raise ValueError(
                f"kernel {self.ker_s2t.name} requires source normals: "
                "pass n_src (mirrors direct_eval_blocked's assert)")
        x_src = np.asarray(x_src, np.float64)
        x_trg = np.asarray(x_trg, np.float64)
        lo = np.minimum(x_src.min(0), x_trg.min(0))
        hi = np.maximum(x_src.max(0), x_trg.max(0))
        bbox = (lo, hi)
        n = len(x_src)
        if self.depth is None:
            self.depth = max(2, int(np.round(np.log(
                max(n / self.pts_per_leaf, 1)) / np.log(8))))
        L = self.depth
        self.src_tree = UniformTree(x_src, L, bbox=bbox)
        self.trg_tree = UniformTree(x_trg, L, bbox=bbox)
        self.scale = self.src_tree.scale
        self._ops = KIFMMOperators(self.ker_s2t, self.ker_trans,
                                   self.ker_l2t, self.p, L, self.scale,
                                   self.dtype, rcond=self.rcond,
                                   hiprec=self.hiprec)
        # padded per-leaf arrays with QUANTILE capacity: padding every
        # box to the max count wastes (max/mean)^2 of the P2P compute
        # (Poisson tail); points beyond the 97th-percentile capacity go
        # to an explicit overflow sideband handled by dedicated paths.
        # packed-slab stencil: the slab group (9*cap) is what must be
        # 128-aligned, so the per-box cap keeps the 8-granule (56 at
        # the 1e7/depth-6 density vs 64 lane-rounded — 33% fewer
        # padded pair slots); other paths keep the measured 64-rule
        self.cap_s = _quantile_cap(
            self.src_tree.box_cnt,
            lane_dim=not (self.use_pallas_p2p and self._p2p_packed9))
        # targets (sublanes): a lower quantile pays off since sublane
        # tiles trim cleanly (measured: q75-90 -> cap 48: 0.85s vs
        # q97 -> cap 56: 0.87s at 1e7/depth 6)
        self.cap_t = _quantile_cap(self.trg_tree.box_cnt, q=85.0)
        (self.sov_boxes, self.sov_cap, self.sov_idx,
         self.sov_valid) = _overflow_slots(self.src_tree, self.cap_s)
        (self.tov_boxes, self.tov_cap, self.tov_idx,
         self.tov_valid) = _overflow_slots(self.trg_tree, self.cap_t)
        self.n_ovf_s = int(self.sov_valid.sum())
        self.n_ovf_t = int(self.tov_valid.sum())
        xs_p, ns_p, _ = _pad_boxes(
            self.src_tree, n_src, self.cap_s)
        xt_p, _, t_mask = _pad_boxes(self.trg_tree, None, self.cap_t)
        dt = self.dtype
        self.xs_pad = jnp.asarray(xs_p, dt)
        self.ns_pad = (jnp.asarray(ns_p, dt) if ns_p is not None
                       else jnp.zeros_like(self.xs_pad))
        self.xt_pad = jnp.asarray(xt_p, dt)
        self.t_mask = jnp.asarray(t_mask)
        ctr = self.src_tree.box_centers()
        self.ctr = jnp.asarray(ctr, dt)            # (B, 3) leaf centers
        self.nb = jnp.asarray(self.src_tree.neighbor_boxes(),
                              dtype=jnp.int32)     # (B, 27)
        self._perm_q = self.src_tree.perm          # density gather
        self._n_src_sorted = (None if n_src is None
                              else np.asarray(n_src,
                                              np.float64)[self.src_tree.perm])
        # all device arrays travel as jit ARGUMENTS (a closure would
        # embed hundreds of MB of constants into the compile payload)
        ops = self._ops
        self._data = {
            "xs_pad": self.xs_pad, "ns_pad": self.ns_pad,
            "xt_pad": self.xt_pad, "ctr": self.ctr, "nb": self.nb,
            "uc2e_L": ops.uc2e_d[L],
            "m2m_cat": tuple(ops.m2m_cat_d),
            "l2l_cat": tuple(ops.l2l_cat_d),
            "m2l_u": tuple(ops.m2l_u_d),
            "m2l_c": tuple(ops.m2l_c_d),
            "m2l_v": tuple(ops.m2l_v_d),
            "m2l_a": tuple(ops.m2l_a_d),
            "m2l_at": tuple(ops.m2l_at_d),
            "m2l_blk": ops.m2l_blk_d,
            "surf_out_L": ops.surf_out_d[L],
            **self._parity_tables(ops),
            "gidx": tuple(jnp.asarray(self._grid_index_np(l))
                          for l in range(L + 1)),
            "pgrid": tuple(jnp.asarray(self._parity_grid_np(l))
                           for l in range(L + 1)),
        }
        # overflow sideband: slot-2 padded arrays for the few boxes
        # beyond the quantile capacity; slot index per box (-1 = none)
        B = self.src_tree.n_boxes
        if self.n_ovf_s:
            xs_o = self.src_tree.X_sorted[self.sov_idx]
            ns_o = (self._n_src_sorted[self.sov_idx]
                    if self._n_src_sorted is not None
                    else np.zeros_like(xs_o))
            slot_of_box = np.full(B + 1, -1, np.int64)
            slot_of_box[self.sov_boxes] = np.arange(len(self.sov_boxes))
            self._data.update({
                "xs_ov2": jnp.asarray(xs_o, dt),
                "ns_ov2": jnp.asarray(ns_o, dt),
                "sov_boxes": jnp.asarray(self.sov_boxes, jnp.int32),
                "sov_slot_of_box": jnp.asarray(slot_of_box, jnp.int32),
            })
        if self.n_ovf_t:
            self._data.update({
                "xt_ov2": jnp.asarray(
                    self.trg_tree.X_sorted[self.tov_idx], dt),
                "tov_boxes": jnp.asarray(self.tov_boxes, jnp.int32),
            })
        # shared-surface Pallas S2M/L2T (ops/pallas_sl.py): box-LOCAL
        # transposed slot arrays (localizing in f64 on host keeps the
        # f32 pair differences exact to the box scale)
        B_ = self.src_tree.n_boxes
        self._sl_on = (self.use_pallas_sl and B_ % 128 == 0
                       and dt == jnp.float32)
        if self._sl_on:
            xs_loc = xs_p - ctr[:, None, :]
            self._data["xs_sl"] = jnp.asarray(
                xs_loc.transpose(2, 0, 1).reshape(3, -1), dt)
            if ns_p is not None:
                self._data["ns_sl"] = jnp.asarray(
                    ns_p.transpose(2, 0, 1).reshape(3, -1), dt)
            xt_loc = xt_p - ctr[:, None, :]
            self._data["xt_sl"] = jnp.asarray(
                xt_loc.transpose(2, 0, 1).reshape(3, -1), dt)
        if self.use_pallas_p2p:
            n_side = 1 << L
            gidx = self._grid_index_np(L)          # morton -> raster
            self._gidx_np = gidx
            inv = np.empty_like(gidx)
            inv[gidx] = np.arange(len(gidx))       # raster -> morton
            self._rast_to_mort = inv
            tree = self.src_tree
            xt_r = xt_p[inv].reshape(n_side, n_side, n_side,
                                     self.cap_t, 3)
            self._data.update({
                "xt_rast": jnp.asarray(xt_r.transpose(0, 1, 2, 4, 3),
                                       dt),
                "gidx_L": jnp.asarray(gidx, jnp.int32),
                "rast_to_mort": jnp.asarray(inv, jnp.int32),
            })
            if self._p2p_packed9:
                # packed-slab layout (p2p_stencil9): per (x, y) column
                # the z slab holds all 9 (dx, dy) neighbor columns'
                # box points side by side in a 128-aligned SL-lane
                # group — boundary zeros and slot padding baked in
                cap = self.cap_s
                SL = -(-9 * cap // 128) * 128
                self.SL = SL
                self.stencil_cap = cap
                self._data.update({
                    "xs_slab": jnp.asarray(self._to_slab(
                        xs_p.astype(np.float32), inv, n_side), dt)})
                if self.ker_s2t.needs_normal:
                    self._data["ns_slab"] = jnp.asarray(self._to_slab(
                        ns_p.astype(np.float32), inv, n_side), dt)
                else:
                    self._data["ns_slab"] = jnp.zeros(
                        (n_side, n_side, 3, 128), dt)
            else:
                # legacy shifted-window layout (p2p_stencil): slabs
                # padded to a 64/128-multiple capacity (lane-aligned
                # z-slices), density truncated at cap_s so the slot-2
                # overflow sideband keeps its exact role
                align = 64 if n_side % 2 == 0 else 128
                self.stencil_cap = -(-self.cap_s // align) * align
                cap2 = self.stencil_cap
                idx2 = (tree.box_dsp[:-1, None]
                        + np.arange(cap2)[None, :])
                lim = np.minimum(tree.box_dsp[:-1] + self.cap_s,
                                 tree.box_dsp[1:])
                self._sval2_np = idx2 < lim[:, None]   # (B, cap2)
                self._sidx2_np = np.clip(
                    idx2, 0, max(len(tree.X_sorted) - 1, 0))
                xs_p2 = tree.X_sorted[self._sidx2_np]  # (B, cap2, 3)
                ns_p2 = (self._n_src_sorted[self._sidx2_np]
                         if self._n_src_sorted is not None
                         else np.zeros_like(xs_p2))

                def to_halo(a):                        # (B, cap2, k)
                    k = a.shape[2]
                    g = a[inv].reshape(n_side, n_side, n_side, cap2,
                                       k)
                    g = g.transpose(0, 1, 4, 2, 3).reshape(
                        n_side, n_side, k, n_side * cap2)
                    return np.pad(g, ((0, 0), (0, 0), (0, 0),
                                      (cap2, cap2)))

                self._data.update({
                    "xs_halo": jnp.asarray(to_halo(xs_p2), dt),
                    "ns_halo": jnp.asarray(to_halo(ns_p2), dt),
                })
        self._eval_jit = None
        return self

    @staticmethod
    def _parity_tables(ops):
        """Per-parity V-list tables for the factored-grid M2L: for child
        parity c (index 4x+2y+z) the 189 valid offsets d, decomposed as
        c + d = 2*eb + ep."""
        vidx, ebs, eps = [], [], []
        for c in range(8):
            cvec = np.array([(c >> 2) & 1, (c >> 1) & 1, c & 1])
            oi = np.where(ops.parity_valid[c])[0]
            assert len(oi) == 189, len(oi)
            e = cvec[None, :] + ops.offsets[oi]
            eb = np.floor_divide(e, 2)
            ep = e - 2 * eb
            vidx.append(oi)
            ebs.append(eb)
            eps.append(ep)
        return {
            "m2l_vidx": jnp.asarray(np.stack(vidx), dtype=jnp.int32),
            "m2l_ebs": jnp.asarray(np.stack(ebs), dtype=jnp.int32),
            "m2l_eps": jnp.asarray(np.stack(eps), dtype=jnp.int32),
        }

    # -- density scatter ---------------------------------------------------
    def _pad_density(self, f):
        """-> (fp (B, cap, k0), fp_ovf (O, k0))."""
        f = np.asarray(f, np.float64).reshape(len(self._perm_q),
                                              self.ker_s2t.kdim0)
        cap = self.cap_s
        tree = self.src_tree
        fs = f[tree.perm]
        idx = tree.box_dsp[:-1, None] + np.arange(cap)[None, :]
        valid = idx < tree.box_dsp[1:, None]
        idx = np.clip(idx, 0, len(f) - 1)
        fp = fs[idx] * valid[..., None]
        if self.n_ovf_s:
            fo = fs[self.sov_idx] * self.sov_valid[..., None]
        else:
            fo = np.zeros((0, self.sov_cap, f.shape[1]))
        return (jnp.asarray(fp, self.dtype),
                jnp.asarray(fo, self.dtype))

    def _unsort_u(self, u_sorted: np.ndarray) -> np.ndarray:
        out = np.empty_like(u_sorted)
        out[self.trg_tree.perm] = u_sorted
        return out

    # -- evaluation ---------------------------------------------------------
    def eval(self, f, n_src_override=None) -> np.ndarray:
        """u[trg] = sum_src K(trg, src) f[src] via the tree.  f in
        ORIGINAL source order; result in ORIGINAL target order."""
        fp, fp_ovf = self._pad_density(f)
        if self._eval_jit is None:
            self._eval_jit = jax.jit(self._eval_impl)
        with profile.Profile.scoped("KIFMM::Eval"):
            u_pad, u_ovf = self._eval_jit(fp, fp_ovf, self._data)
        profile.add_flops(self._flop_model())
        k1 = self.ker_l2t.kdim1
        nt = len(self.trg_tree.perm)
        u_sorted = np.empty((nt, k1))
        u_flat = np.asarray(u_pad.reshape(-1, k1))
        u_sorted[self._pad_positions()] = u_flat[
            np.asarray(self.t_mask).reshape(-1)]
        if self.n_ovf_t:
            uo = np.asarray(u_ovf).reshape(-1, k1)
            u_sorted[self.tov_idx.reshape(-1)[
                self.tov_valid.reshape(-1)]] = uo[
                self.tov_valid.reshape(-1)]
        return self._unsort_u(u_sorted)

    # -- device-resident evaluation (density in / potential out stay
    # on device: the steady state of a GMRES outer loop over a BIE
    # operator, boundary_integral.txx:1016-1142) ------------------------
    def _device_index_arrays(self):
        """Precompute the gather/scatter index arrays that _pad_density
        / eval's un-sort do on host, as device constants."""
        if getattr(self, "_dev_idx", None) is not None:
            return self._dev_idx
        tree = self.src_tree
        n = len(tree.perm)
        cap = self.cap_s
        idx = tree.box_dsp[:-1, None] + np.arange(cap)[None, :]
        valid = idx < tree.box_dsp[1:, None]
        idx = np.clip(idx, 0, n - 1)
        d = {
            "src_perm": jnp.asarray(tree.perm, jnp.int32),
            "pad_idx": jnp.asarray(idx, jnp.int32),
            "pad_valid": jnp.asarray(valid, self.dtype),
            "unsort_pos": jnp.asarray(self._pad_positions(), jnp.int32),
            "pad_take": jnp.asarray(
                np.nonzero(np.asarray(self.t_mask).reshape(-1))[0],
                jnp.int32),
            "trg_perm": jnp.asarray(self.trg_tree.perm, jnp.int32),
        }
        if self.n_ovf_s:
            d["sov_idx"] = jnp.asarray(self.sov_idx, jnp.int32)
            d["sov_valid"] = jnp.asarray(self.sov_valid, self.dtype)
        if self.n_ovf_t:
            ovf_pos = self.tov_idx.reshape(-1)[self.tov_valid.reshape(-1)]
            d["tov_pos"] = jnp.asarray(ovf_pos, jnp.int32)
            d["tov_take"] = jnp.asarray(
                np.nonzero(self.tov_valid.reshape(-1))[0], jnp.int32)
        self._dev_idx = d
        return d

    def eval_jnp(self, f) -> jnp.ndarray:
        """Traced evaluation: f (n_src, k0) jnp array in ORIGINAL
        source order -> (n_trg, k1) jnp in ORIGINAL target order; no
        host round trip (call under jit for the solver loop)."""
        di = self._device_index_arrays()
        k0 = self.ker_s2t.kdim0
        f = jnp.asarray(f, self.dtype).reshape(-1, k0)
        fs = f[di["src_perm"]]                        # sorted order
        fp = fs[di["pad_idx"]] * di["pad_valid"][..., None]
        if self.n_ovf_s:
            fo = fs[di["sov_idx"]] * di["sov_valid"][..., None]
        else:
            fo = jnp.zeros((0, self.sov_cap, k0), self.dtype)
        u_pad, u_ovf = self._eval_impl(fp, fo, self._data)
        k1 = self.ker_l2t.kdim1
        nt = len(self.trg_tree.perm)
        u_flat = u_pad.reshape(-1, k1)
        u_sorted = jnp.zeros((nt, k1), u_flat.dtype)
        # first min(cnt, cap) points of each box come from the padded
        # result; padding slots are dropped by a precomputed static
        # index gather
        u_sorted = u_sorted.at[di["unsort_pos"]].set(
            u_flat[di["pad_take"]])
        if self.n_ovf_t:
            uo = u_ovf.reshape(-1, k1)
            u_sorted = u_sorted.at[di["tov_pos"]].set(
                uo[di["tov_take"]])
        out = jnp.zeros_like(u_sorted)
        return out.at[di["trg_perm"]].set(u_sorted)

    def _pad_positions(self):
        """Sorted-order point positions covered by the padded target
        array (the first min(cnt, cap) points of each box)."""
        if getattr(self, "_pad_pos_cache", None) is None:
            dsp, cnt = self.trg_tree.box_dsp, self.trg_tree.box_cnt
            take = np.minimum(cnt, self.cap_t)
            self._pad_pos_cache = np.concatenate(
                [np.arange(dsp[b], dsp[b] + take[b])
                 for b in range(len(cnt))]) if len(cnt) else                 np.zeros(0, np.int64)
        return self._pad_pos_cache

    def _flop_model(self) -> float:
        """FLOPs of one evaluation from the ACTUAL executed shapes —
        quantile-capped padded slabs, slot-2 overflow sidebands, and
        the per-level compressed M2L ranks — so the profiler's f/s
        fields (reference-parity GFLOP/s report, profile.txx:266-267)
        describe what the chip really ran, not a fixed
        27*pts_per_leaf estimate."""
        ops = self._ops
        B = float(self.src_tree.n_boxes)
        ns = ops.n_surf * ops.k0t
        kf = self.ker_s2t.flops
        if self.use_pallas_p2p and self._p2p_packed9:
            # packed-slab stencil: 3*SL source slots per target box
            fl = B * self.cap_t * 3.0 * self.SL * kf         # P2P
        else:
            cap_s_eff = (self.stencil_cap if self.use_pallas_p2p
                         else self.cap_s)
            fl = 27.0 * B * self.cap_t * cap_s_eff * kf      # P2P
        if self.n_ovf_s:
            fl += (27.0 * len(self.sov_boxes) * self.cap_t
                   * self.sov_cap * kf)
        if self.n_ovf_t:
            fl += (27.0 * len(self.tov_boxes) * self.tov_cap
                   * self.cap_s * kf)
            if self.n_ovf_s:
                fl += (27.0 * len(self.tov_boxes) * self.tov_cap
                       * self.sov_cap * kf)
        # S2M checks + uc2e GEMM, L2T
        fl += B * ops.n_surf * self.cap_s * self.ker_s2m.flops
        fl += B * self.cap_t * ops.n_surf * self.ker_l2t.flops
        fl += 2.0 * B * ns * ns
        for lvl in range(2, self.depth + 1):
            bl = 8.0 ** lvl
            r = ops.m2l_u[lvl].shape[1]
            r2 = ops.m2l_v[lvl].shape[1]
            fl += bl * 2.0 * ns * (r + r2)     # U/V projections
            fl += 189.0 * bl * 2.0 * r * r2    # V-list translations
        for lvl in range(3, self.depth + 1):
            # concatenated M2M + L2L GEMMs at the parent level
            fl += 8.0 ** (lvl - 1) * 2.0 * (8 * ns) * ns * 2
        return fl

    def _eval_impl(self, fp, fp_ovf, data):
        ops = self._ops
        L = self.depth
        ns = ops.n_surf * ops.k0t      # equivalent-density dof per box
        B = self.src_tree.n_boxes
        dt = self.dtype
        hi = lax.Precision.HIGHEST
        xs_pad, ns_pad = data["xs_pad"], data["ns_pad"]
        xt_pad, ctr, nb = data["xt_pad"], data["ctr"], data["nb"]
        Os, Ot = self.n_ovf_s, self.n_ovf_t

        # ---- S2M: leaf check potentials -> up equivalents ----
        xck = data["surf_out_L"][None] + ctr[:, None, :]      # (B,ns,3)

        if getattr(self, "_sl_on", False):
            # shared-surface Pallas S2M (ops/pallas_sl.py): the check
            # surface is identical for every box in box-local
            # coordinates; per-box sums assemble via exact hi/lo MXU
            # one-hot matmuls.  -> (k1t, ns_surf, B), transposed back
            # to the point-major (B, ns_surf*k1t) layout of uc2e.
            from ..ops.pallas_sl import surface_pair
            k0 = self.ker_s2m.kdim0
            f_T = fp.reshape(B * self.cap_s, k0).T
            ns_sl = data.get("ns_sl")
            out_sl = surface_pair(
                self.ker_s2m, data["surf_out_L"], data["xs_sl"],
                ns_sl, f_T, self.cap_s)
            u_check = out_sl.transpose(2, 1, 0).reshape(B, -1)
        elif self.use_pallas_sl:
            # per-box Pallas tile fallback (small trees; interpret)
            from ..ops.pallas_p2p import p2p_ulist
            nsf = ops.n_surf
            T8 = -(-nsf // 8) * 8
            S128 = -(-self.cap_s // 128) * 128
            padS = ((0, 0), (0, S128 - self.cap_s), (0, 0))
            u_check = p2p_ulist(
                self.ker_s2m,
                jnp.pad(xck, ((0, 0), (0, T8 - nsf), (0, 0))
                        ).transpose(0, 2, 1),
                jnp.pad(xs_pad, padS).transpose(0, 2, 1),
                jnp.pad(ns_pad, padS).transpose(0, 2, 1),
                jnp.pad(fp, padS).transpose(0, 2, 1))[:, :nsf]
        else:
            def s2m_box(args):
                xc, xs, nsrm, fb = args
                return self.ker_s2m.apply_pairwise(xc, xs, nsrm, fb)

            u_check = lax.map(s2m_box,
                              (xck, xs_pad, ns_pad, fp),
                              batch_size=max(1, min(B, 4096)))
        # (B, n_surf, k1t) -> (B, n_surf*k1t), target-major like _kmat
        u_check = u_check.reshape(B, -1) * self.ker_s2m.scale_factor
        if Os:  # slot-2 sources contribute to their box's multipole
            sb = data["sov_boxes"]
            xck_o = data["surf_out_L"][None] + ctr[sb][:, None, :]

            def s2m_ovf(args):
                return self.ker_s2m.apply_pairwise(*args)

            uo = lax.map(s2m_ovf,
                         (xck_o, data["xs_ov2"], data["ns_ov2"],
                          fp_ovf),
                         batch_size=max(1, min(len(self.sov_boxes),
                                               8192)))
            u_check = u_check.at[sb].add(
                uo.reshape(len(self.sov_boxes), -1)
                * self.ker_s2m.scale_factor)
        q_up = jnp.einsum("mn,bn->bm", data["uc2e_L"], u_check,
                          precision=hi)            # (B, ns)

        # ---- M2M upward (Morton order is parent-major: 8 consecutive
        # boxes share one parent; one large concatenated GEMM/level) ----
        q_levels = {L: q_up}
        for lvl in range(L, 2, -1):
            qc = q_levels[lvl].reshape(-1, 8 * ns)
            q_levels[lvl - 1] = jnp.dot(qc, data["m2m_cat"][lvl - 1],
                                        precision=hi)

        # ---- M2L at each level ----
        v_dn = self._m2l_sweep(q_levels, data)

        # ---- downward: L2L (dc2e is folded into the m2l/l2l mats;
        # one concatenated GEMM per level) ----
        q_dn = v_dn[2]
        for lvl in range(3, L + 1):
            qc = jnp.dot(q_dn, data["l2l_cat"][lvl - 1], precision=hi)
            q_dn = qc.reshape(-1, ns) + v_dn[lvl]
        return self._downward_tail(q_dn, fp, fp_ovf, data)

    def _m2l_sweep(self, q_levels, data):
        """V-list translations at every level: the Pallas z-tiled
        window kernel (ops/pallas_m2l.py) on TPU, else per-parity
        subgrid scans.  In the scan form, each child parity c has
        exactly 189 valid V-list offsets; the grid is stored
        PARITY-MAJOR (2,2,2,h,h,h,ns): the source position 2y + c + d
        decomposes into a parity pick ep = (c+d)&1 (a leading
        contiguous block) plus an unstrided spatial shift
        eb = (c+d)//2 — every scan step slices a contiguous
        (h,h,h,ns) block; no strided access, no masking, 189/316 of
        the flops of the naive sweep."""
        ops = self._ops
        L = self.depth
        ns = ops.n_surf * ops.k0t
        dt = self.dtype
        hi = lax.Precision.HIGHEST
        v_dn = {}
        for lvl in range(2, L + 1):
            nside = 1 << lvl
            h = nside // 2
            q_grid = self._to_grid(q_levels[lvl], lvl, data["gidx"][lvl])
            # VMEM gate: the kernel keeps the full bf16 operator
            # stack resident (2 x 316 x R2 x Rr) plus window/scratch;
            # multi-component kernels (Stokes: r2=608 -> 103 MB mats
            # alone) exceed the 128 MB chip VMEM — they stay on the
            # per-parity scan
            cap_r = -(-getattr(ops, "m2l_cap_r", 1 << 30) // 128) * 128
            cap_r2 = -(-getattr(ops, "m2l_cap_r2", 1 << 30) // 128) \
                * 128
            mats_mb = 2 * 316 * cap_r * cap_r2 * 2 / 2 ** 20
            if (self.use_pallas_m2l and nside >= 8
                    and dt == jnp.float32
                    and data.get("m2l_blk") is not None
                    and self._m2l_blocked):
                # sibling-blocked Pallas sweep (ops/pallas_m2l.py
                # m2l_grid_blocked): reshape to the parent grid
                # (child channel blocks c = 4cx+2cy+cz), 26 parent-
                # direction (8r2 x 8r) block GEMMs, no parity masks.
                from ..ops.pallas_m2l import m2l_grid_blocked
                cr, cr2 = ops.m2l_cap_r, ops.m2l_cap_r2
                V = data["m2l_v"][lvl][:, :cr2]
                U = data["m2l_u"][lvl][:, :cr]
                h2 = nside // 2
                qr2 = jnp.einsum("xyzn,nk->xyzk",
                                 q_grid.reshape(nside, nside, nside,
                                                ns),
                                 V, precision=hi)
                qb = qr2.reshape(h2, 2, h2, 2, h2, 2, cr2).transpose(
                    0, 2, 4, 1, 3, 5, 6).reshape(h2, h2, h2, 8 * cr2)
                qbp = jnp.pad(qb, ((1, 1), (1, 1), (1, 1), (0, 0)))
                accb = m2l_grid_blocked(qbp, data["m2l_blk"], h2, cr,
                                        cr2)
                acc = accb.reshape(h2, h2, h2, 2, 2, 2, cr).transpose(
                    0, 3, 1, 4, 2, 5, 6).reshape(nside, nside, nside,
                                                 cr)
                out_full = jnp.einsum("xyzr,nr->xyzn", acc, U,
                                      precision=hi)
                v_dn[lvl] = self._from_grid(out_full, lvl,
                                            data["gidx"][lvl])
                continue
            if (self.use_pallas_m2l and nside >= 8
                    and dt == jnp.float32 and mats_mb <= 48):
                # z-tiled windowed Pallas sweep (ops/pallas_m2l.py):
                # project onto V, pad 3-wide margins, one kernel call.
                # Lane quantization: the MXU pads every channel dim to
                # 128 lanes, so ranks beyond a 128-multiple cost a
                # full extra lane tile — truncate the importance-
                # ordered U/V bases (SVD order) to the caps computed
                # in KIFMMOperators._to_device (dropped Frobenius
                # tail below the f32 pipeline floor; the f64 path
                # keeps the exact ranks via the scan branch).
                from ..ops.pallas_m2l import m2l_grid
                cr, cr2 = ops.m2l_cap_r, ops.m2l_cap_r2
                V = data["m2l_v"][lvl][:, :cr2]
                U = data["m2l_u"][lvl][:, :cr]
                At = data["m2l_at"][lvl][:, :cr2, :cr]
                r2 = V.shape[1]
                r = U.shape[1]
                qr2 = jnp.einsum("xyzn,nk->xyzk",
                                 q_grid.reshape(nside, nside, nside,
                                                ns),
                                 V, precision=hi)
                qp = jnp.pad(qr2, ((3, 3), (3, 3), (3, 3), (0, 0)))
                acc = m2l_grid(qp, At, nside, r, r2)
                out_full = jnp.einsum("xyzr,nr->xyzn", acc, U,
                                      precision=hi)
                v_dn[lvl] = self._from_grid(out_full, lvl,
                                            data["gidx"][lvl])
                continue
            qr = q_grid.reshape(h, 2, h, 2, h, 2, ns).transpose(
                1, 3, 5, 0, 2, 4, 6)               # (2,2,2,h,h,h,ns)
            # two-sided compression M_d = U A_d V^T: project the grid
            # onto the joint row basis ONCE (the scan is traffic-bound;
            # every step now reads r2 <= ns channels)
            V = data["m2l_v"][lvl]                      # (ns, r2)
            r2 = V.shape[1]
            qr = jnp.einsum("...n,nk->...k", qr, V, precision=hi)
            qrp = jnp.pad(qr, ((0, 0), (0, 0), (0, 0), (2, 2), (2, 2),
                               (2, 2), (0, 0)))
            U = data["m2l_u"][lvl]                      # (ns, r)
            r = U.shape[1]
            # (per-parity sequential scan: measured FASTER than
            # batching all 8 parities per step — the 8-slice stack
            # materializes an 84MB intermediate per trip, tripling
            # traffic; 314 ms vs 140 ms at depth 6)
            outs = []
            for c in range(8):
                ebs = data["m2l_ebs"][c]                # (189, 3)
                eps = data["m2l_eps"][c]                # (189, 3)
                mats = data["m2l_a"][lvl][data["m2l_vidx"][c]]

                def m2l_step(acc, blk, qrp=qrp, h=h, r2=r2):
                    eb, ep, mat = blk                   # mat (r, r2)
                    sl = lax.dynamic_slice(
                        qrp, (ep[0], ep[1], ep[2], 2 + eb[0],
                              2 + eb[1], 2 + eb[2], jnp.int32(0)),
                        (1, 1, 1, h, h, h, r2))
                    sl = sl.reshape(h, h, h, r2)
                    return acc + jnp.einsum("xyzn,rn->xyzr", sl, mat,
                                            precision=hi), None

                acc0 = jnp.zeros((h, h, h, r), dtype=dt)
                acc, _ = lax.scan(m2l_step, acc0, (ebs, eps, mats))
                # expand from the compressed column space (one GEMM)
                outs.append(jnp.einsum("xyzr,nr->xyzn", acc, U,
                                       precision=hi))
            out = jnp.stack(outs).reshape(2, 2, 2, h, h, h, ns)
            acc_full = out.transpose(3, 0, 4, 1, 5, 2, 6).reshape(
                nside, nside, nside, ns)
            v_dn[lvl] = self._from_grid(acc_full, lvl,
                                        data["gidx"][lvl])  # (B_l, ns)
        return v_dn

    def _downward_tail(self, q_dn, fp, fp_ovf, data):
        """L2T + near-field P2P + overflow sidebands from the leaf
        down-equivalents (the back half of _eval_impl)."""
        ops = self._ops
        L = self.depth
        B = self.src_tree.n_boxes
        dt = self.dtype
        xs_pad, ns_pad = data["xs_pad"], data["ns_pad"]
        xt_pad, ctr, nb = data["xt_pad"], data["ctr"], data["nb"]
        Os, Ot = self.n_ovf_s, self.n_ovf_t

        # ---- L2T ----
        xeq = data["surf_out_L"][None] + ctr[:, None, :]      # (B,ns,3)

        k0_l2t = self.ker_l2t.kdim0

        if getattr(self, "_sl_on", False):
            # shared-surface Pallas L2T (ops/pallas_sl.py): the
            # equivalent surface is the shared sublane axis; per-box
            # densities expand to target lanes by an exact hi/lo MXU
            # one-hot product; zero padded lanes (128*cap_t is exact)
            from ..ops.pallas_sl import l2t_surface
            nsf = ops.n_surf
            q_cm = q_dn.reshape(B, nsf, k0_l2t).transpose(2, 1, 0)
            out_sl = l2t_surface(self.ker_l2t, data["surf_out_L"],
                                 data["xt_sl"], q_cm, self.cap_t)
            u_far = out_sl.reshape(-1, B, self.cap_t).transpose(1, 2, 0)
        elif self.use_pallas_sl:
            # per-box Pallas tile fallback (small trees; interpret)
            from ..ops.pallas_p2p import p2p_ulist
            nsf = ops.n_surf
            S128 = -(-nsf // 128) * 128
            padS = ((0, 0), (0, S128 - nsf), (0, 0))
            xeq_T = jnp.pad(xeq, padS).transpose(0, 2, 1)
            q_T = jnp.pad(q_dn.reshape(B, nsf, k0_l2t),
                          padS).transpose(0, 2, 1)
            u_far = p2p_ulist(self.ker_l2t, xt_pad.transpose(0, 2, 1),
                              xeq_T, xeq_T, q_T)
        else:
            def l2t_box(args):
                xt, xe, qd = args
                return self.ker_l2t.apply_pairwise(
                    xt, xe, xe, qd.reshape(-1, k0_l2t))

            u_far = lax.map(l2t_box, (xt_pad, xeq, q_dn),
                            batch_size=max(1, min(B, 4096)))
        u_far = u_far * self.ker_l2t.scale_factor        # (B, Ct, k1)

        # ---- P2P near field ----
        if self.use_pallas_p2p:
            u_near = self._p2p_stencil_pallas(fp, data)
        else:
            u_near = self._p2p_xla_sweep(fp, data, u_far)

        if Os:
            # slot-2 sources -> padded targets of their 27 nbrs:
            # compute all (j, box) contributions, then ONE scatter-add
            # (a scatter per ring step lowers terribly on TPU)
            sb = data["sov_boxes"]
            tb_all = nb[sb, :].T                     # (27, Bo)
            ok_all = tb_all >= 0
            xt_all = xt_pad[jnp.where(ok_all, tb_all, 0)]
            f_all = (fp_ovf[None] *
                     ok_all[:, :, None, None].astype(dt))

            def per_j(xt_b, f_o):
                def inner(a):
                    return self.ker_s2t.apply_pairwise(*a)
                return lax.map(
                    inner, (xt_b, data["xs_ov2"], data["ns_ov2"], f_o),
                    batch_size=max(1, min(len(self.sov_boxes), 8192)))

            u_all = jax.vmap(per_j)(xt_all, f_all)   # (27, Bo, cap_t, k)
            tb_safe = jnp.where(ok_all, tb_all, B).reshape(-1)
            u_near = u_near.at[tb_safe].add(
                u_all.reshape(-1, self.cap_t, self.ker_s2t.kdim1),
                mode="drop")
        u_near = u_near * self.ker_s2t.scale_factor
        u_total = u_far + u_near

        # ---- overflow TARGETS (slot-2): near + far ----
        cap2t = self.tov_cap
        u_ovf = jnp.zeros((max(Ot and len(self.tov_boxes), 1), cap2t,
                           self.ker_l2t.kdim1), dtype=dt)
        if Ot:
            tb_o = data["tov_boxes"]                 # (Bt,)
            xt_o = data["xt_ov2"]                    # (Bt, cap2t, 3)

            def pad2ovf_step(u_acc, j):
                sb2 = nb[tb_o, j]                    # (Bt,)
                ok = sb2 >= 0
                sb_s = jnp.where(ok, sb2, 0)
                f_b = fp[sb_s] * ok[:, None, None].astype(dt)

                def one(args):
                    return self.ker_s2t.apply_pairwise(*args)

                u_j = lax.map(one, (xt_o, xs_pad[sb_s],
                                    ns_pad[sb_s], f_b),
                              batch_size=max(1, min(
                                  len(self.tov_boxes), 8192)))
                return u_acc + u_j, None

            u_ovf_near, _ = lax.scan(
                pad2ovf_step,
                jnp.zeros((len(self.tov_boxes), cap2t,
                           self.ker_s2t.kdim1), dtype=dt),
                jnp.arange(27))

            if Os:  # slot-2 sources in the neighborhood
                slot_of = data["sov_slot_of_box"]

                def ovf2ovf_step(u_acc, j):
                    sb2 = nb[tb_o, j]
                    so = slot_of[jnp.where(sb2 >= 0, sb2, B)]
                    ok = so >= 0
                    so_s = jnp.where(ok, so, 0)
                    f_o = fp_ovf[so_s] * ok[:, None, None].astype(dt)

                    def one(args):
                        return self.ker_s2t.apply_pairwise(*args)

                    u_j = lax.map(one, (xt_o, data["xs_ov2"][so_s],
                                        data["ns_ov2"][so_s], f_o),
                                  batch_size=max(1, min(
                                      len(self.tov_boxes), 8192)))
                    return u_acc + u_j, None

                u_ovf_near, _ = lax.scan(ovf2ovf_step, u_ovf_near,
                                         jnp.arange(27))
            u_ovf_near = u_ovf_near * self.ker_s2t.scale_factor

            # far field: L2T from the box's downward equivalent
            xeq_o = data["surf_out_L"][None] + ctr[tb_o][:, None, :]
            qd_o = q_dn[tb_o]

            def l2t_ovf(args):
                xt_c, xe, qd = args
                return self.ker_l2t.apply_pairwise(
                    xt_c, xe, xe, qd.reshape(-1, k0_l2t))

            u_ovf_far = lax.map(l2t_ovf, (xt_o, xeq_o, qd_o),
                                batch_size=max(1, min(
                                    len(self.tov_boxes), 8192)))
            u_ovf = (u_ovf_far * self.ker_l2t.scale_factor
                     + u_ovf_near)

        return u_total, u_ovf

    # -- P2P paths ---------------------------------------------------------
    def _p2p_xla_sweep(self, fp, data, u_far):
        """27-offset padded-slab sweep (XLA path; CPU/tests)."""
        nb = data["nb"]
        xs_pad, ns_pad = data["xs_pad"], data["ns_pad"]
        xt_pad = data["xt_pad"]
        B = self.src_tree.n_boxes
        dt = self.dtype

        def p2p_step(u_acc, j):
            nb_idx = nb[:, j]
            ok = nb_idx >= 0
            src_idx = jnp.where(ok, nb_idx, 0)
            xs_n = xs_pad[src_idx]
            ns_n = ns_pad[src_idx]
            f_n = fp[src_idx] * ok[:, None, None].astype(dt)

            def p2p_box(args):
                xt, xs, nrm, fb = args
                return self.ker_s2t.apply_pairwise(xt, xs, nrm, fb)

            u_j = lax.map(p2p_box, (xt_pad, xs_n, ns_n, f_n),
                          batch_size=max(1, min(B, 2048)))
            return u_acc + u_j, None

        u_near, _ = lax.scan(p2p_step, jnp.zeros_like(u_far),
                             jnp.arange(27))
        return u_near

    @staticmethod
    def _to_slab(a, inv, n):
        """(B, cap, k) box-padded array (Morton order) -> packed slab
        columns (n, n, k, (n+2)*SL), SL = 128-aligned 9*cap lanes:
        slab entry z (margin coords) holds the 9 (dx, dy) neighbor
        columns' box (x+dx, y+dy, z-1) points at lane sub-blocks
        c*cap (c = 3*(dx+1) + dy+1), zeros in margins/padding."""
        B, cap, k = a.shape
        SL = -(-9 * cap // 128) * 128
        g = a[inv].reshape(n, n, n, cap, k)
        gp = np.pad(g, ((1, 1), (1, 1), (1, 1), (0, 0), (0, 0)))
        cols = np.stack([gp[1 + dx:1 + dx + n, 1 + dy:1 + dy + n]
                         for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
                        axis=3)              # (n, n, n+2, 9, cap, k)
        cols = cols.reshape(n, n, n + 2, 9 * cap, k)
        cols = np.pad(cols, ((0, 0),) * 3
                      + ((0, SL - 9 * cap), (0, 0)))
        return np.ascontiguousarray(
            cols.transpose(0, 1, 4, 2, 3)).reshape(
            n, n, k, (n + 2) * SL)

    def _f_slab(self, fp, data):
        """Density counterpart of `_to_slab`, built on device each
        apply: one raster row-gather, then nine shifted
        dynamic-update-slices into a zero buffer already in the
        kernel's (n, n, k0, n+2, SL) layout — the earlier
        stack+pad+transpose chain materialized the 0.5 GB
        intermediate three times (measured 41.6 ms; this form is
        traffic-bound at ~9 x 2 x 60 MB)."""
        L = self.depth
        n = 1 << L
        cap = self.cap_s
        k0 = self.ker_s2t.kdim0
        SL = self.SL
        g = fp[data["rast_to_mort"]].reshape(n, n, n, cap, k0)
        if k0 == 1:
            g5 = g[..., 0]                       # (n, n, n, cap)
            buf = jnp.zeros((n, n, n + 2, SL), g.dtype)
            for c, (dx, dy) in enumerate(
                    (dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)):
                xs0, xs1 = max(0, -dx), min(n, n - dx)
                ys0, ys1 = max(0, -dy), min(n, n - dy)
                buf = buf.at[xs0:xs1, ys0:ys1, 1:n + 1,
                             c * cap:(c + 1) * cap].set(
                    g5[xs0 + dx:xs1 + dx, ys0 + dy:ys1 + dy])
            return buf.reshape(n, n, 1, (n + 2) * SL)
        gk = g.transpose(0, 1, 4, 2, 3)          # (n, n, k0, n, cap)
        buf = jnp.zeros((n, n, k0, n + 2, SL), g.dtype)
        for c, (dx, dy) in enumerate(
                (dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)):
            xs0, xs1 = max(0, -dx), min(n, n - dx)
            ys0, ys1 = max(0, -dy), min(n, n - dy)
            buf = buf.at[xs0:xs1, ys0:ys1, :, 1:n + 1,
                         c * cap:(c + 1) * cap].set(
                gk[xs0 + dx:xs1 + dx, ys0 + dy:ys1 + dy])
        return buf.reshape(n, n, k0, (n + 2) * SL)

    def _p2p_stencil_pallas(self, fp, data):
        """Near-field P2P via the halo-stencil Pallas kernels over the
        raster-ordered box grid: NO gathers in the hot path (measured:
        XLA's per-row gathers ran at ~12 GB/s and dominated every
        gather-based formulation; the stencil's slab/column block
        fetches are plain DMAs).  One row gather converts the density
        into raster order and one converts the result back."""
        from ..ops.pallas_p2p import p2p_stencil, p2p_stencil9

        L = self.depth
        n = 1 << L
        k0 = self.ker_s2t.kdim0
        if self._p2p_packed9:
            f_s = self._f_slab(fp, data)
            u_r = p2p_stencil9(self.ker_s2t, n, self.SL, self.cap_t,
                               data["xt_rast"], data["xs_slab"],
                               data["ns_slab"], f_s)
        else:
            cap2 = self.stencil_cap
            fpad = jnp.pad(fp, ((0, 0), (0, cap2 - self.cap_s),
                                (0, 0)))
            g = fpad[data["rast_to_mort"]].reshape(n, n, n, cap2, k0)
            g = g.transpose(0, 1, 4, 2, 3).reshape(n, n, k0, n * cap2)
            f_halo = jnp.pad(g, ((0, 0), (0, 0), (0, 0),
                                 (cap2, cap2)))
            u_r = p2p_stencil(self.ker_s2t, n, cap2, self.cap_t,
                              data["xt_rast"], data["xs_halo"],
                              data["ns_halo"], f_halo)
        u_r = u_r.reshape(n ** 3, self.cap_t, self.ker_s2t.kdim1)
        return u_r[data["gidx_L"]]

    # -- grid helpers ------------------------------------------------------
    def _to_grid(self, q, lvl, gidx):
        """Morton-ordered (B, ns) -> (n, n, n, ns) spatial grid."""
        nside = 1 << lvl
        out = jnp.zeros((nside ** 3, q.shape[1]), dtype=q.dtype)
        return out.at[gidx].set(q).reshape(nside, nside, nside,
                                           q.shape[1])

    def _from_grid(self, g, lvl, gidx):
        nside = 1 << lvl
        return g.reshape(nside ** 3, -1)[gidx]

    @staticmethod
    @functools.lru_cache(maxsize=None)
    def _grid_index_np(lvl):
        from ..tree import morton as mtm
        nside = 1 << lvl
        keys = (np.arange(nside ** 3, dtype=np.uint64)
                << np.uint64(3 * (mtm.max_depth(3) - lvl)))
        b = mtm.box_coords(keys, lvl, 3)                 # (B, 3)
        return (b[:, 0] * nside + b[:, 1]) * nside + b[:, 2]

    def _grid_index(self, lvl):
        return jnp.asarray(self._grid_index_np(lvl))

    @staticmethod
    @functools.lru_cache(maxsize=None)
    def _parity_grid_np(lvl):
        nside = 1 << lvl
        x = np.arange(nside) & 1
        px, py, pz = np.meshgrid(x, x, x, indexing="ij")
        return ((px * 2 + py) * 2 + pz).astype(np.int32)

    def _parity_grid(self, lvl):
        return jnp.asarray(self._parity_grid_np(lvl))
