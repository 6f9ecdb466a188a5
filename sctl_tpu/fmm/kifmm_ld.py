"""Extended-precision (80-bit longdouble) host KIFMM evaluator — the
framework's analogue of the reference's QuadReal / long-double FMM path
(math_utils.hpp:236-300 defines QuadReal; the reference's FMM/GMRES
test drivers run in long double, src/test-gmres.cpp:1-20,
src/test-fmm.cpp).

Why it exists (measured, BASELINE.md accuracy ladder): the f64 KIFMM
plateaus at ~7e-9 regardless of p, depth, rcond, or table-construction
precision.  The one-hop decomposition shows the two binding limiters
are (a) f64 KERNEL MATRICES feeding the equivalent-surface pinv — any
rcond tighter than ~1e-10 inverts f64 noise (rcond=1e-11 tables are
4e-7 even under longdouble arithmetic) — and (b) the stored
1/rcond-amplified table products themselves.  This evaluator removes
both: the uc2e/dc2e pseudo-inverses are built from LONGDOUBLE kernel
matrices (f64-SVD rank cut + Newton-Schulz longdouble refinement, the
`_pinv_ns` discipline), and every translation interaction (S2M checks,
M2M, M2L, L2L, L2T, P2P) evaluates its kernel matrix on the fly in
longdouble — no stored amplified products at all.  Measured one-hop at
p=12, rcond=1e-11: 3.7e-10 (vs 6.8e-9 for the best f64 pipeline rung).

This is a HOST path (numpy longdouble has no TPU analogue): use it for
accuracy-critical small/medium solves and as the oracle for the f64
ladder, exactly how the reference uses its QuadReal configuration.
M2L cost is kept linear by evaluating one kernel matrix per
(level, offset) and batching all boxes that share the offset into one
GEMM — the same translation-invariance the device engine exploits.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..ops.kernels import KernelSpec
from ..ops.kernels_np import full_matrix_np
from ..tree.tree import UniformTree
from ..tree import morton as mt
from .kifmm import RAD_IN, RAD_OUT, cube_surface, _vlist_offsets

LD = np.longdouble


def _kmat_ld(ker: KernelSpec, xt, xs, ns=None) -> np.ndarray:
    """(Nt*k1, Ns*k0) longdouble kernel matrix (u = M @ f)."""
    return full_matrix_np(ker, np.asarray(xt, LD), np.asarray(xs, LD),
                          None if ns is None else np.asarray(ns, LD)).T


def _pinv_ld(A: np.ndarray, rcond: float) -> np.ndarray:
    """Pseudo-inverse of a longdouble matrix: f64 SVD selects the
    retained subspace at `rcond`, Newton-Schulz iterations against the
    longdouble A refine within it (kifmm._pinv_ns discipline;
    reference precompute-in-QuadReal pattern, ode-solver.txx:77-112)."""
    Af = np.asarray(A, np.float64)
    U, s, Vt = np.linalg.svd(Af, full_matrices=False)
    r = max(1, int((s > rcond * s[0]).sum()))
    X = ((Vt[:r].T / s[:r]) @ U[:, :r].T).astype(LD)
    I = np.eye(A.shape[0], dtype=LD)
    from ..quadmath import ld_gemm
    for _ in range(4):
        # sliced error-free GEMMs (quadmath.ld_gemm) — BLAS speed with
        # accuracy beyond longdouble's, vs numpy's scalar ld matmul
        X = ld_gemm(X, 2 * I - ld_gemm(np.asarray(A, LD), X))
    return X


def _level_coords(lvl: int) -> np.ndarray:
    """(8^lvl, 3) integer grid coords of level-lvl boxes in Morton
    index order."""
    n_b = 1 << (3 * lvl)
    D = mt.max_depth(3)
    keys = (np.arange(n_b, dtype=np.uint64)
            << np.uint64(3 * (D - lvl)))
    return mt.box_coords(keys, lvl, 3).astype(np.int64)


class KIFMMLd:
    """Uniform-tree KIFMM evaluated entirely in longdouble on the host
    (see module docstring).  API mirrors `KIFMM`: setup(x_src, x_trg,
    n_src).eval(f) -> (Nt, k1) potentials in input order."""

    def __init__(self, ker_s2t: KernelSpec, p: int = 10,
                 depth: int = 2, rcond: float = 1e-11,
                 ker_l2t: Optional[KernelSpec] = None,
                 ker_s2m: Optional[KernelSpec] = None):
        from .kifmm import KIFMM
        proto = KIFMM(ker_s2t, p=p, ker_l2t=ker_l2t, ker_s2m=ker_s2m,
                      use_pallas_p2p=False, use_pallas_m2l=False,
                      use_pallas_sl=False)
        self.ker_s2t = proto.ker_s2t
        self.ker_trans = proto.ker_trans
        self.ker_l2t = proto.ker_l2t
        self.ker_s2m = proto.ker_s2m
        self.p = p
        self.depth = depth
        self.rcond = rcond

    # -- setup -------------------------------------------------------------
    def setup(self, x_src, x_trg, n_src=None):
        L = self.depth
        if L < 2:
            raise ValueError("depth must be >= 2")
        x_src = np.asarray(x_src, np.float64)
        x_trg = np.asarray(x_trg, np.float64)
        both = np.concatenate([x_src, x_trg])
        bbox = (both.min(0), both.max(0))
        self.src_tree = UniformTree(x_src, L, bbox=bbox)
        self.trg_tree = UniformTree(x_trg, L, bbox=bbox)
        self.scale = self.src_tree.scale
        self._n_src_sorted = (None if n_src is None else
                              np.asarray(n_src, np.float64)[
                                  self.src_tree.perm])

        surf = np.asarray(cube_surface(self.p), LD)
        self.n_surf = len(surf)
        # per-level origin-centered surfaces (side_l = scale / 2^l);
        # the two pinvs per level are disk-cached under SCTL_DATA_PATH
        # (the reference's cached-tables discipline, common.hpp:9-11) —
        # keyed on the level side length since the surfaces scale
        # with the tree bbox
        import os
        from ..config import config
        self.s_in, self.s_out, self.uc2e, self.dc2e = {}, {}, {}, {}
        for l in range(2, L + 1):
            lam = LD(self.scale) / (1 << l)
            self.s_in[l] = surf * (LD(RAD_IN) * lam / 2)
            self.s_out[l] = surf * (LD(RAD_OUT) * lam / 2)
            key = (f"kifmm_ld_{self.ker_trans.name}_p{self.p}"
                   f"_r{self.rcond:.3g}_lam{float(lam):.9g}.npz")
            path = os.path.join(config.data_path, key)
            if os.path.exists(path):
                z = np.load(path)
                self.uc2e[l] = z["uc2e"].astype(LD)
                self.dc2e[l] = z["dc2e"].astype(LD)
                continue
            self.uc2e[l] = _pinv_ld(
                _kmat_ld(self.ker_trans, self.s_out[l], self.s_in[l]),
                self.rcond)
            self.dc2e[l] = _pinv_ld(
                _kmat_ld(self.ker_trans, self.s_in[l], self.s_out[l]),
                self.rcond)
            try:
                os.makedirs(config.data_path, exist_ok=True)
                np.savez(path, uc2e=self.uc2e[l], dc2e=self.dc2e[l])
            except OSError:
                pass
        self.offsets, _ = _vlist_offsets()
        return self

    # -- helpers -----------------------------------------------------------
    def _ctr(self, lvl: int) -> np.ndarray:
        """(8^lvl, 3) longdouble box centers at level lvl."""
        c = _level_coords(lvl).astype(LD)
        n_l = 1 << lvl
        ctr01 = (c + 0.5) / n_l
        return ctr01 * LD(self.scale) + np.asarray(
            self.src_tree.offset, LD)

    # -- eval --------------------------------------------------------------
    def eval(self, f) -> np.ndarray:
        L = self.depth
        st, tt = self.src_tree, self.trg_tree
        k0 = self.ker_s2t.kdim0
        k1 = self.ker_l2t.kdim1
        k0t = self.ker_trans.kdim0          # equiv-density dof / point
        k1t = self.ker_trans.kdim1
        nsrf = self.n_surf
        f = np.asarray(f, LD).reshape(-1, k0)
        f_sorted = f[st.perm]
        xs = np.asarray(st.X_sorted, LD)
        xt = np.asarray(tt.X_sorted, LD)
        ns_s = (None if self._n_src_sorted is None
                else np.asarray(self._n_src_sorted, LD))

        B = st.n_boxes
        sdsp, scnt = st.box_dsp, st.box_cnt
        tdsp, tcnt = tt.box_dsp, tt.box_cnt
        ctr_L = self._ctr(L)

        # ---- S2M: leaf check potentials -> up equivalents ----
        q_up = {L: np.zeros((B, nsrf * k0t), LD)}
        for b in np.nonzero(scnt)[0]:
            s0, s1 = sdsp[b], sdsp[b + 1]
            K = _kmat_ld(self.ker_s2m, self.s_out[L] + ctr_L[b],
                         xs[s0:s1],
                         None if ns_s is None else ns_s[s0:s1])
            q_up[L][b] = self.uc2e[L] @ (K @ f_sorted[s0:s1].ravel())

        # ---- M2M upward (on-the-fly octant kernels) ----
        child_pos = np.array([[c & 1, (c >> 1) & 1, (c >> 2) & 1]
                              for c in range(8)], dtype=np.int64)
        for l in range(L, 2, -1):
            side = LD(self.scale) / (1 << l)
            Bp = 1 << (3 * (l - 1))
            u_chk = np.zeros((Bp, nsrf * k1t), LD)
            for c in range(8):
                cc = (np.asarray(child_pos[c], LD) - 0.5) * side
                K = _kmat_ld(self.ker_trans, self.s_out[l - 1],
                             self.s_in[l] + cc)
                u_chk += q_up[l][c::8] @ K.T
            q_up[l - 1] = u_chk @ self.uc2e[l - 1].T

        # ---- M2L + L2L downward: check potentials per level ----
        q_dn = {}
        for l in range(2, L + 1):
            n_l = 1 << l
            Bl = 1 << (3 * l)
            side = LD(self.scale) / (1 << l)
            coords = _level_coords(l)
            # dense grid index: morton order <-> raster via coords
            u_chk = np.zeros((Bl, nsrf * k1t), LD)
            # M2L: batch boxes per offset (translation invariance)
            lin = (coords[:, 0] * n_l + coords[:, 1]) * n_l \
                + coords[:, 2]
            mort_of_lin = np.empty(Bl, np.int64)
            mort_of_lin[lin] = np.arange(Bl)
            for d in self.offsets:
                sc = coords + d[None, :]
                ok = np.all((sc >= 0) & (sc < n_l), axis=1)
                # parents must be adjacent (V-list criterion)
                ok &= np.all(np.abs((coords >> 1)
                                    - (sc >> 1)) <= 1, axis=1)
                if not ok.any():
                    continue
                tidx = np.nonzero(ok)[0]
                sl = (sc[tidx, 0] * n_l + sc[tidx, 1]) * n_l \
                    + sc[tidx, 2]
                sidx = mort_of_lin[sl]
                qs = q_up[l][sidx]
                if not np.abs(qs).any():
                    continue
                K = _kmat_ld(self.ker_trans, self.s_in[l],
                             self.s_in[l] + np.asarray(d, LD) * side)
                u_chk[tidx] += qs @ K.T
            # L2L: parent down-equivalent -> child down-check
            if l > 2:
                for c in range(8):
                    cc = (np.asarray(child_pos[c], LD) - 0.5) * side
                    K = _kmat_ld(self.ker_trans, self.s_in[l] + cc,
                                 self.s_out[l - 1])
                    u_chk[c::8] += q_dn[l - 1] @ K.T
            q_dn[l] = u_chk @ self.dc2e[l].T

        # ---- L2T + P2P ----
        u = np.zeros((len(xt), k1), LD)
        nb = st.neighbor_boxes()
        for b in np.nonzero(tcnt)[0]:
            t0, t1 = tdsp[b], tdsp[b + 1]
            K = _kmat_ld(self.ker_l2t, xt[t0:t1],
                         self.s_out[L] + ctr_L[b])
            u[t0:t1] += (K @ q_dn[L][b]).reshape(t1 - t0, k1)
            for s in nb[b]:
                if s < 0 or scnt[s] == 0:
                    continue
                s0, s1 = sdsp[s], sdsp[s + 1]
                Kp = _kmat_ld(self.ker_s2t, xt[t0:t1], xs[s0:s1],
                              None if ns_s is None else ns_s[s0:s1])
                u[t0:t1] += (Kp @ f_sorted[s0:s1].ravel()
                             ).reshape(t1 - t0, k1)

        out = np.empty_like(u)
        out[tt.perm] = u
        return np.asarray(out, np.float64)
