"""Adaptive-tree KIFMM for strongly nonuniform point sets.

The production FMM role the reference fills with PVFMM (reference:
fmm-wrapper.txx:788-936 EvalPVFMM — adaptive octree, U/V/W/X
interaction lists, multipole/local translations); the uniform-tree
KIFMM (kifmm.py) covers moderate skew, but a surface-concentrated
point set (the BIE far field: points on a 2-D manifold in 3-D) blows
up dense per-level grids beyond depth ~6.  This module is the native
adaptive-tree implementation:

  tree      PtTree (adaptive, 2:1-balanced) on the sources; targets
            assigned to its leaves.
  nodes     per-level sorted node arrays (leaves + ancestors), with
            host-precomputed child->parent maps and interaction lists.
  upward    S2M per leaf (padded pairwise) -> M2M by level (8
            per-octant GEMMs with scatter-add).
  V list    per level, a lax.scan over the 316 relative offsets:
            gather source-node equivalents, GEMM with the offset's
            (compressed) M2L matrix, scatter-add into target locals.
  U list    leaf-leaf near field: per target leaf, gathered source
            slabs (points contiguous per leaf in the Morton sort),
            padded pairwise (2:1 balance bounds the slab count).
  W list    multipole-to-target: source-node up-equivalent surfaces
            enter the same padded pairwise as n_surf-point slabs.
  X list    point-to-local: leaf source points -> node down-check
            potentials, folded through dc2e.
  downward  L2L by level + L2T per leaf to its targets.

All interaction lists are host-precomputed padded index arrays
(latency-insensitive setup, like the reference's tree construction);
evaluation is one jitted program over them.

Operator tables (uc2e/dc2e/m2m/l2l/m2l) are the same KIFMMOperators
the uniform tree uses — the adaptive tree shares the disk cache.
"""

from __future__ import annotations

import functools

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .. import profile
from ..ops.kernels import KernelSpec, Laplace3D_FxU
from ..tree import morton as mt
from ..tree.tree import PtTree, _normalize
from .kifmm import KIFMMOperators, RAD_IN, RAD_OUT


def _pad_rows(row_ids: np.ndarray, vals: np.ndarray, n_rows: int,
              fill=-1):
    """Group vals by row id into an (n_rows, cap) padded matrix from
    flat pair lists (no per-row Python loop; the reference's cnt/dsp
    ragged discipline, tree.hpp:182-186)."""
    if len(vals) == 0:
        return np.full((n_rows, 1), fill, dtype=np.int64), 1
    order = np.argsort(row_ids, kind="stable")
    r = row_ids[order]
    v = vals[order]
    dsp = np.searchsorted(r, np.arange(n_rows + 1))
    cnt = np.diff(dsp)
    cap = max(1, int(cnt.max()))
    out = np.full((n_rows, cap), fill, dtype=np.int64)
    pos = np.arange(len(v)) - np.repeat(dsp[:-1], cnt)
    out[r, pos] = v
    return out, cap


class _NodeLevels:
    """Per-level sorted node sets of the adaptive tree: every leaf and
    every ancestor, with child->parent octant maps."""

    def __init__(self, leaf_keys: np.ndarray, leaf_lvl: np.ndarray,
                 dim: int = 3):
        D = mt.max_depth(dim)
        self.dim = dim
        self.max_lvl = int(leaf_lvl.max()) if len(leaf_lvl) else 0
        # leaves per level, then ancestors bottom-up (vectorized: one
        # shift + unique per level instead of per-key set inserts)
        keys = [np.sort(leaf_keys[leaf_lvl == l]).astype(np.uint64)
                for l in range(self.max_lvl + 1)]
        for l in range(self.max_lvl, 0, -1):
            shift = np.uint64(dim * (D - (l - 1)))
            par = (keys[l] >> shift) << shift
            keys[l - 1] = np.unique(np.concatenate([keys[l - 1], par]))
        self.keys = keys
        self.n = [len(k) for k in self.keys]
        # child -> (parent index, octant)
        self.parent_idx, self.octant = [None], [None]
        for l in range(1, self.max_lvl + 1):
            shift = np.uint64(dim * (D - (l - 1)))
            pk = (self.keys[l] >> shift) << shift
            pi = np.searchsorted(self.keys[l - 1], pk)
            oct_shift = np.uint64(dim * (D - l))
            octant = ((self.keys[l] >> oct_shift)
                      & np.uint64((1 << dim) - 1)).astype(np.int64)
            self.parent_idx.append(pi.astype(np.int64))
            self.octant.append(octant)

    def index_of(self, lvl: int, keys: np.ndarray):
        """Indices of keys in level lvl's sorted array; -1 if absent."""
        i = np.searchsorted(self.keys[lvl], keys)
        i = np.clip(i, 0, max(self.n[lvl] - 1, 0))
        ok = (self.n[lvl] > 0) & (self.keys[lvl][i] == keys)
        return np.where(ok, i, -1)


def _build_lists(nodes: _NodeLevels, leaf_keys, leaf_lvl, dim=3):
    """U/V/W/X interaction lists (the PVFMM/KIFMM standard sets) for a
    2:1-balanced linear octree.

    Definitions (for target leaf/node T, source S):
      V: same-level nodes, parents adjacent, not adjacent (offsets
         with |d|_inf in {2,3} after child-parity reduction).
      U: leaf T vs leaf S adjacent (incl. self; levels differ by <= 1
         under 2:1 balance) -> direct P2P.
      W: leaf T vs node S one level FINER, S's parent adjacent to T
         but S not adjacent to T -> multipole(S) -> targets(T).
      X: dual of W: node T one level finer than leaf S, S adjacent to
         T's parent, S not adjacent to T -> points(S) -> local(T).
    """
    D = mt.max_depth(dim)
    L = nodes.max_lvl
    n_leaf = len(leaf_keys)
    leaf_lvl = np.asarray(leaf_lvl, np.int64)
    leaf_keys = np.asarray(leaf_keys, np.uint64)

    is_leaf = [np.zeros(nodes.n[l], dtype=bool) for l in range(L + 1)]
    leaf_row_of_node = [np.full(nodes.n[l], -1, dtype=np.int64)
                        for l in range(L + 1)]
    for l in range(L + 1):
        rows = np.where(leaf_lvl == l)[0]
        if len(rows) == 0:
            continue
        idx = nodes.index_of(l, leaf_keys[rows])
        is_leaf[l][idx] = True
        leaf_row_of_node[l][idx] = rows

    ends = leaf_keys + (np.uint64(1) << (np.uint64(dim) * (
        np.uint64(D) - leaf_lvl.astype(np.uint64))))

    # lattice intervals at max depth for vectorized adjacency tests
    # (boxes adjacent iff closed intervals overlap in every dim)
    leaf_lo = mt.morton_decode(leaf_keys, dim).astype(np.int64)
    leaf_sz = (np.int64(1) << (D - leaf_lvl)).astype(np.int64)

    def _adj_leaf_leaf(i_arr, j_arr):
        lo1 = leaf_lo[i_arr]
        hi1 = lo1 + leaf_sz[i_arr][:, None]
        lo2 = leaf_lo[j_arr]
        hi2 = lo2 + leaf_sz[j_arr][:, None]
        return np.all((lo1 <= hi2) & (lo2 <= hi1), axis=1)

    def _adj_leaf_box(i_arr, box_keys, box_lvl):
        lo1 = leaf_lo[i_arr]
        hi1 = lo1 + leaf_sz[i_arr][:, None]
        lo2 = mt.morton_decode(np.asarray(box_keys, np.uint64),
                               dim).astype(np.int64)
        hi2 = lo2 + np.int64(1 << (D - box_lvl))
        return np.all((lo1 <= hi2) & (lo2 <= hi1), axis=1)

    # V list per level: for each node, neighbors of parent -> children
    # -> same-level nodes not adjacent
    V = {l: [] for l in range(2, L + 1)}   # (ti, si, offset_id)
    from .kifmm import _vlist_offsets
    offsets316, _ = _vlist_offsets()
    for l in range(2, L + 1):
        keys_l = nodes.keys[l]
        if nodes.n[l] == 0:
            continue
        coords = mt.box_coords(keys_l, l, dim)          # (n, 3)
        # candidate partners: nodes whose parents are adjacent.
        # For each node, enumerate the 316 offsets and keep those
        # present in the level's node set.
        side = 1 << l
        for oid, d in enumerate(offsets316):
            nc = coords + d[None, :]
            ok = np.all((nc >= 0) & (nc < side), axis=1)
            if not ok.any():
                continue
            nk = mt.coords_to_key(np.clip(nc, 0, side - 1), l, dim)
            si = nodes.index_of(l, nk)
            keep = ok & (si >= 0)
            # parent adjacency = the parity-validity rule; equivalent:
            # |floor((c + d)/2)|_inf <= 1 with c the child parity
            par = coords & 1
            pd = np.floor_divide(par + d[None, :], 2)
            keep &= (np.abs(pd).max(axis=1) <= 1)
            ti = np.where(keep)[0]
            V[l].append((ti, si[keep], oid))

    # U/W/X: all leaves of a level at once — sorted-range lookups on
    # the leaf array + lattice-interval adjacency; no per-leaf Python
    # loop (the round-2 per-leaf version took tens of minutes at 1e6
    # surface points; this is seconds)
    U_t, U_s = [], []                        # (target leaf, source leaf)
    W_lvl, W_leaf, W_node = [], [], []       # (src lvl, trg leaf, node)
    X_lvl, X_node, X_leaf = [], [], []       # (trg lvl, node, src leaf)
    for l in np.unique(leaf_lvl):
        l = int(l)
        sel = np.where(leaf_lvl == l)[0]
        k_l = leaf_keys[sel]
        m = len(sel)
        nbk, valid = mt.morton_neighbors(k_l, l, dim)       # (m, 26)
        cand = np.concatenate([k_l[:, None], nbk], axis=1)  # (m, 27)
        cval = np.concatenate([np.ones((m, 1), bool), valid], axis=1)
        ck = cand.reshape(-1)
        cv = cval.reshape(-1)
        ci = np.repeat(sel, cand.shape[1])      # owning target leaf row

        # U (a): coarser leaf containing the candidate box
        j0 = np.searchsorted(leaf_keys, ck, side="left")
        jm = np.clip(j0 - 1, 0, n_leaf - 1)
        okm = cv & (j0 > 0) & (ck < ends[jm]) & (leaf_lvl[jm] <= l)
        tm, sm = ci[okm], jm[okm]
        keepm = _adj_leaf_leaf(tm, sm)
        U_t.append(tm[keepm])
        U_s.append(sm[keepm])

        # U (b): leaves inside [ck, ck_end) with level <= l+1 (deeper
        # leaves in an adjacent box cannot touch the target under 2:1;
        # their far contribution arrives via W)
        ck_end = ck + (np.uint64(1) << np.uint64(dim * (D - l)))
        j1 = np.searchsorted(leaf_keys, ck_end, side="left")
        cnt = np.where(cv, j1 - j0, 0).astype(np.int64)
        ti = np.repeat(ci, cnt)
        pos = (np.arange(int(cnt.sum()))
               - np.repeat(np.cumsum(cnt) - cnt, cnt))
        jj = np.repeat(j0, cnt) + pos
        keep = leaf_lvl[jj] <= l + 1
        ti, jj = ti[keep], jj[keep]
        keep2 = _adj_leaf_leaf(ti, jj)
        U_t.append(ti[keep2])
        U_s.append(jj[keep2])

        # W/X: children (level l+1) of candidate boxes present in the
        # node set and NOT adjacent to the leaf -> multipole-to-target;
        # X is the exact dual (node receives from the leaf's points)
        if l + 1 <= L and nodes.n[l + 1]:
            ch = mt.morton_children(ck, l, dim)             # (m*27, 8)
            chf = ch.reshape(-1)
            si = nodes.index_of(l + 1, chf)
            ok = np.repeat(cv, 1 << dim) & (si >= 0)
            iw, siw, chw = np.repeat(ci, 1 << dim)[ok], si[ok], chf[ok]
            adj = _adj_leaf_box(iw, chw, l + 1)
            iw, siw = iw[~adj], siw[~adj]
            W_lvl.append(np.full(len(iw), l + 1, np.int64))
            W_leaf.append(iw)
            W_node.append(siw)
            X_lvl.append(np.full(len(iw), l + 1, np.int64))
            X_node.append(siw)
            X_leaf.append(iw)

    UT = np.concatenate(U_t) if U_t else np.zeros(0, np.int64)
    US = np.concatenate(U_s) if U_s else np.zeros(0, np.int64)
    U_pairs = np.unique(np.stack([UT, US], 1), axis=0) \
        if len(UT) else np.zeros((0, 2), np.int64)
    W = (np.concatenate(W_lvl) if W_lvl else np.zeros(0, np.int64),
         np.concatenate(W_leaf) if W_leaf else np.zeros(0, np.int64),
         np.concatenate(W_node) if W_node else np.zeros(0, np.int64))
    X = (np.concatenate(X_lvl) if X_lvl else np.zeros(0, np.int64),
         np.concatenate(X_node) if X_node else np.zeros(0, np.int64),
         np.concatenate(X_leaf) if X_leaf else np.zeros(0, np.int64))
    return V, U_pairs, W, X, is_leaf, leaf_row_of_node


class AdaptiveFMM:
    """Adaptive-tree KIFMM evaluator (PVFMM role, fmm-wrapper.txx:788).

    Same public shape as KIFMM: setup(x_src, x_trg, n_src) then
    eval(f) / eval_jnp(f)."""

    def __init__(self, ker_s2t: KernelSpec, p: int = 6,
                 max_pts: int = 256,
                 ker_l2t: Optional[KernelSpec] = None,
                 ker_s2m: Optional[KernelSpec] = None,
                 dtype=None, use_pallas_ulist: Optional[bool] = None):
        import jax
        from .kifmm import KIFMM
        # reuse KIFMM's kernel-role deduction
        proto = KIFMM(ker_s2t, p=p, ker_l2t=ker_l2t, ker_s2m=ker_s2m,
                      dtype=dtype, use_pallas_p2p=False)
        self.ker_s2t = proto.ker_s2t
        self.ker_trans = proto.ker_trans
        self.ker_l2t = proto.ker_l2t
        self.ker_s2m = proto.ker_s2m
        self.p = p
        self.max_pts = max_pts
        self.dtype = proto.dtype
        # U list through the per-box Pallas kernel on real TPU (the
        # reference hot loop, generic-kernel.txx:76-189); XLA
        # apply_pairwise elsewhere
        if use_pallas_ulist is None:
            use_pallas_ulist = jax.default_backend() in ("tpu", "axon")
        self.use_pallas_ulist = use_pallas_ulist

    # -- setup -----------------------------------------------------------
    def setup(self, x_src, x_trg, n_src=None, skeleton=None):
        """skeleton: optional (leaf_keys, leaf_levels) of an already-
        built 2:1-balanced linear octree over the SAME normalization
        (e.g. from DistPtTree.build_fn with bbox=(offset, scale)) —
        the host refinement loop is skipped and the given skeleton is
        adopted verbatim (VERDICT r4 #4: no duplicate tree build in
        the distributed pipeline; reference: the tree is built once,
        tree.txx:134-333)."""
        if (self.ker_s2t.needs_normal or self.ker_s2m.needs_normal) \
                and n_src is None:
            raise ValueError(
                f"kernel {self.ker_s2t.name} requires source normals")
        x_src = np.asarray(x_src, np.float64)
        x_trg = np.asarray(x_trg, np.float64)
        dim = 3
        # shared bbox so source/target keys agree
        allpts = np.concatenate([x_src, x_trg])
        _, off, sc = _normalize(allpts)
        self.offset, self.scale = off, sc

        tree = PtTree(dim=dim)
        tree.offset, tree.scale = off, sc
        # build on sources with the shared normalization
        X01 = (x_src - off) / sc
        keys = mt.morton_encode(X01, dim=dim)
        tree.perm = np.argsort(keys, kind="stable")
        tree.X_sorted = x_src[tree.perm]
        skeys = keys[tree.perm]
        if skeleton is not None:
            lk, ll = skeleton
            order = np.argsort(lk, kind="stable")
            tree.leaf_keys = np.asarray(lk, np.uint64)[order]
            tree.leaf_levels = np.asarray(ll, np.int32)[order]
        else:
            # reuse PtTree's refinement loop on the pre-sorted keys
            self._refine(tree, skeys, dim, self.max_pts)
        tree._skeys = skeys
        tree.leaf_dsp = np.searchsorted(skeys, tree.leaf_keys)
        tree.leaf_cnt = np.diff(np.append(tree.leaf_dsp, len(skeys)))
        self.tree = tree

        nodes = _NodeLevels(tree.leaf_keys, tree.leaf_levels, dim)
        self.nodes = nodes
        (V, U_pairs, (w_lvl, w_leaf, w_node),
         (x_lvl, x_node, x_leaf), is_leaf,
         leaf_row_of_node) = _build_lists(
            nodes, tree.leaf_keys, tree.leaf_levels, dim)

        L = nodes.max_lvl
        self.L = L
        self._ops = KIFMMOperators(self.ker_s2t, self.ker_trans,
                                   self.ker_l2t, self.p, L, sc,
                                   self.dtype)
        ops = self._ops
        ns = ops.n_surf * ops.k0t
        self.ns = ns
        dt = self.dtype

        # targets -> leaves (same normalization)
        tkeys = mt.morton_encode((x_trg - off) / sc, dim=dim)
        t_perm = np.argsort(tkeys, kind="stable")
        tk_sorted = tkeys[t_perm]
        t_leaf = np.clip(np.searchsorted(tree.leaf_keys, tk_sorted,
                                         side="right") - 1, 0,
                         len(tree.leaf_keys) - 1)
        self._t_perm = t_perm
        n_leaf = len(tree.leaf_keys)

        # padded per-leaf point arrays
        cap_s = max(8, int(tree.leaf_cnt.max()))
        t_dsp = np.searchsorted(t_leaf, np.arange(n_leaf + 1))
        t_cnt = np.diff(t_dsp)
        cap_t = max(8, int(t_cnt.max()))
        self.cap_s, self.cap_t = cap_s, cap_t

        sidx = tree.leaf_dsp[:, None] + np.arange(cap_s)[None, :]
        svalid = sidx < (tree.leaf_dsp + tree.leaf_cnt)[:, None]
        sidx = np.clip(sidx, 0, len(x_src) - 1)
        tidx = t_dsp[:-1, None] + np.arange(cap_t)[None, :]
        tvalid = tidx < t_dsp[1:, None]
        tidx = np.clip(tidx, 0, max(len(x_trg) - 1, 0))
        xt_sorted = x_trg[t_perm]
        ns_sorted = (np.asarray(n_src, np.float64)[tree.perm]
                     if n_src is not None else np.zeros_like(
                         tree.X_sorted))

        # leaf centers and levels
        lvl = tree.leaf_levels.astype(np.int64)
        lat = mt.morton_decode(tree.leaf_keys, dim)
        D = mt.max_depth(dim)
        side01 = (1.0 / (1 << lvl))
        ctr = ((lat.astype(np.float64) / (1 << D))
               + side01[:, None] / 2) * sc + off

        data = {
            "xs_pad": jnp.asarray(np.asarray(tree.X_sorted[sidx], dt)),
            "ns_pad": jnp.asarray(np.asarray(ns_sorted[sidx], dt)),
            "s_valid": jnp.asarray(svalid),
            "xt_pad": jnp.asarray(np.asarray(xt_sorted[tidx], dt)),
            "t_valid": jnp.asarray(tvalid),
            "leaf_lvl": jnp.asarray(lvl, jnp.int32),
            "ctr": jnp.asarray(np.asarray(ctr, dt)),
        }
        self._svalid_np = svalid
        self._sidx_np = sidx
        self._tidx_np = tidx
        self._tvalid_np = tvalid

        # per-level constant tables (host-converted to dt BEFORE the
        # upload: f64 bytes over the tunnel + a device convert dispatch
        # per table measured ~2x the table-upload cost)
        hc = lambda a: jnp.asarray(np.asarray(a, dt))
        data["uc2e"] = tuple(hc(a) for a in ops.uc2e)
        data["dc2e"] = tuple(hc(a) for a in ops.dc2e)
        data["m2m"] = tuple(hc(a) for a in ops.m2m)
        data["l2l"] = tuple(hc(a) for a in ops.l2l)
        data["m2l_u"] = tuple(hc(a) for a in ops.m2l_u)
        data["m2l_c"] = tuple(hc(a) for a in ops.m2l_c)
        data["surf_in"] = tuple(hc(a) for a in ops.surf_in)
        data["surf_out"] = tuple(hc(a) for a in ops.surf_out)

        # node maps
        data["parent_idx"] = tuple(
            jnp.asarray(nodes.parent_idx[l], jnp.int32)
            for l in range(1, L + 1))
        data["octant"] = tuple(jnp.asarray(nodes.octant[l], jnp.int32)
                               for l in range(1, L + 1))
        data["leaf_node_idx"] = tuple(
            jnp.asarray(np.where(leaf_row_of_node[l] >= 0)[0],
                        jnp.int32) for l in range(L + 1))
        data["leaf_node_row"] = tuple(
            jnp.asarray(leaf_row_of_node[l][leaf_row_of_node[l] >= 0],
                        jnp.int32) for l in range(L + 1))
        # node centers per level
        nodectr = []
        for l in range(L + 1):
            latl = mt.morton_decode(nodes.keys[l], dim) \
                if nodes.n[l] else np.zeros((0, dim), np.uint64)
            c = ((latl.astype(np.float64) / (1 << D))
                 + (1.0 / (1 << l)) / 2) * sc + off
            nodectr.append(jnp.asarray(c, dt))
        data["node_ctr"] = tuple(nodectr)

        # V lists: per level, concatenated (ti, si, oid) sorted by oid
        # (host copies kept for the vtab build below — re-reading the
        # device arrays would be a device->host transfer of the whole
        # pair list, ~26 s/level over the axon tunnel)
        vli = []
        vli_np = []
        for l in range(2, L + 1):
            tis, sis, oids = [], [], []
            for (ti, si, oid) in V.get(l, []):
                tis.append(ti)
                sis.append(si)
                oids.append(np.full(len(ti), oid, np.int64))
            if tis:
                ti = np.concatenate(tis)
                si = np.concatenate(sis)
                oid = np.concatenate(oids)
                order = np.argsort(oid, kind="stable")
                ti, si, oid = ti[order], si[order], oid[order]
                vli_np.append((ti, si, oid))
                vli.append((jnp.asarray(ti, jnp.int32),
                            jnp.asarray(si, jnp.int32),
                            jnp.asarray(oid, jnp.int32)))
            else:
                vli_np.append((np.zeros(0, np.int64),) * 3)
                vli.append((jnp.zeros(0, jnp.int32),) * 3)
        data["vlist"] = tuple(vli)

        # U list: per target leaf, padded source-leaf ids
        U_pad, self.u_cap = _pad_rows(U_pairs[:, 0], U_pairs[:, 1],
                                      n_leaf)
        data["ulist"] = jnp.asarray(U_pad, jnp.int32)

        # W list: per target leaf, padded (finer) node ids per level
        wl = []
        for l in range(1, L + 1):
            msk = w_lvl == l
            if not msk.any():
                wl.append(None)
                continue
            pad, _ = _pad_rows(w_leaf[msk], w_node[msk], n_leaf)
            wl.append(jnp.asarray(pad, jnp.int32))
        self._wlist = wl
        data["wlist_t"] = tuple(wl)
        # W pairs as flat per-level (target_leaf, source_node) tables:
        # the padded slab form above scans ALL n_leaf leaves at every
        # slab step — measured 5.1 s of the 6.9 s 2e6-point surface
        # eval (74%), with real W pairs ~2% of the scanned slots.  The
        # eval path walks these packed pairs instead (same design as
        # vtab); wlist_t stays for adaptive_dist's ghost routing.
        wp = []
        for l in range(1, L + 1):
            msk = w_lvl == l
            wp.append((jnp.asarray(w_leaf[msk], jnp.int32),
                       jnp.asarray(w_node[msk], jnp.int32)))
        data["wpairs"] = tuple(wp)

        # X list: per (level, node), padded source-leaf ids
        xl = []
        for l in range(1, L + 1):
            msk = x_lvl == l
            if not msk.any():
                xl.append(None)
                continue
            pad, _ = _pad_rows(x_node[msk], x_leaf[msk], nodes.n[l])
            xl.append(jnp.asarray(pad, jnp.int32))
        self._xlist = xl
        data["xlist_t"] = tuple(xl)

        # per (level, octant) child/parent row groups for M2M/L2L
        oct_groups = []
        for l in range(1, L + 1):
            groups = []
            for c in range(1 << dim):
                rows = np.where(nodes.octant[l] == c)[0]
                groups.append((jnp.asarray(rows, jnp.int32),
                               jnp.asarray(nodes.parent_idx[l][rows],
                                           jnp.int32)))
            oct_groups.append(tuple(groups))
        data["oct_groups"] = tuple(oct_groups)

        # V pairs as (316, Pcap) padded per-offset tables per level
        # (_pad_rows uses one stable sort by oid: ti and si stay
        # aligned because identical keys keep their relative order)
        vtab = []
        for li, l in enumerate(range(2, L + 1)):
            ti, si, oid = vli_np[li]
            tpad, _ = _pad_rows(oid, ti, 316)
            spad, _ = _pad_rows(oid, si, 316)
            vtab.append((jnp.asarray(tpad, jnp.int32),
                         jnp.asarray(spad, jnp.int32)))
        data["vtab"] = tuple(vtab)

        self._data = data
        self._eval_jit = None
        return self

    # -- density / output plumbing ---------------------------------------
    def _pad_density(self, f):
        f = np.asarray(f, np.float64).reshape(-1, self.ker_s2t.kdim0)
        fs = f[self.tree.perm]
        fp = fs[self._sidx_np] * self._svalid_np[..., None]
        return jnp.asarray(fp, self.dtype)

    def eval(self, f) -> np.ndarray:
        fp = self._pad_density(f)
        if self._eval_jit is None:
            self._eval_jit = jax.jit(self._eval_impl)
        with profile.Profile.scoped("AdaptiveFMM::Eval"):
            u_pad = self._eval_jit(fp, self._data)
        k1 = self.ker_l2t.kdim1
        u = np.asarray(u_pad).reshape(-1, k1)[
            self._tvalid_np.reshape(-1)]
        out = np.empty((len(self._t_perm), k1))
        out[self._t_perm] = u
        return out

    def eval_params(self):
        """Pytree of every device array eval_jnp needs, meant to
        travel as a jit ARGUMENT — embedding them as closure
        constants bloats the compile payload by the full point set
        (the same discipline as KIFMM setup's _data)."""
        if getattr(self, "_io_idx", None) is None:
            self._io_idx = {
                "perm": jnp.asarray(self.tree.perm, jnp.int32),
                "sidx": jnp.asarray(self._sidx_np, jnp.int32),
                "svalid": jnp.asarray(self._svalid_np, self.dtype),
                "t_perm": jnp.asarray(self._t_perm, jnp.int32),
                "t_take": jnp.asarray(np.nonzero(
                    self._tvalid_np.reshape(-1))[0], jnp.int32),
            }
        return {"data": self._data, "io": self._io_idx}

    def eval_jnp(self, f, params=None) -> jnp.ndarray:
        """Traced: f (n_src, k0) original order -> (n_trg, k1).
        Pass `params=eval_params()` through your jit arguments to
        keep the tables out of the compile payload."""
        if params is None:
            params = self.eval_params()
        data, io = params["data"], params["io"]
        k0 = self.ker_s2t.kdim0
        f = jnp.asarray(f, self.dtype).reshape(-1, k0)
        fs = f[io["perm"]]
        fp = fs[io["sidx"]] * io["svalid"][..., None]
        u_pad = self._eval_impl(fp, data)
        k1 = self.ker_l2t.kdim1
        u_flat = u_pad.reshape(-1, k1)
        out = jnp.zeros((len(self._t_perm), k1), u_flat.dtype)
        return out.at[io["t_perm"]].set(u_flat[io["t_take"]])

    # -- evaluation -------------------------------------------------------
    def _eval_impl(self, fp, data, shard=None):
        """Full adaptive-FMM evaluation.  With shard=(ndev, axis_name)
        (inside shard_map) the pairwise leaf/node stages — S2M, X,
        L2T, W, U, i.e. all the O(N) work — are split across devices
        by index blocks and the per-level moments / outputs are
        psum'd; node-level translations (M2M, V, L2L, <10% of flops)
        are computed replicated (identical on every device)."""
        nodes = self.nodes
        L = self.L
        ns = self.ns
        dim = 3
        dt = self.dtype
        hi = lax.Precision.HIGHEST
        n_leaf = len(self.tree.leaf_keys)
        xs_pad, ns_pad = data["xs_pad"], data["ns_pad"]
        xt_pad = data["xt_pad"]
        k1t = self._ops.k1t

        if shard is not None:
            ndev, ax = shard
            dev_i = lax.axis_index(ax)

            def my_block(m):
                """Device's index block of range(m): (cap,) ids,
                -1-padded."""
                cap = max(1, -(-m // ndev))
                ids = jnp.pad(jnp.arange(m, dtype=jnp.int32),
                              (0, cap * ndev - m), constant_values=-1)
                return lax.dynamic_slice(ids, (dev_i * cap,), (cap,))
        else:
            my_block = lambda m: jnp.arange(m, dtype=jnp.int32)

        # ---- S2M: per-leaf check potentials -> up equivalents --------
        q_up = [jnp.zeros((max(nodes.n[l], 1), ns), dt)
                for l in range(L + 1)]
        for l in range(1, L + 1):
            rows = data["leaf_node_row"][l]         # leaf ids at lvl l
            nidx = data["leaf_node_idx"][l]
            if rows.shape[0] == 0:
                continue
            blk = my_block(rows.shape[0])
            ok = blk >= 0
            rows_d = rows[jnp.where(ok, blk, 0)]
            nidx_d = nidx[jnp.where(ok, blk, 0)]
            ctr_l = data["ctr"][rows_d]
            xck = data["surf_out"][l][None] + ctr_l[:, None, :]

            def s2m_box(args):
                xc, xs, nrm, fb = args
                return self.ker_s2m.apply_pairwise(xc, xs, nrm, fb)

            u_check = lax.map(
                s2m_box,
                (xck, xs_pad[rows_d], ns_pad[rows_d], fp[rows_d]),
                batch_size=max(1, min(rows_d.shape[0], 4096)))
            u_check = u_check.reshape(rows_d.shape[0], -1) \
                * self.ker_s2m.scale_factor
            qv = jnp.einsum("mn,bn->bm", data["uc2e"][l], u_check,
                            precision=hi)
            q_up[l] = q_up[l].at[
                jnp.where(ok, nidx_d, q_up[l].shape[0])].add(
                qv * ok[:, None].astype(dt), mode="drop")
        if shard is not None:
            q_up = [lax.psum(q, ax) for q in q_up]

        # ---- M2M upward ----
        for l in range(L, 1, -1):
            for c in range(1 << dim):
                rows, par = data["oct_groups"][l - 1][c]
                if rows.shape[0] == 0:
                    continue
                mat = data["m2m"][l - 1][c]
                q_up[l - 1] = q_up[l - 1].at[par].add(
                    jnp.einsum("bn,mn->bm", q_up[l][rows], mat,
                               precision=hi))

        # ---- V list (M2L) + X list -> down equivalents ----
        q_dn = [jnp.zeros((max(nodes.n[l], 1), ns), dt)
                for l in range(L + 1)]
        for li, l in enumerate(range(2, L + 1)):
            tpad, spad = data["vtab"][li]           # (316, Pcap)
            if tpad.shape[1] == 0:
                continue
            U = data["m2l_u"][l]
            r = U.shape[1]

            def v_step(acc, blk, l=l):
                tp, sp, C = blk                     # C (r, ns)
                ok = tp >= 0
                qs = q_up[l][jnp.where(ok, sp, 0)] \
                    * ok[:, None].astype(dt)
                contrib = jnp.einsum("bn,rn->br", qs, C, precision=hi)
                return acc.at[jnp.where(ok, tp, acc.shape[0])].add(
                    contrib, mode="drop"), None

            acc0 = jnp.zeros((max(nodes.n[l], 1), r), dt)
            acc, _ = lax.scan(
                v_step, acc0,
                (tpad, spad, data["m2l_c"][l]))
            q_dn[l] = q_dn[l] + jnp.einsum("br,nr->bn", acc, U,
                                           precision=hi)

        # X list: leaf source points -> node down-check -> dc2e
        # (accumulated separately so the sharded psum does not double
        # the replicated V contribution)
        qx = {}
        for l in range(1, L + 1):
            xl = data["xlist_t"][l - 1]
            if xl is None:
                continue
            K = xl.shape[1]
            blk = my_block(nodes.n[l])
            okb = blk >= 0
            nid = jnp.where(okb, blk, 0)
            xck = (data["surf_in"][l][None]
                   + data["node_ctr"][l][nid][:, None])

            # scan over the slab axis: the per-node all-slabs gather
            # materialized a (batch, K*cap_s, 3) block whose 3-lane
            # minor dim XLA pads to 128 inside the vmapped gather
            # (measured 42x HBM expansion -> chip OOM on the 1e5-unk
            # BIE bench); one slab per step keeps every intermediate
            # at (n_nodes, cap_s, 3)
            xln = xl[nid]                            # (n_nodes, K)

            def x_slab(acc, k, K=K):
                slabs = xln[:, k]
                ok = slabs >= 0
                rows = jnp.where(ok, slabs, 0)

                def x_node(args):
                    xc, xs, nr, fb = args
                    return self.ker_s2m.apply_pairwise(xc, xs, nr, fb)

                u_k = lax.map(
                    x_node,
                    (xck, xs_pad[rows], ns_pad[rows],
                     fp[rows] * ok[:, None, None].astype(dt)),
                    batch_size=max(1, min(nid.shape[0], 4096)))
                return acc + u_k.reshape(acc.shape), None

            nsck = xck.shape[1] * self.ker_s2m.kdim1
            u_checkX, _ = lax.scan(
                x_slab, jnp.zeros((nid.shape[0], nsck), dt),
                jnp.arange(K))
            u_checkX = u_checkX * self.ker_s2m.scale_factor
            qc = jnp.einsum("mn,bn->bm", data["dc2e"][l], u_checkX,
                            precision=hi)
            qx[l] = jnp.zeros_like(q_dn[l]).at[
                jnp.where(okb, nid, q_dn[l].shape[0])].add(
                qc * okb[:, None].astype(dt), mode="drop")
        if shard is not None and qx:
            qx = {l: lax.psum(v, ax) for l, v in qx.items()}
        for l, v in qx.items():
            q_dn[l] = q_dn[l] + v

        # ---- L2L downward ----
        for l in range(2, L + 1):
            for c in range(1 << dim):
                rows, par = data["oct_groups"][l - 1][c]
                if rows.shape[0] == 0:
                    continue
                mat = data["l2l"][l - 1][c]
                q_dn[l] = q_dn[l].at[rows].add(
                    jnp.einsum("bn,mn->bm", q_dn[l - 1][par], mat,
                               precision=hi))

        # ---- L2T + W + U per target leaf ----
        k0_l2t = self.ker_l2t.kdim0
        u_out = jnp.zeros((n_leaf, self.cap_t, self.ker_l2t.kdim1), dt)
        for l in range(1, L + 1):
            rows = data["leaf_node_row"][l]
            nidx = data["leaf_node_idx"][l]
            if rows.shape[0] == 0:
                continue
            blk = my_block(rows.shape[0])
            okb = blk >= 0
            rows_d = rows[jnp.where(okb, blk, 0)]
            nidx_d = nidx[jnp.where(okb, blk, 0)]
            ctr_l = data["ctr"][rows_d]
            xeq = data["surf_out"][l][None] + ctr_l[:, None, :]
            qd = q_dn[l][nidx_d]

            def l2t_box(args):
                xt, xe, q_ = args
                return self.ker_l2t.apply_pairwise(
                    xt, xe, xe, q_.reshape(-1, k0_l2t))

            u_far = lax.map(l2t_box, (xt_pad[rows_d], xeq, qd),
                            batch_size=max(1, min(rows_d.shape[0],
                                                  4096)))
            u_out = u_out.at[jnp.where(okb, rows_d, n_leaf)].add(
                u_far * self.ker_l2t.scale_factor
                * okb[:, None, None].astype(dt), mode="drop")

        # W: finer-node multipoles -> targets (source level l).
        # Packed flat pair walk (data["wpairs"], same design as vtab):
        # the earlier padded-slab form scanned ALL n_leaf leaves at
        # every slab step — measured 5.1 s of the 6.9 s 2e6-point
        # surface eval (74%) with ~2% slot occupancy.  Sharded mode
        # splits the PAIR axis across devices; u_out is psum'd below.
        for l in range(1, L + 1):
            tl, sn = data["wpairs"][l - 1]
            if tl.shape[0] == 0:
                continue
            blk = my_block(tl.shape[0])
            okp = blk >= 0
            tl_d = tl[jnp.where(okp, blk, 0)]
            sn_d = sn[jnp.where(okp, blk, 0)]
            xe = (data["surf_in"][l][None]
                  + data["node_ctr"][l][sn_d][:, None])
            q_ = q_up[l][sn_d] * okp[:, None].astype(dt)

            def w_pair(args):
                xt, xe_, qk = args
                return self.ker_l2t.apply_pairwise(
                    xt, xe_, xe_, qk.reshape(-1, k0_l2t))

            u_k = lax.map(w_pair, (xt_pad[tl_d], xe, q_),
                          batch_size=max(1, min(tl_d.shape[0], 4096)))
            u_out = u_out.at[jnp.where(okp, tl_d, n_leaf)].add(
                u_k * self.ker_l2t.scale_factor
                * okp[:, None, None].astype(dt), mode="drop")

        # U: direct near field over adjacent-leaf slabs
        ulist = data["ulist"]                        # (n_leaf, u_cap)
        Ku = ulist.shape[1]
        if self.use_pallas_ulist and shard is None:
            # per-box Pallas U-list kernel (ops/pallas_p2p.p2p_ulist):
            # targets in sublanes, gathered source slabs in lanes —
            # chunked over leaves so the gathered (G, 3, S) arrays
            # stay bounded
            from ..ops.pallas_p2p import p2p_ulist
            S0 = Ku * self.cap_s
            S = -(-S0 // 128) * 128
            Tp = -(-self.cap_t // 8) * 8
            k0s = fp.shape[-1]
            chunk = max(1, min(n_leaf, max(1, (1 << 22) // max(S, 1))))
            # gather from (B, 3|k0, cap_s)-transposed slabs: gathering
            # the (B, cap_s, 3) form materializes a (G, Ku, cap_s, 3)
            # block whose 3-lane minor dim XLA pads to 128 (42x HBM
            # expansion — the same OOM pattern as the W/X lists)
            xs_pt = xs_pad.transpose(0, 2, 1)        # (B, 3, cap_s)
            ns_pt = ns_pad.transpose(0, 2, 1)
            fp_pt = fp.transpose(0, 2, 1)            # (B, k0, cap_s)
            u_parts = []
            for g0 in range(0, n_leaf, chunk):
                g1 = min(g0 + chunk, n_leaf)
                rows_c = ulist[g0:g1]                # (G, Ku)
                ok = rows_c >= 0
                rc = jnp.where(ok, rows_c, 0)
                G = g1 - g0

                def cat(a, w):                       # (G,Ku,w,cap_s)
                    return a[rc].transpose(0, 2, 1, 3).reshape(
                        G, w, S0)

                xs_b = cat(xs_pt, 3)
                ns_b = cat(ns_pt, 3)
                f_b = cat(fp_pt, k0s) * jnp.repeat(
                    ok.astype(dt), self.cap_s, axis=1)[:, None, :]
                pad = ((0, 0), (0, 0), (0, S - S0))
                xs_b = jnp.pad(xs_b, pad)
                ns_b = jnp.pad(ns_b, pad)
                f_b = jnp.pad(f_b, pad)
                xt_b = jnp.pad(xt_pad[g0:g1],
                               ((0, 0), (0, Tp - self.cap_t), (0, 0))
                               ).transpose(0, 2, 1)
                u_c = p2p_ulist(self.ker_s2t, xt_b, xs_b, ns_b, f_b)
                u_parts.append(u_c[:, :self.cap_t])
            u_near = jnp.concatenate(u_parts, axis=0)
            u_out = u_out + u_near * self.ker_s2t.scale_factor
            return u_out

        blk = my_block(n_leaf)
        okb = blk >= 0
        lid = jnp.where(okb, blk, 0)

        def u_leaf(args):
            xt, slabs = args
            ok = slabs >= 0
            rows = jnp.where(ok, slabs, 0)
            xs = xs_pad[rows].reshape(-1, 3)
            nr = ns_pad[rows].reshape(-1, 3)
            fb = (fp[rows] * ok[:, None, None].astype(dt)).reshape(
                -1, fp.shape[-1])
            return self.ker_s2t.apply_pairwise(xt, xs, nr, fb)

        u_near = lax.map(u_leaf, (xt_pad[lid], ulist[lid]),
                         batch_size=max(1, min(lid.shape[0], 256)))
        u_out = u_out.at[jnp.where(okb, lid, n_leaf)].add(
            u_near * self.ker_s2t.scale_factor
            * okb[:, None, None].astype(dt), mode="drop")
        if shard is not None:
            u_out = lax.psum(u_out, ax)
        return u_out

    def eval_sharded(self, f, mesh) -> np.ndarray:
        """Multi-chip adaptive-FMM evaluation over a jax Mesh: the
        pairwise leaf/node stages (S2M, X, L2T, W, U — all the O(N)
        work) are split across the mesh devices by index blocks and
        combined with psums; node-level translations are replicated.
        Point arrays are replicated: this shards WORK (the multi-chip
        speed path for nonuniform point sets — the BIE far field);
        the memory-sharded path is KIFMMDist (kifmm_dist.py).
        Reference role: PVFMM's distributed adaptive FMM evaluation
        behind fmm-wrapper.txx:788-936."""
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        ndev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        ax = mesh.axis_names[0]
        fp = self._pad_density(f)
        key = (id(mesh), ndev)
        if getattr(self, "_eval_sharded_key", None) != key:
            fn = shard_map(
                functools.partial(self._eval_impl, shard=(ndev, ax)),
                mesh=mesh, in_specs=(P(), P()), out_specs=P(),
                check_vma=False)
            self._eval_sharded_jit = jax.jit(fn)
            self._eval_sharded_key = key
        with profile.Profile.scoped("AdaptiveFMM::EvalSharded"):
            u_pad = self._eval_sharded_jit(fp, self._data)
        k1 = self.ker_l2t.kdim1
        u = np.asarray(u_pad).reshape(-1, k1)[
            self._tvalid_np.reshape(-1)]
        out = np.empty((len(self._t_perm), k1))
        out[self._t_perm] = u
        return out

    @staticmethod
    def _refine(tree: PtTree, skeys, dim, max_pts, max_level: int = 12):
        """Adaptive refinement + 2:1 balance on pre-sorted keys
        (PtTree.update_refinement's loop, reusing its helpers)."""
        D = mt.max_depth(dim)
        n = len(skeys)

        def count(box_keys, level):
            shift = np.uint64(dim * (D - level))
            lo = np.searchsorted(skeys, box_keys)
            hi = np.searchsorted(skeys,
                                 box_keys + (np.uint64(1) << shift))
            return hi - lo

        leaf_keys, leaf_levels = [], []
        active = np.zeros(1, dtype=np.uint64)
        level = 0
        while len(active) and level < max_level:
            child = mt.morton_children(active, level, dim).reshape(-1)
            c = count(child, level + 1)
            split = c > max_pts
            leaf_keys.append(child[~split])
            leaf_levels.append(np.full((~split).sum(), level + 1,
                                       dtype=np.int32))
            active = child[split]
            level += 1
        if len(active):
            leaf_keys.append(active)
            leaf_levels.append(np.full(len(active), level, np.int32))
        lk = np.concatenate(leaf_keys)
        ll = np.concatenate(leaf_levels)
        order = np.argsort(lk, kind="stable")
        tree.leaf_keys, tree.leaf_levels = lk[order], ll[order]
        tree._balance21(False)
