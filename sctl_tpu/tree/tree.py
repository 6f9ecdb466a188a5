"""Morton-ordered point trees.

TPU-native equivalent of the reference's distributed adaptive octree
(reference: include/sctl/tree.hpp:27-292, tree.txx:134-333 —
`Tree<DIM>` / `PtTree<Real,DIM>`: UpdateRefinement builds a linear
Morton-ordered adaptive tree with max M points per box, optional 2:1
balance; particles carry named data arrays, scattered to tree order and
recoverable in input order; SURVEY.md §3.3).

Two trees:

  UniformTree — fixed-depth dense octree.  Every box exists; box ids
      are dense Morton indices, so neighbor/interaction lists are pure
      integer arithmetic and all per-level quantities are dense arrays.
      This is the FMM workhorse on TPU: static shapes, no pointer
      chasing, sort + searchsorted only.

  PtTree — adaptive linear octree matching the reference semantics
      (split while > max_pts points per box, optional 2:1 balance).
      Construction is host-side numpy (latency-insensitive precompute;
      the hot paths consume its flat arrays on device).

The pointer-free construction is the reference algorithm recast as
sort/scan/segment ops: global Morton sort, per-level box counts via
searchsorted on the sorted keys, leaves = children of split boxes with
count <= M (tree.txx:211-228).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from . import morton as mt


def _normalize(X: np.ndarray, bbox=None):
    """Scale points into [0,1)^dim; returns (X01, offset, scale) with
    x01 = (x - offset) / scale (the reference FMM's bbox_scale/offset,
    fmm-wrapper.txx:845)."""
    X = np.asarray(X, dtype=np.float64)
    if bbox is None:
        lo = X.min(axis=0)
        hi = X.max(axis=0)
    else:
        lo, hi = map(np.asarray, bbox)
    scale = float((hi - lo).max()) * (1 + 1e-10) or 1.0
    offset = lo
    return (X - offset) / scale, offset, scale


class UniformTree:
    """Dense fixed-depth Morton tree over points in arbitrary boxes."""

    def __init__(self, X, depth: int, dim: int = 3, bbox=None):
        self.dim = dim
        self.depth = depth
        self.n_boxes = 1 << (dim * depth)
        X01, self.offset, self.scale = _normalize(X, bbox)
        D = mt.max_depth(dim)
        keys = mt.morton_encode(X01, dim=dim)
        self.box_of_point = (keys >> np.uint64(
            dim * (D - depth))).astype(np.int64)
        key_bits = dim * depth
        if key_bits <= 24:
            from .. import native
            self.box_sorted, self.perm = native.argsort_small(
                self.box_of_point, key_bits)
        else:
            self.perm = np.argsort(self.box_of_point, kind="stable")
            self.box_sorted = self.box_of_point[self.perm]
        # dense per-box offsets: points of box b are
        # perm[box_dsp[b] : box_dsp[b+1]] in sorted order
        self.box_dsp = np.searchsorted(self.box_sorted,
                                       np.arange(self.n_boxes + 1))
        self.box_cnt = np.diff(self.box_dsp)
        self.X_sorted = np.asarray(X, dtype=np.float64)[self.perm]

    def box_centers(self) -> np.ndarray:
        """(n_boxes, dim) box centers in original coordinates."""
        b = mt.morton_decode(
            np.arange(self.n_boxes, dtype=np.uint64)
            << np.uint64(self.dim * (mt.max_depth(self.dim) - self.depth)),
            self.dim)
        side = 1.0 / (1 << self.depth)
        ctr01 = (b.astype(np.float64) / (1 << mt.max_depth(self.dim))
                 + side / 2)
        return ctr01 * self.scale + self.offset

    def box_size(self) -> float:
        return self.scale / (1 << self.depth)

    def neighbor_boxes(self, periodic: bool = False):
        """(n_boxes, 3^dim) neighbor box indices incl. self; -1 invalid."""
        lvl = self.depth
        n_side = 1 << lvl
        idx = np.arange(self.n_boxes, dtype=np.uint64)
        D = mt.max_depth(self.dim)
        keys = idx << np.uint64(self.dim * (D - lvl))
        b = mt.box_coords(keys, lvl, self.dim)            # (B, dim)
        offsets = np.stack(np.meshgrid(*([[-1, 0, 1]] * self.dim),
                                       indexing="ij"),
                           -1).reshape(-1, self.dim)
        nb = b[:, None, :] + offsets
        if periodic:
            nb = nb % n_side
            valid = np.ones(nb.shape[:-1], dtype=bool)
        else:
            valid = np.all((nb >= 0) & (nb < n_side), axis=-1)
            nb = np.clip(nb, 0, n_side - 1)
        nkeys = mt.coords_to_key(nb, lvl, self.dim)
        nidx = (nkeys >> np.uint64(self.dim * (D - lvl))).astype(np.int64)
        return np.where(valid, nidx, -1)


class PtTree:
    """Adaptive linear Morton octree (reference: PtTree<Real,DIM>,
    tree.hpp:198-292).

    update_refinement(X, M) builds leaves with <= M points each;
    add_particle_data/get_particle_data move named arrays between input
    order and tree (Morton-sorted) order via the stored scatter index
    (tree.hpp:288-291).
    """

    def __init__(self, dim: int = 3, comm=None):
        self.dim = dim
        self.comm = comm       # distribution handled by caller verbs
        self.leaf_keys: Optional[np.ndarray] = None
        self.leaf_levels: Optional[np.ndarray] = None
        self._data: Dict[str, np.ndarray] = {}
        self._data_dof: Dict[str, int] = {}
        self.perm: Optional[np.ndarray] = None

    # -- construction ---------------------------------------------------
    def update_refinement(self, X, max_pts: int = 100,
                          balance21: bool = False,
                          periodic: bool = False,
                          max_level: Optional[int] = None):
        """Build the adaptive tree (reference: UpdateRefinement,
        tree.txx:134: Morton sort, split while > max_pts, optional 2:1
        balance)."""
        dim = self.dim
        D = mt.max_depth(dim)
        max_level = max_level if max_level is not None else min(D, 15)
        X01, self.offset, self.scale = _normalize(X)
        keys = mt.morton_encode(X01, dim=dim)
        self.perm = np.argsort(keys, kind="stable")
        skeys = keys[self.perm]
        self.X_sorted = np.asarray(X, np.float64)[self.perm]
        n = len(skeys)

        def count(box_keys, level):
            """points inside each box (given by first-descendant key)"""
            shift = np.uint64(dim * (D - level))
            lo = np.searchsorted(skeys, box_keys)
            hi = np.searchsorted(
                skeys, box_keys + (np.uint64(1) << shift))
            return hi - lo

        leaf_keys, leaf_levels = [], []
        active = np.zeros(1, dtype=np.uint64)       # root
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
        if len(active):                              # depth-capped boxes
            leaf_keys.append(active)
            leaf_levels.append(np.full(len(active), level,
                                       dtype=np.int32))
        lk = np.concatenate(leaf_keys) if leaf_keys else active
        ll = np.concatenate(leaf_levels)
        order = np.argsort(lk, kind="stable")
        self.leaf_keys, self.leaf_levels = lk[order], ll[order]

        if balance21:
            self._balance21(periodic)

        # per-leaf point ranges
        self.leaf_dsp = np.searchsorted(skeys, self.leaf_keys)
        self.leaf_cnt = np.diff(np.append(self.leaf_dsp, n))
        self._skeys = skeys
        return self

    def _balance21(self, periodic: bool):
        """Iterative 2:1 balance (reference: tree.txx:236-294): split any
        leaf more than one level coarser than an adjacent leaf."""
        dim = self.dim
        D = mt.max_depth(dim)
        while True:
            lk, ll = self.leaf_keys, self.leaf_levels
            if len(lk) <= 1:
                return
            ends = lk + (np.uint64(1) << (np.uint64(dim) * np.uint64(
                D) - np.uint64(dim) * ll.astype(np.uint64)))
            must_split = np.zeros(len(lk), dtype=bool)
            for lvl in np.unique(ll):
                sel = ll == lvl
                nbk, valid = mt.morton_neighbors(lk[sel], int(lvl), dim,
                                                 periodic)
                # a neighbor key falls inside leaf j if
                # lk[j] <= nbk < ends[j]; that leaf must have
                # level >= lvl-1
                j = np.searchsorted(lk, nbk.reshape(-1),
                                    side="right") - 1
                j = np.clip(j, 0, len(lk) - 1)
                inside = (nbk.reshape(-1) < ends[j]) & valid.reshape(-1)
                too_coarse = inside & (ll[j] < lvl - 1)
                must_split[np.unique(j[too_coarse])] = True
            if not must_split.any():
                return
            keep_k, keep_l = lk[~must_split], ll[~must_split]
            new_k, new_l = [], []
            for key, lvl in zip(lk[must_split], ll[must_split]):
                ck = mt.morton_children(np.asarray([key], np.uint64),
                                        int(lvl), dim).reshape(-1)
                new_k.append(ck)
                new_l.append(np.full(len(ck), lvl + 1, dtype=np.int32))
            allk = np.concatenate([keep_k] + new_k)
            alll = np.concatenate([keep_l] + new_l)
            order = np.argsort(allk, kind="stable")
            self.leaf_keys, self.leaf_levels = allk[order], alll[order]

    # -- particle data (reference: tree.hpp:198-292) ----------------------
    def add_particle_data(self, name: str, data):
        """Store per-particle data (input order); kept in tree order."""
        data = np.asarray(data)
        dof = data.size // len(self.perm)
        self._data[name] = data.reshape(len(self.perm), dof)[self.perm]
        self._data_dof[name] = dof

    def get_particle_data(self, name: str) -> np.ndarray:
        """Return data in the ORIGINAL input order (reference:
        GetParticleData scatters back via scatter_idx)."""
        out = np.empty_like(self._data[name])
        out[self.perm] = self._data[name]
        return out.reshape(len(self.perm), -1)

    def get_tree_order_data(self, name: str) -> np.ndarray:
        return self._data[name]

    def delete_particle_data(self, name: str):
        del self._data[name]
        del self._data_dof[name]

    # -- queries ----------------------------------------------------------
    def n_leaves(self) -> int:
        return len(self.leaf_keys)

    def leaf_of_points(self) -> np.ndarray:
        """Leaf index of each (sorted-order) point."""
        return np.searchsorted(self.leaf_keys, self._skeys,
                               side="right") - 1

    def check_2to1(self, periodic: bool = False) -> bool:
        dim, D = self.dim, mt.max_depth(self.dim)
        lk, ll = self.leaf_keys, self.leaf_levels
        ends = lk + (np.uint64(1) << (np.uint64(dim) * np.uint64(D)
                                      - np.uint64(dim) * ll.astype(
                                          np.uint64)))
        for lvl in np.unique(ll):
            sel = ll == lvl
            nbk, valid = mt.morton_neighbors(lk[sel], int(lvl), dim,
                                             periodic)
            j = np.clip(np.searchsorted(lk, nbk.reshape(-1),
                                        side="right") - 1, 0, len(lk) - 1)
            inside = (nbk.reshape(-1) < ends[j]) & valid.reshape(-1)
            if np.any(inside & (ll[j] < lvl - 1)):
                return False
        return True
