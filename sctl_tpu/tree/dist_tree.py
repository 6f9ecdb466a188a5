"""Distributed adaptive Morton tree over a device mesh.

TPU-native equivalent of the reference's distributed tree construction
(reference: include/sctl/tree.txx:134-333 — Morton sort + boundary
exchange + splitter partition, 2:1 balance across ranks (236-294),
ghost/halo node-data exchange ReduceBroadcast/Broadcast (547, 668)).

Design — replicated skeleton, sharded points:

  The reference distributes both the points AND the tree skeleton
  (leaf list) by Morton ranges, exchanging ghost nodes so each rank
  sees its halo.  Under single-controller SPMD the idiomatic split is
  different: POINTS (O(N)) are sharded; the SKELETON (leaf keys/levels
  — O(N / max_pts), ~16 bytes/leaf) is REPLICATED.  Construction then
  needs exactly one psum per level (global box counts), the 2:1
  balance runs as identical local compute on every rank with NO
  communication (the reference needs HyperQuickSort + PartitionS
  rounds, tree.txx:236-294), and the ghost machinery collapses: a
  "ghost exchange" of named node data is one psum (ReduceBroadcast) or
  one owner-masked psum (Broadcast).  At pod scale the replicated
  skeleton costs megabytes; the sharded point set is what scales.

All methods build traced programs over the comm's mesh axis using the
(data, cnt) ragged-capacity convention of sctl_tpu.comm.verbs.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import morton as mt
from ..comm.comm import Comm
from ..comm.verbs import global_sort

NOKEY = np.uint64(0xFFFFFFFFFFFFFFFF)   # padding sentinel (sorts last)


def _leaf_end(keys, levels, dim):
    """Exclusive end key of each box: key + 2^(dim*(D-level))."""
    D = mt.max_depth(dim)
    return keys + (jnp.uint64(1) << (jnp.uint64(dim)
                                     * (jnp.uint64(D)
                                        - levels.astype(jnp.uint64))))


def build_skeleton(skeys, n_local, comm: Comm, max_pts: int,
                   max_level: int, leaf_cap: int, dim: int = 3):
    """Adaptive refinement with GLOBAL counts: one psum per level.

    skeys: (C,) LOCALLY SORTED Morton keys (padding = NOKEY beyond
    n_local).  The active box list is replicated (identical on every
    rank), so split decisions are globally consistent by construction
    (the reference gets consistency from the +-M boundary-point
    exchange, tree.txx:193-228).

    Returns (leaf_keys (leaf_cap,), leaf_levels, n_leaves) replicated,
    sorted by key with NOKEY padding.
    """
    leaf_keys = jnp.full((leaf_cap,), NOKEY, dtype=jnp.uint64)
    leaf_lvl = jnp.zeros((leaf_cap,), dtype=jnp.int32)
    n_leaf = jnp.int32(0)
    # active boxes, replicated; capacity = leaf_cap (children of split
    # boxes can never exceed the final leaf count)
    active = jnp.full((leaf_cap,), NOKEY, dtype=jnp.uint64)
    active = active.at[0].set(jnp.uint64(0))        # root

    def count_global(box_keys, level):
        """Global point count per box (psum of local searchsorted)."""
        D = mt.max_depth(dim)
        shift = jnp.uint64(dim * (D - level))
        lo = jnp.searchsorted(skeys, box_keys)
        hi = jnp.searchsorted(skeys,
                              box_keys + (jnp.uint64(1) << shift))
        # padding keys (NOKEY) count the padding slots; mask instead
        lo = jnp.minimum(lo, n_local)
        hi = jnp.minimum(hi, n_local)
        return comm.allreduce(hi - lo)

    for level in range(max_level):
        # children of all active boxes (a non-split box at this depth
        # was already emitted as a leaf)
        child = mt.morton_children(active, level, dim)   # (K, 2^dim)
        child = jnp.where((active != NOKEY)[:, None], child, NOKEY)
        child = child.reshape(-1)
        is_box = child != NOKEY
        c = jnp.where(is_box, count_global(child, level + 1), 0)
        split = is_box & (c > max_pts) & (level + 1 < max_level)
        emit = is_box & ~split

        # append emitted leaves (order within the level is key order
        # because active is key-sorted and children are generated in
        # key order)
        emit_pos = jnp.cumsum(emit.astype(jnp.int32)) - 1 + n_leaf
        leaf_keys = leaf_keys.at[
            jnp.where(emit, emit_pos, leaf_cap)].set(
            child, mode="drop")
        leaf_lvl = leaf_lvl.at[
            jnp.where(emit, emit_pos, leaf_cap)].set(
            jnp.int32(level + 1), mode="drop")
        n_leaf = n_leaf + jnp.sum(emit.astype(jnp.int32))

        # next active = split children, compacted (stay key-sorted)
        act_pos = jnp.cumsum(split.astype(jnp.int32)) - 1
        nxt = jnp.full((leaf_cap,), NOKEY, dtype=jnp.uint64)
        nxt = nxt.at[jnp.where(split, act_pos, leaf_cap)].set(
            child, mode="drop")
        active = nxt

    # leaves were appended level-major; sort by key for the linear tree
    order = jnp.argsort(leaf_keys)
    return leaf_keys[order], leaf_lvl[order], n_leaf


def balance21_skeleton(leaf_keys, leaf_lvl, n_leaf, max_level: int,
                       leaf_cap: int, dim: int = 3,
                       periodic: bool = False):
    """2:1 balance on the replicated skeleton (reference:
    tree.txx:236-294; here pure local compute — identical on every
    rank — instead of distributed sort rounds).

    Static iteration count: each round raises the minimum level of a
    violating leaf, so max_level rounds suffice.
    """
    D = mt.max_depth(dim)
    n_off = 3 ** dim - 1
    offsets = np.stack(np.meshgrid(*([[-1, 0, 1]] * dim),
                                   indexing="ij"), -1).reshape(-1, dim)
    offsets = jnp.asarray(offsets[~np.all(offsets == 0, axis=1)])

    def one_round(state):
        keys, lvl, n = state
        valid = keys != NOKEY
        lat = mt.morton_decode(jnp.where(valid, keys, 0), dim)
        step = (jnp.uint64(1) << (jnp.uint64(D)
                                  - lvl.astype(jnp.uint64)))
        nb = (lat[:, None, :].astype(jnp.int64)
              + offsets[None, :, :] * step[:, None, None].astype(
                  jnp.int64))
        side = np.int64(1 << D)     # static
        if periodic:
            nb = nb % side
            nb_ok = jnp.ones(nb.shape[:-1], dtype=bool)
        else:
            nb_ok = jnp.all((nb >= 0) & (nb < side), axis=-1)
            nb = jnp.clip(nb, 0, side - 1)
        nb_key = _lat_to_key(nb.astype(jnp.uint64), dim)
        nb_ok = nb_ok & valid[:, None]
        # leaf containing each neighbor key
        j = jnp.clip(jnp.searchsorted(keys, nb_key.reshape(-1),
                                      side="right") - 1, 0,
                     leaf_cap - 1)
        ends = _leaf_end(keys, lvl, dim)
        inside = (nb_key.reshape(-1) < ends[j]) & nb_ok.reshape(-1)
        lvl_i = jnp.repeat(lvl, n_off)
        too_coarse = inside & (lvl[j] < lvl_i - 1)
        must = jnp.zeros((leaf_cap,), bool).at[
            jnp.where(too_coarse, j, leaf_cap)].set(True, mode="drop")
        must = must & valid

        n_split = jnp.sum(must.astype(jnp.int32))
        # split marked leaves: keep others, append 2^dim children each
        child = jax.vmap(
            lambda k_, l_: _children_mixed(k_, l_, dim))(keys, lvl)
        child = jnp.where(must[:, None], child, NOKEY)   # (L, 2^dim)
        keep = jnp.where(must | ~valid, NOKEY, keys)
        allk = jnp.concatenate([keep, child.reshape(-1)])
        alll = jnp.concatenate(
            [lvl, jnp.repeat(lvl + 1, 1 << dim)])
        order = jnp.argsort(allk)[:leaf_cap]
        return (allk[order], alll[order],
                n + n_split * ((1 << dim) - 1))

    # fixed number of rounds with early no-op (a round with no marked
    # leaves is the identity)
    state = (leaf_keys, leaf_lvl, n_leaf)
    for _ in range(max_level):
        state = one_round(state)
    return state


def _lat_to_key(lat, dim):
    """Max-depth lattice coords -> Morton key."""
    from .morton import _spread3, _spread2
    if dim == 3:
        return (_spread3(lat[..., 0], jnp)
                | (_spread3(lat[..., 1], jnp) << jnp.uint64(1))
                | (_spread3(lat[..., 2], jnp) << jnp.uint64(2)))
    return (_spread2(lat[..., 0], jnp)
            | (_spread2(lat[..., 1], jnp) << jnp.uint64(1)))


def _children_mixed(key, lvl, dim):
    """Children keys of one box at traced level `lvl`."""
    D = mt.max_depth(dim)
    shift = (jnp.uint64(dim) * (jnp.uint64(D) - jnp.uint64(1)
                                - lvl.astype(jnp.uint64)))
    c = jnp.arange(1 << dim, dtype=jnp.uint64)
    return key | (c << shift)


class DistPtTree:
    """Distributed particle tree: sharded points, replicated skeleton.

    API parity with the reference PtTree (tree.hpp:198-292) in the
    sharded setting:

        tree = DistPtTree(comm, leaf_cap=..., pt_cap=...)
        fn = tree.build_fn(max_pts, balance21=True)   # traced program
        leaf_keys, leaf_lvl, n_leaf, Xs, cnt = comm.run(fn, ...)(X, cnt)

    plus the named-node-data exchange verbs `reduce_broadcast` /
    `broadcast` (tree.txx:547, 668).
    """

    def __init__(self, comm: Comm, leaf_cap: int, pt_cap: int,
                 dim: int = 3, max_level: int = 10):
        self.comm = comm
        self.dim = dim
        self.leaf_cap = leaf_cap
        self.pt_cap = pt_cap
        self.max_level = max_level

    def build_fn(self, max_pts: int, balance21: bool = False,
                 periodic: bool = False, bbox=None):
        """Returns fn(X (C, dim), cnt ()) -> (leaf_keys, leaf_lvl,
        n_leaf, X_sorted (pt_cap, dim), out_cnt) for comm.run /
        shard_map: global bbox -> Morton keys -> distributed sample
        sort (the HyperQuickSort role) -> replicated skeleton with
        global counts -> optional 2:1 balance.

        bbox=(offset (dim,), scale) fixes the key normalization
        instead of computing the global bbox (needed when a consumer
        must map OTHER point sets — e.g. FMM targets — into the same
        key space; cf. PtTree's shared `_normalize`)."""
        comm = self.comm
        dim, ml, lc = self.dim, self.max_level, self.leaf_cap

        def fn(X, cnt):
            C = X.shape[0]
            i = jnp.arange(C)
            valid = i < cnt
            if bbox is not None:
                lo = jnp.asarray(bbox[0], X.dtype)
                scale = jnp.asarray(bbox[1], X.dtype)
            else:
                big = jnp.float64(1e300)
                lo = comm.allreduce(jnp.min(jnp.where(valid[:, None], X,
                                                      big), axis=0),
                                    "min")
                hi = comm.allreduce(jnp.max(jnp.where(valid[:, None], X,
                                                      -big), axis=0),
                                    "max")
                scale = jnp.max(hi - lo) * (1 + 1e-10)
            X01 = (X - lo) / scale
            keys = mt.morton_encode(jnp.where(valid[:, None], X01, 0.5),
                                    dim=dim)
            keys = jnp.where(valid, keys, NOKEY)
            skeys, Xs, out_cnt = global_sort(
                comm, keys, cnt, payload=X, capacity=self.pt_cap)
            skeys = jnp.where(jnp.arange(self.pt_cap) < out_cnt,
                              skeys, NOKEY)
            lk, ll, nl = build_skeleton(skeys, out_cnt, comm, max_pts,
                                        ml, lc, dim)
            if balance21:
                lk, ll, nl = balance21_skeleton(lk, ll, nl, ml, lc,
                                                dim, periodic)
            return lk, ll, nl[None], Xs, out_cnt[None]

        return fn

    # -- named node-data exchange (reference: ReduceBroadcast /
    # Broadcast of ghost node data, tree.txx:547, 668) ------------------
    def reduce_broadcast(self, partial_leaf_vals):
        """Sum per-leaf contributions over ranks and give every rank
        the totals (the reference's owner-reduction + ghost broadcast
        collapses to one psum on the replicated skeleton)."""
        return self.comm.allreduce(partial_leaf_vals)

    def broadcast(self, leaf_vals, owner_mask):
        """Owner's values to all ranks: psum of owner-masked values
        (owner_mask: (L,) bool, True exactly on one rank per leaf)."""
        z = jnp.where(owner_mask[..., None] if leaf_vals.ndim > 1
                      else owner_mask, leaf_vals, 0)
        return self.comm.allreduce(z)

    @staticmethod
    def leaf_of_points(leaf_keys, pt_keys):
        """Leaf index of each point key (replicated skeleton lookup)."""
        return jnp.clip(jnp.searchsorted(leaf_keys, pt_keys,
                                         side="right") - 1, 0,
                        leaf_keys.shape[0] - 1)
