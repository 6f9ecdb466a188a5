"""Comm: mesh-collective communication layer (primitive verbs).

TPU-native equivalent of the reference's MPI wrapper `Comm` (reference:
include/sctl/comm.hpp:35-441, comm.txx; SURVEY.md §5.8).  Instead of
wrapping MPI, a `Comm` names one axis of a `jax.sharding.Mesh`; its
methods are XLA collectives traced *inside* a `shard_map` region, so the
compiler schedules them on ICI.  The mapping:

  MPI_Allreduce        -> lax.psum / pmax / pmin          (comm.txx:478)
  MPI_Scan             -> all_gather + masked reduce      (comm.txx:509)
  MPI_Bcast            -> mask + psum                     (comm.txx:~340)
  MPI_Allgather(v)     -> lax.all_gather                  (comm.txx:~350)
  MPI_Alltoall         -> lax.all_to_all                  (comm.txx:~395)
  Isend/Irecv rings    -> lax.ppermute                    (comm.txx:220)
  Alltoallv/sparse     -> gather/route verbs (verbs.py)   (comm.txx:363,404)

Dual-mode discipline (reference: comm.hpp:32-33 — the same API works as
a no-op self-communicator without MPI): `Comm()` with no axis is a
self-communicator whose methods work outside any shard_map; a `Comm`
over a 1-device mesh axis behaves identically.  All distributed
algorithms in this library are written against this API and run
unmodified at p=1.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from .. import profile


def exclusive_cumsum(x, axis=0):
    """Exclusive prefix sum along an axis."""
    inc = jnp.cumsum(x, axis=axis)
    return inc - x


def _nbytes(tree) -> float:
    return sum(a.size * a.dtype.itemsize
               for a in jax.tree_util.tree_leaves(tree)
               if hasattr(a, "dtype"))


class Comm:
    """Communicator over one mesh axis (or a self-communicator).

    Collective methods must be called inside a shard_map traced over the
    axis (use :meth:`run` to wrap a function), except when this is a
    self-communicator (axis=None), where they run anywhere.
    """

    def __init__(self, axis: Optional[str] = None,
                 mesh: Optional[Mesh] = None,
                 groups: Optional[Sequence[Sequence[int]]] = None):
        self.axis = axis
        self.mesh = mesh
        self.groups = None if groups is None else [list(g)
                                                   for g in groups]
        if axis is None:
            self._size = 1
        else:
            assert mesh is not None, "Comm over an axis needs its Mesh"
            self._size = mesh.shape[axis]
        if self.groups is not None:
            sizes = {len(g) for g in self.groups}
            assert len(sizes) == 1, \
                "split groups must be equal-sized (SPMD shapes are static)"
            assert sorted(sum(self.groups, [])) == list(
                range(mesh.shape[axis])), "groups must partition the axis"
            self._size = len(self.groups[0])
            # rank-within-group lookup table (static)
            import numpy as _np
            tbl = _np.zeros(mesh.shape[axis], _np.int32)
            for g in self.groups:
                for i, rk in enumerate(g):
                    tbl[rk] = i
            self._group_rank_tbl = tbl

    # ---- introspection ----------------------------------------------

    @staticmethod
    def self_():
        """The self-communicator (reference: Comm::Self())."""
        return Comm()

    @staticmethod
    def world(mesh: Mesh, axis: Optional[str] = None):
        """Communicator over a mesh axis (reference: Comm::World())."""
        if axis is None:
            axis = mesh.axis_names[0]
        return Comm(axis, mesh)

    def size(self) -> int:
        return self._size

    def rank(self):
        """Rank within this communicator (group-local after split)."""
        if self.axis is None:
            return jnp.int32(0)
        r = lax.axis_index(self.axis)
        if self.groups is not None:
            return jnp.asarray(self._group_rank_tbl)[r]
        return r

    def split(self, colors: Sequence[int]) -> "Comm":
        """Sub-communicator by color (reference: Comm::Split,
        comm.hpp:98): ranks with equal colors[rank] form a group; each
        group's collectives stay within the group (XLA
        axis_index_groups).  Groups must be equal-sized — SPMD programs
        have one static shape per collective (the reference's MPI
        split has no such restriction; unequal groups would need
        separate programs per group).  Key order = rank order."""
        assert self.axis is not None and self.groups is None, \
            "split: needs a top-level mesh communicator"
        import numpy as _np
        colors = _np.asarray(list(colors))
        assert len(colors) == self._size
        groups = [list(_np.where(colors == c)[0])
                  for c in sorted(set(colors.tolist()))]
        return Comm(self.axis, self.mesh, groups=groups)

    @property
    def _gkw(self):
        return ({"axis_index_groups": self.groups}
                if self.groups is not None else {})

    # ---- wrapping ------------------------------------------------------

    def run(self, fn, in_specs, out_specs, check_vma=False):
        """shard_map `fn` over this comm's mesh axis.

        For a self-communicator, returns fn unchanged (p=1 dual mode).
        """
        if self.axis is None:
            return fn
        return jax.shard_map(fn, mesh=self.mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=check_vma)

    def spec(self, *names) -> P:
        return P(*names)

    # ---- primitive collectives ------------------------------------------

    def allreduce(self, x, op: str = "sum"):
        """Allreduce over the axis (reference: comm.txx:478)."""
        if self.axis is None:
            return x
        profile.add_comm(1, _nbytes(x))
        kw = self._gkw
        red = {"sum": lambda v: lax.psum(v, self.axis, **kw),
               "max": lambda v: lax.pmax(v, self.axis, **kw),
               "min": lambda v: lax.pmin(v, self.axis, **kw)}[op]
        return jax.tree_util.tree_map(red, x)

    def scan(self, x, op: str = "sum", exclusive: bool = False):
        """Prefix reduction over ranks (reference: MPI_Scan, comm.txx:509)."""
        if self.axis is None:
            return jax.tree_util.tree_map(jnp.zeros_like, x) \
                if exclusive else x
        profile.add_comm(1, _nbytes(x))
        r = self.rank()

        def one(v):
            g = lax.all_gather(v, self.axis, **self._gkw)  # (p, ...)
            idx = jnp.arange(self._size)
            mask = (idx < r) if exclusive else (idx <= r)
            mshape = (self._size,) + (1,) * (g.ndim - 1)
            if op == "sum":
                return jnp.sum(g * mask.reshape(mshape).astype(g.dtype),
                               axis=0)
            big = {"max": -jnp.inf, "min": jnp.inf}[op]
            masked = jnp.where(mask.reshape(mshape), g,
                               jnp.asarray(big, dtype=g.dtype))
            return (jnp.max if op == "max" else jnp.min)(masked, axis=0)

        return jax.tree_util.tree_map(one, x)

    def bcast(self, x, root: int = 0):
        """Broadcast from `root` (reference: Comm::Bcast)."""
        if self.axis is None:
            return x
        profile.add_comm(1, _nbytes(x))
        is_root = (self.rank() == root)

        def one(v):
            fv = v.astype(jnp.float64) if jnp.issubdtype(
                v.dtype, jnp.integer) else v
            out = lax.psum(jnp.where(is_root, fv, jnp.zeros_like(fv)),
                           self.axis, **self._gkw)
            return out.astype(v.dtype)

        return jax.tree_util.tree_map(one, x)

    def allgather(self, x, tiled: bool = False):
        """Allgather (reference: comm.txx:~350).  tiled=True concatenates
        along the leading axis instead of adding a new one."""
        if self.axis is None:
            return x
        profile.add_comm(1, _nbytes(x) * self._size)
        return jax.tree_util.tree_map(
            lambda v: lax.all_gather(v, self.axis, tiled=tiled,
                                     **self._gkw), x)

    def alltoall(self, x, split_axis: int = 0, concat_axis: int = 0):
        """Equal-split all-to-all (reference: comm.txx:~395)."""
        if self.axis is None:
            return x
        profile.add_comm(1, _nbytes(x))
        return jax.tree_util.tree_map(
            lambda v: lax.all_to_all(v, self.axis, split_axis=split_axis,
                                     concat_axis=concat_axis, tiled=True,
                                     **self._gkw),
            x)

    def ppermute(self, x, perm: Sequence):
        """perm is in GROUP-LOCAL ranks after a split."""
        if self.axis is None:
            return x
        profile.add_comm(1, _nbytes(x))
        if self.groups is not None:
            perm = [(g[s], g[d]) for g in self.groups for (s, d) in perm]
        return jax.tree_util.tree_map(
            lambda v: lax.ppermute(v, self.axis, perm=perm), x)

    def send_recv_shift(self, x, shift: int = 1):
        """Ring shift: every rank sends to (rank+shift)%p, receives from
        (rank-shift)%p — the Isend/Irecv ring of EvalDirect
        (reference: fmm-wrapper.txx:537-558) and tree boundary exchange
        (tree.txx:193-210)."""
        p = self._size
        if self.axis is None or p == 1:
            return x
        perm = [(i, (i + shift) % p) for i in range(p)]
        return self.ppermute(x, perm)

    def send_recv(self, x, pairs: Sequence, fill=0):
        """General tag-free point-to-point exchange (reference:
        Isend/Irecv/Wait, comm.hpp:130-147): `pairs` is a static list
        of (src, dst) rank pairs; each src's `x` arrives at its dst,
        ranks receiving nothing get `fill`.  XLA's static schedule
        subsumes MPI tags (message matching is positional in the
        program), and completion is a data dependency, so there is no
        separate Wait.  Duplicate destinations are rejected (one
        receive buffer per call — issue two calls for two messages)."""
        if self.axis is None:
            return x
        dsts = [d for (_, d) in pairs]
        assert len(set(dsts)) == len(dsts), \
            "send_recv: one message per destination per call"
        recv_mask = [False] * self._size
        for d in dsts:
            recv_mask[d % self._size] = True

        def one(v):
            out = lax.ppermute(v, self.axis,
                               perm=[(s, d) for (s, d) in (
                                   [(g[s], g[d]) for g in self.groups
                                    for (s, d) in pairs]
                                   if self.groups is not None
                                   else pairs)])
            if all(recv_mask):
                return out
            got = jnp.asarray(recv_mask)[self.rank()]
            return jnp.where(got, out, jnp.full_like(out, fill))

        profile.add_comm(len(pairs), _nbytes(x))
        return jax.tree_util.tree_map(one, x)

    def barrier(self):
        """No-op: XLA collectives are themselves synchronizing."""
        return None
