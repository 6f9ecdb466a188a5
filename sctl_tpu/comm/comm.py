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
                 mesh: Optional[Mesh] = None):
        self.axis = axis
        self.mesh = mesh
        if axis is None:
            self._size = 1
        else:
            assert mesh is not None, "Comm over an axis needs its Mesh"
            self._size = mesh.shape[axis]

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
        if self.axis is None:
            return jnp.int32(0)
        return lax.axis_index(self.axis)

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
        red = {"sum": lambda v: lax.psum(v, self.axis),
               "max": lambda v: lax.pmax(v, self.axis),
               "min": lambda v: lax.pmin(v, self.axis)}[op]
        return jax.tree_util.tree_map(red, x)

    def scan(self, x, op: str = "sum", exclusive: bool = False):
        """Prefix reduction over ranks (reference: MPI_Scan, comm.txx:509)."""
        if self.axis is None:
            return jax.tree_util.tree_map(jnp.zeros_like, x) \
                if exclusive else x
        profile.add_comm(1, _nbytes(x))
        r = self.rank()

        def one(v):
            g = lax.all_gather(v, self.axis)  # (p, ...)
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
                           self.axis)
            return out.astype(v.dtype)

        return jax.tree_util.tree_map(one, x)

    def allgather(self, x, tiled: bool = False):
        """Allgather (reference: comm.txx:~350).  tiled=True concatenates
        along the leading axis instead of adding a new one."""
        if self.axis is None:
            return x
        profile.add_comm(1, _nbytes(x) * self._size)
        return jax.tree_util.tree_map(
            lambda v: lax.all_gather(v, self.axis, tiled=tiled), x)

    def alltoall(self, x, split_axis: int = 0, concat_axis: int = 0):
        """Equal-split all-to-all (reference: comm.txx:~395)."""
        if self.axis is None:
            return x
        profile.add_comm(1, _nbytes(x))
        return jax.tree_util.tree_map(
            lambda v: lax.all_to_all(v, self.axis, split_axis=split_axis,
                                     concat_axis=concat_axis, tiled=True),
            x)

    def ppermute(self, x, perm: Sequence):
        if self.axis is None:
            return x
        profile.add_comm(1, _nbytes(x))
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

    def barrier(self):
        """No-op: XLA collectives are themselves synchronizing."""
        return None
