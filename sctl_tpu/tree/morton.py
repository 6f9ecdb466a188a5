"""Morton (Z-order) indices as vectorized bit operations.

TPU-native equivalent of the reference `Morton<DIM>` class (reference:
include/sctl/morton.hpp:10-44, morton.txx — coords<->mid, Ancestor,
Children, NbrList, isAncestor, ordering; SCTL_MAX_DEPTH=15).

Keys are uint64: DIM interleaved coordinate fields of `depth` bits each
(depth <= 20 for 3-D, <= 31 for 2-D), stored at a fixed max depth so
keys at any level share one total order (a box's key is its first
descendant's key, the reference's DFD ordering).  All functions are
jnp-traceable and also work on numpy arrays.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

MAX_DEPTH_3D = 20
MAX_DEPTH_2D = 31


def _np_or_jnp(x):
    return np if isinstance(x, np.ndarray) else jnp


def _spread3(x, xp):
    """Spread the low 21 bits of x so there are 2 zero bits between
    consecutive bits (3-D interleave)."""
    x = x.astype(np.uint64) if xp is np else x.astype(jnp.uint64)
    m = lambda v: np.uint64(v)
    x = (x | (x << m(32))) & m(0x1F00000000FFFF)
    x = (x | (x << m(16))) & m(0x1F0000FF0000FF)
    x = (x | (x << m(8))) & m(0x100F00F00F00F00F)
    x = (x | (x << m(4))) & m(0x10C30C30C30C30C3)
    x = (x | (x << m(2))) & m(0x1249249249249249)
    return x


def _compact3(x, xp):
    m = lambda v: np.uint64(v)
    x = x & m(0x1249249249249249)
    x = (x | (x >> m(2))) & m(0x10C30C30C30C30C3)
    x = (x | (x >> m(4))) & m(0x100F00F00F00F00F)
    x = (x | (x >> m(8))) & m(0x1F0000FF0000FF)
    x = (x | (x >> m(16))) & m(0x1F00000000FFFF)
    x = (x | (x >> m(32))) & m(0x1FFFFF)
    return x


def _spread2(x, xp):
    m = lambda v: np.uint64(v)
    x = x.astype(np.uint64) if xp is np else x.astype(jnp.uint64)
    x = (x | (x << m(16))) & m(0x0000FFFF0000FFFF)
    x = (x | (x << m(8))) & m(0x00FF00FF00FF00FF)
    x = (x | (x << m(4))) & m(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << m(2))) & m(0x3333333333333333)
    x = (x | (x << m(1))) & m(0x5555555555555555)
    return x


def _compact2(x, xp):
    m = lambda v: np.uint64(v)
    x = x & m(0x5555555555555555)
    x = (x | (x >> m(1))) & m(0x3333333333333333)
    x = (x | (x >> m(2))) & m(0x0F0F0F0F0F0F0F0F)
    x = (x | (x >> m(4))) & m(0x00FF00FF00FF00FF)
    x = (x | (x >> m(8))) & m(0x0000FFFF0000FFFF)
    x = (x | (x >> m(16))) & m(0x00000000FFFFFFFF)
    return x


def max_depth(dim: int) -> int:
    return MAX_DEPTH_3D if dim == 3 else MAX_DEPTH_2D


def morton_encode(coords, depth: int = None, dim: int = None):
    """Coordinates in [0,1)^dim -> Morton keys at max depth
    (reference: Morton(coord), morton.txx).  coords: (N, dim)."""
    xp = _np_or_jnp(coords if not hasattr(coords, "dtype") or True
                    else coords)
    xp = np if isinstance(coords, np.ndarray) else jnp
    dim = dim or coords.shape[-1]
    D = max_depth(dim)
    scale = float(1 << D)
    q = xp.clip((coords * scale), 0, scale - 1).astype(np.uint64)
    if dim == 3:
        return (_spread3(q[..., 0], xp)
                | (_spread3(q[..., 1], xp) << np.uint64(1))
                | (_spread3(q[..., 2], xp) << np.uint64(2)))
    if dim == 2:
        return (_spread2(q[..., 0], xp)
                | (_spread2(q[..., 1], xp) << np.uint64(1)))
    raise ValueError(f"dim {dim} not supported")


def morton_decode(keys, dim: int = 3):
    """Morton keys -> integer lattice coords at max depth."""
    xp = np if isinstance(keys, np.ndarray) else jnp
    one = np.uint64(1)
    if dim == 3:
        return xp.stack([_compact3(keys, xp),
                         _compact3(keys >> one, xp),
                         _compact3(keys >> np.uint64(2), xp)], axis=-1)
    if dim == 2:
        return xp.stack([_compact2(keys, xp),
                         _compact2(keys >> one, xp)], axis=-1)
    raise ValueError(f"dim {dim} not supported")


def morton_ancestor(keys, level: int, dim: int = 3):
    """Key of the level-`level` ancestor box (its first-descendant key;
    reference: Morton::Ancestor, morton.txx)."""
    xp = np if isinstance(keys, np.ndarray) else jnp
    D = max_depth(dim)
    shift = np.uint64(dim * (D - level))
    return (keys >> shift) << shift


def morton_children(keys, level: int, dim: int = 3):
    """Keys of the 2^dim children of level-`level` boxes
    (reference: Morton::Children, morton.txx:138).  (N,) -> (N, 2^dim)."""
    xp = np if isinstance(keys, np.ndarray) else jnp
    D = max_depth(dim)
    shift = np.uint64(dim * (D - level - 1))
    c = np.arange(1 << dim, dtype=np.uint64)
    if xp is jnp:
        c = jnp.asarray(c)
    return keys[..., None] | (c << shift)


def box_coords(keys, level: int, dim: int = 3):
    """Integer box coordinates at `level` for keys (at any depth)."""
    D = max_depth(dim)
    lat = morton_decode(keys, dim)
    xp = np if isinstance(keys, np.ndarray) else jnp
    return (lat >> np.uint64(D - level)).astype(np.int64 if xp is np
                                                else jnp.int64)


def coords_to_key(box, level: int, dim: int = 3):
    """Integer box coords at `level` -> Morton key (first descendant)."""
    xp = np if isinstance(box, np.ndarray) else jnp
    D = max_depth(dim)
    b = (box.astype(np.uint64) if xp is np
         else box.astype(jnp.uint64)) << np.uint64(D - level)
    if dim == 3:
        return (_spread3(b[..., 0], xp)
                | (_spread3(b[..., 1], xp) << np.uint64(1))
                | (_spread3(b[..., 2], xp) << np.uint64(2)))
    return (_spread2(b[..., 0], xp)
            | (_spread2(b[..., 1], xp) << np.uint64(1)))


def morton_neighbors(keys, level: int, dim: int = 3,
                     periodic: bool = False):
    """Keys of the 3^dim - 1 same-level neighbor boxes (reference:
    Morton::NbrList, morton.txx:88).  Returns (N, 3^dim-1) keys and a
    validity mask (out-of-domain neighbors invalid unless periodic)."""
    xp = np if isinstance(keys, np.ndarray) else jnp
    b = box_coords(keys, level, dim)                       # (N, dim)
    n_per_side = 1 << level
    offsets = np.stack(np.meshgrid(*([[-1, 0, 1]] * dim),
                                   indexing="ij"), -1).reshape(-1, dim)
    offsets = offsets[~np.all(offsets == 0, axis=1)]       # drop self
    if xp is jnp:
        offsets = jnp.asarray(offsets)
    nb = b[..., None, :] + offsets                         # (N, 3^d-1, d)
    if periodic:
        nb = nb % n_per_side
        valid = xp.ones(nb.shape[:-1], dtype=bool)
    else:
        valid = xp.all((nb >= 0) & (nb < n_per_side), axis=-1)
        nb = xp.clip(nb, 0, n_per_side - 1)
    return coords_to_key(nb, level, dim), valid
