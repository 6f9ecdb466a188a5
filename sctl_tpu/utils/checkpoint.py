"""Checkpoint / resume of array state.

TPU-native equivalent of the reference's serialization layer (reference:
Vector::Write/Read vector.hpp:94-117, Matrix::Write/Read
matrix.hpp:81-104 — binary container IO used for caching precomputed
tables under SCTL_DATA_PATH; SURVEY.md §5.4 maps this to "orbax-style
array checkpoint of precomputed tables + optional solver state").

Container-level binary IO (with cross-dtype conversion) lives in
sctl_tpu.containers.write_array/read_array; this module adds pytree
checkpointing for solver state (e.g. a Krylov preconditioner's
subspaces, SDC integration state) via orbax when available, with a
numpy .npz fallback.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def save(path: str, tree: Any) -> None:
    """Save a pytree of arrays to `path` (directory for orbax, .npz
    for the fallback)."""
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), tree, force=True)
    except ImportError:
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        np.savez(path if path.endswith(".npz") else path + ".npz",
                 treedef=np.frombuffer(
                     repr(treedef).encode(), dtype=np.uint8),
                 **{f"leaf_{i}": np.asarray(a)
                    for i, a in enumerate(leaves)})


def restore(path: str, like: Any = None) -> Any:
    """Restore a pytree saved by `save`.  `like` (an example pytree)
    is required by the npz format and recommended for orbax.

    Dispatches on the ON-DISK format (orbax writes a directory, the
    fallback writes a .npz file), not on whether orbax imports — a
    checkpoint written in one environment restores in the other.
    """
    npz_path = path if path.endswith(".npz") else path + ".npz"
    if os.path.isfile(npz_path) and not os.path.isdir(path):
        z = np.load(npz_path)
        assert like is not None, "npz restore needs `like`"
        leaves, treedef = jax.tree_util.tree_flatten(like)
        new = [z[f"leaf_{i}"] for i in range(len(leaves))]
        return jax.tree_util.tree_unflatten(treedef, new)
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    if like is not None:
        return ckptr.restore(os.path.abspath(path), item=like)
    return ckptr.restore(os.path.abspath(path))


def save_krylov_precond(path: str, kp) -> None:
    """Persist a KrylovPrecond's recycled subspaces (reference use
    case: reuse across solver runs, lin-solve.hpp:21-64).

    Uses the self-describing .npz layout directly (flat q_i/u_i keys +
    n_pairs) so restore never needs a structural template."""
    arrs = {"n": np.asarray(kp._n),
            "n_pairs": np.asarray(len(kp._pairs))}
    for i, (q, u) in enumerate(kp._pairs):
        arrs[f"q_{i}"] = np.asarray(q)
        arrs[f"u_{i}"] = np.asarray(u)
    np.savez(path if path.endswith(".npz") else path + ".npz", **arrs)


def restore_krylov_precond(path: str):
    from ..linalg.gmres import KrylovPrecond
    import jax.numpy as jnp
    z = np.load(path if path.endswith(".npz") else path + ".npz")
    kp = KrylovPrecond()
    kp._n = int(z["n"])
    kp._pairs = [(jnp.asarray(z[f"q_{i}"]), jnp.asarray(z[f"u_{i}"]))
                 for i in range(int(z["n_pairs"]))]
    return kp
