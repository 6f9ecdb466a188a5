"""Shared-memory parallel algorithm primitives.

TPU-native equivalent of the reference's OpenMP algorithms (reference:
include/sctl/ompUtils.hpp:27-74 — omp_par::merge, merge_sort, reduce,
scan; SURVEY.md §2 parallelism mapping #2): on TPU these are XLA
primitives (`lax.sort`, `associative_scan`, fused reductions) — the
thread-level parallelism is the compiler's job.  Thin wrappers kept so
algorithm code reads like the reference.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def merge(a, b):
    """Merge two sorted arrays (omp_par::merge, ompUtils.txx:17)."""
    c = jnp.concatenate([a, b])
    return jnp.sort(c)


def merge_sort(x, keys=None):
    """Sort x (optionally by keys) — omp_par::merge_sort.

    Returns sorted x, or (sorted_keys, permuted_x) with keys."""
    if keys is None:
        return jnp.sort(x)
    order = jnp.argsort(keys, stable=True)
    return keys[order], x[order]


def reduce(x, op: str = "sum"):
    """Parallel reduction (omp_par::reduce)."""
    return {"sum": jnp.sum, "max": jnp.max, "min": jnp.min,
            "prod": jnp.prod}[op](x)


def scan(x, op: str = "sum", exclusive: bool = True):
    """Parallel prefix (omp_par::scan, exclusive by default like the
    reference's usage in tree construction)."""
    import jax.numpy as jnp
    fn = {"sum": jnp.add, "max": jnp.maximum, "min": jnp.minimum}[op]
    inc = lax.associative_scan(fn, x)
    if not exclusive:
        return inc
    if op == "sum":
        return inc - x
    # exclusive non-sum scan: shift right with identity
    ident = {"max": -jnp.inf, "min": jnp.inf}[op]
    return jnp.concatenate([jnp.asarray([ident], dtype=x.dtype),
                            inc[:-1]])
