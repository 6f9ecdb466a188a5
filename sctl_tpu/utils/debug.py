"""Diagnosability tools: the functional-setting MEMDEBUG.

The reference's memory-safety machinery (reference: SCTL_MEMDEBUG fat
iterators with per-dereference bounds/lifetime checks iterator.txx:42-55,
arena poisoning mem_mgr.txx:39-46, signal-handler stack traces
stacktrace.h:112-131; SURVEY.md §5.2) guards a mutable-pointer world.
XLA owns memory here; what remains checkable is VALUES and SHAPES:

  check_finite(x, name)  — NaN/Inf tripwire (jit-compatible via
                           jax.debug; eager raises)
  guard(fn)              — decorator: checks all array args/results
                           finite when config.debug is on
  enable_nan_debugging() — flips jax_debug_nans (XLA-level traps)
  install_traceback()    — faulthandler-based native stack traces on
                           SIGSEGV/SIGABRT/SIGFPE (stacktrace.h role)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import config


def check_finite(x, name: str = "array"):
    """NaN/Inf tripwire.  Inside jit: prints via jax.debug; eager:
    raises FloatingPointError."""
    if not config.debug:
        return x
    if isinstance(jnp.asarray(x), jax.core.Tracer):
        bad = jnp.logical_not(jnp.all(jnp.isfinite(x)))
        jax.debug.print(
            "SCTL WARNING: non-finite values in {n}: {b}", n=name,
            b=bad)
        return x
    if not bool(jnp.all(jnp.isfinite(x))):
        raise FloatingPointError(f"non-finite values in {name}")
    return x


def guard(fn):
    """Check all floating array inputs/outputs of fn when debug is on
    (the per-access MEMDEBUG discipline at function granularity)."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        if config.debug:
            for i, a in enumerate(jax.tree_util.tree_leaves(
                    (args, kwargs))):
                if hasattr(a, "dtype") and jnp.issubdtype(
                        a.dtype, jnp.floating):
                    check_finite(a, f"{fn.__name__} arg {i}")
        out = fn(*args, **kwargs)
        if config.debug:
            for i, a in enumerate(jax.tree_util.tree_leaves(out)):
                if hasattr(a, "dtype") and jnp.issubdtype(
                        a.dtype, jnp.floating):
                    check_finite(a, f"{fn.__name__} out {i}")
        return out
    return wrapped


def enable_nan_debugging(flag: bool = True):
    """XLA-level NaN traps (jax_debug_nans): errors point at the
    producing op — the reference's fail-fast SCTL_ASSERT analogue."""
    jax.config.update("jax_debug_nans", flag)


def install_traceback():
    """Native stack traces on fatal signals (reference:
    stacktrace.h:112-131 signal handlers)."""
    import faulthandler
    faulthandler.enable(all_threads=True)
