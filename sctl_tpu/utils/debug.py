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


def shape_contract(**specs):
    """Declarative shape/dtype contracts on public entry points — the
    functional analogue of MEMDEBUG's per-dereference bounds checking
    (reference iterator.txx:42-55 checks every access against the
    allocation's extent; here the extent IS the static shape, so the
    check happens once, at the API boundary).

    Specs map argument names to shape tuples whose entries are ints
    (exact), strings (symbolic dims — equal strings must match across
    all arguments), or None (any).  A trailing spec entry "float"/
    "int" constrains the dtype kind.  Checks run only when
    config.debug (SCTL_MEMDEBUG) is on; violations raise ValueError
    eagerly with the offending argument named.

        @shape_contract(xt=("N", 3), xs=("M", 3), f=("M", None))
        def direct(xt, xs, f): ...
    """
    import inspect

    def deco(fn):
        sig = inspect.signature(fn)

        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            if config.debug:
                bound = sig.bind_partial(*args, **kwargs)
                dims = {}
                for name, spec in specs.items():
                    if name not in bound.arguments:
                        continue
                    a = bound.arguments[name]
                    if a is None or not hasattr(a, "shape"):
                        continue
                    shape_spec = [s for s in spec
                                  if not isinstance(s, str)
                                  or s not in ("float", "int")]
                    kind = [s for s in spec
                            if isinstance(s, str)
                            and s in ("float", "int")]
                    if len(a.shape) != len(shape_spec):
                        raise ValueError(
                            f"{fn.__name__}: {name} has rank "
                            f"{len(a.shape)}, contract wants "
                            f"{len(shape_spec)} ({spec})")
                    for d, s in zip(a.shape, shape_spec):
                        if s is None:
                            continue
                        if isinstance(s, int):
                            if d != s:
                                raise ValueError(
                                    f"{fn.__name__}: {name} dim {d} "
                                    f"!= {s} (contract {spec})")
                        else:
                            if s in dims and dims[s] != d:
                                raise ValueError(
                                    f"{fn.__name__}: {name} dim "
                                    f"'{s}'={d} inconsistent with "
                                    f"{dims[s]}")
                            dims[s] = d
                    if kind:
                        want = (jnp.floating if kind[0] == "float"
                                else jnp.integer)
                        if not jnp.issubdtype(a.dtype, want):
                            raise ValueError(
                                f"{fn.__name__}: {name} dtype "
                                f"{a.dtype} is not {kind[0]}")
            return fn(*args, **kwargs)
        return wrapped
    return deco


def checked_call(fn, *args, **kwargs):
    """Run a traceable fn under jax.experimental.checkify with index
    OOB + NaN + div-by-zero checks and RAISE on the first error — the
    in-jit bounds story MEMDEBUG provides for pointers
    (iterator.txx:42-55); gather/scatter indices inside jit are the
    TPU analogue of raw pointer arithmetic.  Use in debug sessions:

        out = checked_call(jax.jit(f), x)
    """
    from jax.experimental import checkify
    errs = (checkify.index_checks | checkify.nan_checks
            | checkify.div_checks)
    err, out = checkify.checkify(fn, errors=errs)(*args, **kwargs)
    err.throw()
    return out
