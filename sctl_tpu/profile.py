"""Profiler: Tic/Toc blocks, counters, expression-DSL report.

TPU-native equivalent of the reference profiler (reference:
include/sctl/profile.hpp:21-202, profile.txx:250-533; SURVEY.md §5.1):
a global store of named atomic counters (TIME, FLOP, comm messages/bytes,
custom) plus an event log of Tic/Toc block entries/exits with counter
snapshots, and a report printer that evaluates named expressions like
``f/s`` over per-block counter deltas.

Differences forced by the execution model:
  - TIME is host wall-clock; `sync=True` blocks on device completion
    (`jax.block_until_ready` replaces the MPI barrier in Profile::Tic).
  - FLOPs are credited explicitly by kernels from their static cost
    models (kernel FLOPS/interaction, as kernel_functions.hpp:20 does) —
    XLA does not report dynamic FLOP counts.
  - Counter increments are host-side; they must not be called inside a
    traced (jit) region — kernels credit counters at call sites, which
    run at trace/dispatch time on host, counting per *call*, not per
    trace. Wrap-and-count helpers take care to count on every dispatch.
  - `jax.profiler` trace capture can be toggled around a block with
    ``Profile.device_trace`` for XLA-level inspection.

The compile-time gate SCTL_PROFILE=<level> becomes the runtime
``config.profile_level``: blocks deeper than the level are skipped
(profile.txx:529-533 behavior).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import jax

from .config import config

# Counter names mirror profile.hpp:21-38.
COUNTERS = (
    "TIME", "FLOP",
    "ALLOC_COUNT", "ALLOC_BYTES", "FREE_COUNT", "FREE_BYTES",
    "COMM_COUNT", "COMM_BYTES", "COLL_COUNT", "COLL_BYTES",
    "CUSTOM0", "CUSTOM1", "CUSTOM2", "CUSTOM3", "CUSTOM4",
)


@dataclass
class _Block:
    name: str
    depth: int
    t_start: float
    snapshot: Dict[str, float]
    t_stop: Optional[float] = None
    snapshot_stop: Optional[Dict[str, float]] = None
    children: List["_Block"] = field(default_factory=list)


class _ProfileData:
    def __init__(self):
        self.counters: Dict[str, float] = {c: 0.0 for c in COUNTERS}
        self.root = _Block("root", -1, time.perf_counter(),
                           dict(self.counters))
        self.stack: List[_Block] = [self.root]
        self.enabled = True
        # expression DSL fields: name -> fn(delta_counters, dt) -> value
        self.fields: Dict[str, Callable] = {}

    def reset(self):
        self.__init__()


_data = _ProfileData()


class Profile:
    """Static facade, mirroring the reference's `Profile` class API."""

    @staticmethod
    def reset():
        _data.reset()

    @staticmethod
    def enable(flag: bool = True):
        _data.enabled = flag

    @staticmethod
    def increment_counter(name: str, value: float):
        _data.counters[name] = _data.counters.get(name, 0.0) + value

    @staticmethod
    def get_counter(name: str) -> float:
        return _data.counters.get(name, 0.0)

    @staticmethod
    def tic(name: str, sync: bool = False, level: int = 0):
        """Open a named timing block (profile.hpp:72).

        sync=True waits for all outstanding device work first so the
        block measures only its own dispatches.
        """
        if not _data.enabled or level > config.profile_level:
            return
        if sync:
            _sync_devices()
        if config.verbose:
            print("  " * len(_data.stack) + f"[prof] {name}")
        blk = _Block(name, len(_data.stack) - 1, time.perf_counter(),
                     dict(_data.counters))
        _data.stack[-1].children.append(blk)
        _data.stack.append(blk)

    @staticmethod
    def toc(sync: bool = False):
        if not _data.enabled or len(_data.stack) <= 1:
            return
        if sync:
            _sync_devices()
        blk = _data.stack.pop()
        blk.t_stop = time.perf_counter()
        blk.snapshot_stop = dict(_data.counters)

    @staticmethod
    @contextlib.contextmanager
    def scoped(name: str, sync: bool = False, level: int = 0):
        """RAII block (reference: Profile::Scoped, profile.hpp:82-100)."""
        active = _data.enabled and level <= config.profile_level
        if active:
            Profile.tic(name, sync=sync, level=level)
        try:
            yield
        finally:
            if active:
                Profile.toc(sync=sync)

    @staticmethod
    def set_prof_field(name: str, fn: Callable):
        """Register a custom report column: fn(deltas, dt) -> float
        (reference: SetProfField, profile.hpp:143)."""
        _data.fields[name] = fn

    @staticmethod
    def print_report(fields=("t", "f", "f/s", "comm_bytes"),
                     out=None) -> str:
        """Walk the block tree, print per-block counter-delta fields.

        Default fields mirror the reference report: t (seconds),
        f (GFLOP), f/s (GFLOP/s), comm_bytes.
        """
        lines = []
        header = f"{'block':40s}" + "".join(f"{f:>14s}" for f in fields)
        lines.append(header)
        lines.append("-" * len(header))

        def field_value(fname, deltas, dt):
            if fname == "t":
                return dt
            if fname == "f":
                return deltas.get("FLOP", 0.0) / 1e9
            if fname == "f/s":
                return deltas.get("FLOP", 0.0) / 1e9 / max(dt, 1e-12)
            if fname == "comm_bytes":
                return (deltas.get("COMM_BYTES", 0.0)
                        + deltas.get("COLL_BYTES", 0.0))
            # distributed reductions over controller processes
            # (reference: CommReduceExpr t_min/t_max/t_avg/f_total,
            # profile.txx:293-304).  Under the single-controller model
            # one process drives all chips; with multi-process JAX the
            # reduction runs across controllers.
            if fname in ("t_min", "t_max", "t_avg", "f_total",
                         "f/s_total"):
                base = (dt if fname.startswith("t_")
                        else deltas.get("FLOP", 0.0) / 1e9)
                vals = _process_gather(base)
                if fname == "t_min":
                    return min(vals)
                if fname == "t_max":
                    return max(vals)
                if fname == "t_avg":
                    return sum(vals) / len(vals)
                if fname == "f_total":
                    return sum(vals)
                return sum(vals) / max(dt, 1e-12)
            if fname in _data.fields:
                return _data.fields[fname](deltas, dt)
            return deltas.get(fname, 0.0)

        def walk(blk: _Block, indent: int):
            if blk.name != "root":
                t_stop = blk.t_stop or time.perf_counter()
                snap_stop = blk.snapshot_stop or _data.counters
                dt = t_stop - blk.t_start
                deltas = {k: snap_stop.get(k, 0.0) - blk.snapshot.get(k, 0.0)
                          for k in snap_stop}
                label = ("  " * indent + blk.name)[:40]
                row = f"{label:40s}" + "".join(
                    f"{field_value(f, deltas, dt):>14.6g}" for f in fields)
                lines.append(row)
            for c in blk.children:
                walk(c, indent + (0 if blk.name == "root" else 1))

        walk(_data.root, 0)
        report = "\n".join(lines)
        if out is None:
            print(report)
        else:
            out.write(report)
        return report

    @staticmethod
    def xla_cost(jitted_fn, *args) -> dict:
        """Static FLOP/byte estimates from the compiled HLO — feeds the
        same f / f/s reporting the reference derives from per-kernel
        FLOP models (profile.txx:266-267)."""
        compiled = jitted_fn.lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0] if ca else {}
        return {"flops": ca.get("flops", 0.0),
                "bytes": ca.get("bytes accessed", 0.0)}

    @staticmethod
    @contextlib.contextmanager
    def device_trace(logdir: str):
        """Capture an XLA device trace around a block (jax.profiler)."""
        jax.profiler.start_trace(logdir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()


def _process_gather(v: float):
    """Gather a host scalar from every controller process (1-element
    list in the single-controller case)."""
    if jax.process_count() == 1:
        return [v]
    try:
        from jax.experimental import multihost_utils
        import numpy as _np
        return list(_np.atleast_1d(
            multihost_utils.process_allgather(_np.float64(v))))
    except Exception:
        return [v]


def _sync_devices():
    try:
        for d in jax.live_arrays():
            d.block_until_ready()
    except Exception:
        pass


def _tracing() -> bool:
    try:
        from jax._src import core as _core
        return not _core.trace_state_clean()
    except Exception:
        return False


def _bump_counters(pairs):
    for name, v in pairs:
        Profile.increment_counter(name, float(v))


def _credit(pairs):
    """Increment counters; when called from inside a traced (jit)
    region, register a debug callback so the increment fires once per
    EXECUTION, not once per trace — otherwise cached executable reruns
    would be invisible (the reference counts at runtime,
    comm.txx:229-230).  Gated on profile_level so the hot path pays
    nothing when profiling is off (the reference's SCTL_PROFILE
    compile-time gate, profile.txx:529-533).

    Caveats: inside shard_map the callback fires once per SHARD, so
    counts aggregate over ranks (the single-controller analogue of
    per-rank counters); an eagerly-executed (un-jitted) shard_map does
    not deliver debug callbacks — jit the enclosing computation.  Read
    counters after `jax.effects_barrier()`."""
    if not _tracing():
        _bump_counters(pairs)
        return
    if not _data.enabled or config.profile_level < 1:
        return
    jax.debug.callback(lambda: _bump_counters(pairs))


def add_flops(n: float):
    """Credit FLOPs from a kernel's static cost model
    (reference: generic-kernel.txx:188)."""
    _credit((("FLOP", n),))


def add_comm(count: int, nbytes: float, collective: bool = True):
    """Credit a communication event (reference: comm.txx:229-230)."""
    if collective:
        _credit((("COLL_COUNT", count), ("COLL_BYTES", nbytes)))
    else:
        _credit((("COMM_COUNT", count), ("COMM_BYTES", nbytes)))
