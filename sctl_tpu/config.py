"""Runtime configuration for sctl_tpu.

The reference library (SCTL) is configured entirely through compile-time
preprocessor flags (reference: include/sctl/common.hpp:9-41, README.md:33-56;
see SURVEY.md §5.6).  A JAX library is configured at runtime instead: this
module provides a process-global `Config` dataclass populated from
environment variables (prefix ``SCTL_``), with the same "always-works
fallback" discipline the reference has (every optional feature degrades
gracefully: Pallas kernels fall back to pure-XLA paths, multi-device code
runs on a 1-device mesh).

Flag parity map (reference flag -> here):
  SCTL_MEMDEBUG        -> Config.debug (enables shape/dtype/NaN guard checks)
  SCTL_PROFILE=<level> -> Config.profile_level
  SCTL_VERBOSE         -> Config.verbose
  SCTL_DATA_PATH       -> Config.data_path (default ./data/, common.hpp:9-11)
  SCTL_QUAD_T          -> always available as double-double (sctl_tpu.quadmath)
  SCTL_MAX_DEPTH       -> Config.max_tree_depth (morton.hpp:10-12, =15)
  SCTL_SHMAXDEG        -> Config.sh_max_degree (sph_harm.hpp:13, =1024)
  SCTL_HAVE_MPI        -> n/a: device mesh size decides distribution
  SCTL_HAVE_BLAS/LAPACK/FFTW -> n/a: XLA provides these natively
"""

from __future__ import annotations

import dataclasses
import os


def _env_bool(name: str, default: bool) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v.lower() not in ("0", "false", "off", "")


def _env_int(name: str, default: int) -> int:
    v = os.environ.get(name)
    return int(v) if v else default


@dataclasses.dataclass
class Config:
    # Diagnostics (MEMDEBUG equivalent): extra validation of shapes/dtypes
    # and NaN tripwires in debug-checked entry points.
    debug: bool = dataclasses.field(
        default_factory=lambda: _env_bool("SCTL_MEMDEBUG", False))
    # Profiling depth: Profile.tic/toc deeper than this level are no-ops
    # (reference: profile.txx:529-533).
    profile_level: int = dataclasses.field(
        default_factory=lambda: _env_int("SCTL_PROFILE", -1))
    verbose: bool = dataclasses.field(
        default_factory=lambda: _env_bool("SCTL_VERBOSE", False))
    # Directory for cached precomputed tables (quadrature rules, SH
    # matrices) — reference: common.hpp:9-11.
    data_path: str = dataclasses.field(
        default_factory=lambda: os.environ.get("SCTL_DATA_PATH", "./data/"))
    # Morton key depth (levels). uint64 keys support DIM*depth+rank bits.
    max_tree_depth: int = dataclasses.field(
        default_factory=lambda: _env_int("SCTL_MAX_DEPTH", 15))
    sh_max_degree: int = dataclasses.field(
        default_factory=lambda: _env_int("SCTL_SHMAXDEG", 1024))
    # Force pure-XLA fallbacks instead of Pallas kernels (e.g. on CPU test
    # meshes).  Pallas paths also auto-detect non-TPU backends.
    disable_pallas: bool = dataclasses.field(
        default_factory=lambda: _env_bool("SCTL_DISABLE_PALLAS", False))
    # Use the Pallas interpreter (slow, debuggable) instead of Mosaic.
    pallas_interpret: bool = dataclasses.field(
        default_factory=lambda: _env_bool("SCTL_PALLAS_INTERPRET", False))
    # Newton-refine the P2P rsqrt (the reference's approx_rsqrt<digits>
    # pattern, vec.txx:357-370).  Measured on v5e: lax.rsqrt already
    # returns full-f32 rsqrt, so the refinement is redundant ALU work
    # in the hottest tile; default off on TPU (A/B via SCTL_P2P_NEWTON).
    p2p_newton: bool = dataclasses.field(
        default_factory=lambda: _env_bool("SCTL_P2P_NEWTON", False))
    # Packed-slab P2P stencil (p2p_stencil9: all 9 neighbor columns
    # pre-packed per slab, 8-granule per-box caps) instead of the 9
    # shifted-window kernel; ~33% fewer padded pair slots.  Read at
    # KIFMM setup time (A/B via SCTL_P2P_PACKED9=0).
    p2p_packed9: bool = dataclasses.field(
        default_factory=lambda: _env_bool("SCTL_P2P_PACKED9", True))
    # Sibling-blocked Pallas M2L (26 parent-direction block GEMMs)
    # instead of the 316-offset parity-masked sweep; 0.41x effective
    # flops at Laplace p=6 (A/B via SCTL_M2L_BLOCKED=0).  Read at
    # KIFMM setup time.
    m2l_blocked: bool = dataclasses.field(
        default_factory=lambda: _env_bool("SCTL_M2L_BLOCKED", True))


config = Config()


def use_pallas() -> bool:
    """True when Pallas TPU kernels should be used for the hot paths."""
    if config.disable_pallas:
        return False
    import jax
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def enable_compile_cache(path: str = None) -> bool:
    """Persistent XLA compilation cache (the reference's cached-tables
    discipline, common.hpp:9-11, applied to executables): compiled
    programs are serialized under SCTL_DATA_PATH/xla_cache and reused
    across processes — the depth-6 KIFMM program compiles in ~100 s
    cold, ~1 s from cache.  Opt-in (SCTL_COMPILE_CACHE=1 in the
    environment also enables it at import); returns success."""
    import os
    try:
        import jax
        cache = path or os.path.join(config.data_path, "xla_cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          2.0)
        return True
    except Exception:
        return False


if _env_bool("SCTL_COMPILE_CACHE", False):
    enable_compile_cache()


def _set_matmul_precision():
    """Default unannotated f32 matmuls to full-f32 precision.

    On TPU an unannotated f32 `jnp.dot`/`einsum` runs its MXU passes at
    bf16 (~1e-3 relative error); in a scientific library f32 must mean
    f32 — the reference evaluates everything at declared precision.
    Hot paths that measured their precision choice annotate it
    explicitly (KIFMM GEMMs use HIGHEST; the Pallas M2L uses an
    error-free bf16 3-pass split), so this only affects call sites
    that would otherwise be silently wrong (measured: O(1) errors in
    the Stokes FMM near field from bf16 + cancellation before the
    kernel applies were annotated).  Opt out (e.g. for throughput
    experiments) with SCTL_MATMUL_PRECISION=default."""
    import jax
    lvl = os.environ.get("SCTL_MATMUL_PRECISION", "highest")
    if lvl and lvl != "default":
        jax.config.update("jax_default_matmul_precision", lvl)


_set_matmul_precision()
