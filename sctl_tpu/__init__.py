"""sctl_tpu — TPU-native scientific-computing framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of SCTL (the
header-only C++11 library surveyed in SURVEY.md): boundary-integral-
equation solvers, kernel-independent particle FMM over Morton-ordered
distributed trees, matrix-free distributed GMRES with Krylov-subspace
recycling, spectral deferred correction ODE integration, spherical
harmonic / FFT transforms, generalized Chebyshev quadrature generation,
and the supporting substrate (sharded containers, mesh collectives,
Pallas VPU/MXU kernels, profiling).

Parallelism is expressed the TPU way: a `jax.sharding.Mesh` + shard_map
with XLA collectives over ICI replaces MPI; Pallas kernels replace the
SIMD `Vec<T,N>` layer; XLA fusion replaces OpenMP.
"""

from . import config as _config_mod
from .config import config
from . import quadmath
from . import mathutils
from .containers import Vector, Matrix, Permutation, Tensor
from .containers import write_array, read_array
from .profile import Profile

__version__ = "0.1.0"

__all__ = [
    "config", "quadmath", "mathutils", "Profile",
    "Vector", "Matrix", "Permutation", "Tensor",
    "write_array", "read_array",
]

# subpackages (imported lazily by attribute to keep import light):
#   sctl_tpu.comm    — mesh collectives + distributed data verbs
#   sctl_tpu.ops     — kernel library, direct eval, Pallas P2P
#   sctl_tpu.linalg  — GMRES/KrylovPrecond, SDC, quadrature, FFT, SH
#   sctl_tpu.tree    — Morton, PtTree/UniformTree, VTU output
#   sctl_tpu.fmm     — ParticleFMM facade + KIFMM engine
#   sctl_tpu.bie     — BoundaryIntegralOp + parametric patches
#   sctl_tpu.utils   — par primitives, debug tools
#   sctl_tpu.native  — C++ host runtime (Morton, radix sort)


def __getattr__(name):
    import importlib
    if name in ("comm", "ops", "linalg", "tree", "fmm", "bie", "utils",
                "native"):
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
