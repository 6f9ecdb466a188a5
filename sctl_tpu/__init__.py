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

__version__ = "0.1.0"

__all__ = [
    "config", "quadmath", "mathutils",
    "Vector", "Matrix", "Permutation", "Tensor",
    "write_array", "read_array",
]
