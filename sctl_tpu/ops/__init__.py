from .kernels import (
    KernelSpec, Laplace3D_FxU, Laplace3D_DxU, Laplace3D_FxdU,
    Stokes3D_FxU, Stokes3D_DxU, Stokes3D_FxT, Stokes3D_FSxU,
    Stokes3D_FxUP, KERNELS,
)
from .direct import direct_eval, kernel_matrix, direct_eval_blocked

__all__ = [
    "KernelSpec", "Laplace3D_FxU", "Laplace3D_DxU", "Laplace3D_FxdU",
    "Stokes3D_FxU", "Stokes3D_DxU", "Stokes3D_FxT", "Stokes3D_FSxU",
    "Stokes3D_FxUP", "KERNELS",
    "direct_eval", "kernel_matrix", "direct_eval_blocked",
]
