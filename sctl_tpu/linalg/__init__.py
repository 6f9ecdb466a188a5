from .gmres import (GMRES, KrylovPrecond, gmres, gmres_device,
                    fgmres, fgmres_device, gmres_ld)
from .lagrange import interpolation_matrix, derivative_matrix
from .quadrule import cheb_quad_rule, leg_quad_rule, InterpQuadRule
from .ode import SDC
from . import cheb
from .fft import FFT
from .sph_harm import (SphericalHarmonics, sh_dim, stokes_eval_sl,
                       stokes_eval_dl, stokes_eval_kl,
                       stokes_eval_kself, stokes_pressure_sl)

__all__ = [
    "GMRES", "KrylovPrecond", "gmres", "gmres_device",
    "fgmres", "fgmres_device", "gmres_ld",
    "interpolation_matrix", "derivative_matrix",
    "cheb_quad_rule", "leg_quad_rule", "InterpQuadRule",
    "SDC", "FFT",
]
