from .fmm import ParticleFMM
from .kifmm import KIFMM

__all__ = ["ParticleFMM", "KIFMM"]
