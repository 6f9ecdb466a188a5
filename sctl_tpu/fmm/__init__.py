from .fmm import ParticleFMM
from .kifmm import KIFMM
from .kifmm_dist import KIFMMDist

__all__ = ["ParticleFMM", "KIFMM", "KIFMMDist"]
