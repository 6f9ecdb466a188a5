from .fmm import ParticleFMM
from .kifmm import KIFMM
from .kifmm_dist import KIFMMDist
from .adaptive import AdaptiveFMM
from .adaptive_dist import AdaptiveFMMDist

__all__ = ["ParticleFMM", "KIFMM", "KIFMMDist", "AdaptiveFMM",
           "AdaptiveFMMDist"]
