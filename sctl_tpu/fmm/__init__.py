from .fmm import ParticleFMM
from .kifmm import KIFMM
from .kifmm_dist import KIFMMDist
from .kifmm_ld import KIFMMLd
from .adaptive import AdaptiveFMM
from .adaptive_dist import AdaptiveFMMDist

__all__ = ["ParticleFMM", "KIFMM", "KIFMMDist", "KIFMMLd",
           "AdaptiveFMM", "AdaptiveFMMDist"]
