from .morton import (
    morton_encode, morton_decode, morton_ancestor, morton_children,
    morton_neighbors, box_coords, MAX_DEPTH_3D,
)
from .tree import PtTree, UniformTree
from .dist_tree import DistPtTree

__all__ = [
    "DistPtTree",
    "morton_encode", "morton_decode", "morton_ancestor",
    "morton_children", "morton_neighbors", "box_coords", "MAX_DEPTH_3D",
    "PtTree", "UniformTree",
]
