from .morton import (
    morton_encode, morton_decode, morton_ancestor, morton_children,
    morton_neighbors, box_coords, MAX_DEPTH_3D,
)
from .tree import PtTree, UniformTree

__all__ = [
    "morton_encode", "morton_decode", "morton_ancestor",
    "morton_children", "morton_neighbors", "box_coords", "MAX_DEPTH_3D",
    "PtTree", "UniformTree",
]
