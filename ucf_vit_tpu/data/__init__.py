from ucf_vit_tpu.data.quadtree import FixedQuadTree, Rect
from ucf_vit_tpu.data.octree import Cube, FixedOctTree
from ucf_vit_tpu.data.transform import Patchify, Patchify3D

__all__ = [
    "FixedQuadTree",
    "Rect",
    "Cube",
    "FixedOctTree",
    "Patchify",
    "Patchify3D",
]
