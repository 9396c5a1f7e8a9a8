"""Process-wide parallel context.

The trainer announces the active mesh here; layers that have a distributed
fast path (SlotEmbedding → ShardedEmbedding) pick it up without threading
mesh handles through every model constructor.  Single-device runs leave the
context empty and layers fall back to their local implementations.
"""

from __future__ import annotations

from typing import Optional

from jax.sharding import Mesh

from paddlerec_tpu.parallel.mesh import MP_AXIS

_MESH: Optional[Mesh] = None


def set_mesh(mesh: Optional[Mesh]) -> None:
    global _MESH
    _MESH = mesh


def get_mesh() -> Optional[Mesh]:
    return _MESH


def model_parallel_size() -> int:
    return _MESH.shape[MP_AXIS] if _MESH is not None else 1


class use_mesh:
    """Context manager: set the active mesh for a scope."""

    def __init__(self, mesh: Optional[Mesh]):
        self.mesh = mesh
        self.prev: Optional[Mesh] = None

    def __enter__(self):
        self.prev = get_mesh()
        set_mesh(self.mesh)
        return self.mesh

    def __exit__(self, *exc):
        set_mesh(self.prev)
        return False
