"""Device mesh construction.

The TPU replacement for the reference's process topology (PS servers +
workers wired by TRAINING_ROLE/PADDLE_* env vars, run_gpubox.sh:10-43):
ONE SPMD program over a 2-D ``(dp, mp)`` mesh.

  * ``dp`` — data parallelism: the batch is split along it (reference P1,
    collective mode, tools/trainer.py:113-118).
  * ``mp`` — model parallelism for the sparse dimension: embedding tables
    are row-sharded along it (reference P6/P7, the GPU-PS / distributed-
    embedding modes).

Config keys: ``runner.mesh_dp`` / ``runner.mesh_mp`` (-1 = use all remaining
devices on dp). Defaults: mp spans all devices when distributed_embedding
is on, else everything on dp.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DP_AXIS = "dp"
MP_AXIS = "mp"


def create_mesh(
    dp: Optional[int] = None,
    mp: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None and mp is None:
        dp, mp = n, 1
    elif dp is None:
        dp = n // mp
    elif mp is None:
        mp = n // dp
    if dp * mp != n:
        raise ValueError(f"mesh {dp}x{mp} != device count {n}")
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, (DP_AXIS, MP_AXIS))


def mesh_from_config(cfg, devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    dp = cfg.runner("mesh_dp")
    mp = cfg.runner("mesh_mp")
    if dp is None and mp is None:
        if cfg.hyper("distributed_embedding", 0):
            # shard the table over every device; batch still data-parallel
            dp, mp = 1, n
        else:
            dp, mp = n, 1
    return create_mesh(
        None if dp in (None, -1) else int(dp),
        None if mp in (None, -1) else int(mp),
        devices,
    )
