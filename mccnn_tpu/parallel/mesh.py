"""Device mesh construction.

The reference has no multi-device runtime at all — its only parallelism is
manual per-image process sharding via ``--start/--end``
(reference: src/match.py:26-28) and a CUDA_VISIBLE_DEVICES flag that never
places ops on more than one GPU (reference: src/train.py:42). Here, scaling
is a first-class ``jax.sharding.Mesh``: the 'data' axis carries
patch-batch data parallelism in training and spatial/image sharding in
matching, with XLA inserting the ICI collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    num_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over the first ``num_devices`` available devices.

    With the default 1-D shape, all devices land on the first axis. Pass
    ``shape`` for multi-axis meshes (e.g. ``(2, 4)`` with axis_names
    ``('data', 'disp')``) or an explicit ``devices`` list (e.g.
    ``jax.devices('cpu')`` for a virtual test mesh).
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is None:
        num_devices = len(devices)
    if num_devices > len(devices):
        raise ValueError(
            f"requested {num_devices} devices, only {len(devices)} available"
        )
    devices = devices[:num_devices]
    if shape is None:
        shape = (num_devices,) + (1,) * (len(axis_names) - 1)
    grid = np.asarray(devices).reshape(shape)
    return Mesh(grid, axis_names=tuple(axis_names))
