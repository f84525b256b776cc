"""Device mesh construction for walker-parallel sampling."""

from __future__ import annotations

import jax
from jax.sharding import Mesh

WALKER_AXIS = "walkers"


def walker_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the walker axis.

    The sampling problem has a single natural parallel axis (walkers /
    simultaneous fits -- SURVEY.md section 5, long-context row), so the mesh
    is 1-D; multi-fit batching stacks on the same axis.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} "
                "available")
        devices = devices[:n_devices]
    return jax.make_mesh((len(devices),), (WALKER_AXIS,),
                         devices=devices)
