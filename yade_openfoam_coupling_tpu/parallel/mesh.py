"""Device-mesh construction helpers."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "x") -> Mesh:
    """1-D device mesh over the first `n_devices` devices (all by default).

    The slab decomposition this feeds (grid axis 0 over `axis_name`) is the
    TPU-native replacement of OpenFOAM's decomposePar + Pstream ranks: one
    ring of ICI neighbours, halo width 1."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))
