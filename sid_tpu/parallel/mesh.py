"""Mesh construction and sharding placement for the site/profile axes."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SITE_AXIS = "sites"


def make_site_mesh(
    n_devices: Optional[int] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """1-D mesh over the site axis (all local devices by default)."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (SITE_AXIS,))


def row_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 over the mesh; replicate the rest."""
    return NamedSharding(mesh, P(SITE_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_profiles(mesh: Mesh, profiles: np.ndarray, mult: np.ndarray):
    """Place (already padded) profile arrays sharded over the mesh.

    The pad size must be divisible by the mesh size; zero-mult rows make the
    padding inert (compound_neg_log_likelihood's mult guard).
    """
    prof_s = jax.device_put(profiles, row_sharding(mesh, 2))
    mult_s = jax.device_put(mult, row_sharding(mesh, 1))
    return prof_s, mult_s
