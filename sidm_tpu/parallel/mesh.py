"""Device mesh and particle sharding.

The reference's parallel model is spatial domain decomposition over MPI ranks
(ORB splits, domain.c:31-145) with explicit particle migration. The TPU
analog: a 1D device mesh with the particle arrays sharded along N. Because
the force path Morton-sorts internally, keeping shards Morton-contiguous at
load time gives every device a compact spatial domain — the decomposition
falls out of the sort, no migration protocol needed (resharding IS the
domain decomposition: one all-to-all when re-sorting globally).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "shard"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devices), (AXIS,))


def particle_sharding(mesh: Mesh) -> NamedSharding:
    """All per-particle arrays sharded along axis 0."""
    return NamedSharding(mesh, P(AXIS))


def shard_particles(p, mesh: Mesh):
    """Place a Particles pytree with axis-0 sharding over the mesh.

    The padded particle count must divide by the mesh size (pad_to_multiple
    in make_particles handles this)."""
    sh = particle_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), p)


def morton_presort(pos, *arrays, box=0.0):
    """Host-side Morton pre-sort so contiguous shards are spatial domains."""
    import jax.numpy as jnp

    from ..ops.morton import bounding_cube, morton_keys

    posj = jnp.asarray(np.asarray(pos, np.float32))
    valid = jnp.ones(posj.shape[0], bool)
    origin, extent = bounding_cube(posj, valid, box=box)
    keys = np.asarray(morton_keys(posj, origin, extent))
    order = np.argsort(keys)
    return (np.asarray(pos)[order],) + tuple(np.asarray(a)[order]
                                             for a in arrays)
