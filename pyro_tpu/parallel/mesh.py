"""Device-mesh helpers.

TPU-native replacement for the reference's distributed backends (SURVEY
§2.9: Horovod ring-allreduce + torch.multiprocessing): one
``jax.sharding.Mesh`` whose axes name the parallelism — ``data`` for
data-parallel SVI (gradient psum rides ICI), ``chain`` for MCMC chains.
Multi-host setups call ``jax.distributed.initialize`` before this.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Build a mesh over available devices.

    Defaults to a 1-D ``data`` mesh over all devices.
    """
    if devices is None:
        devices = jax.devices()
    if axis_sizes is None:
        axis_sizes = (len(devices),)
    n = int(np.prod(axis_sizes))
    if n > len(devices):
        raise ValueError(
            f"mesh of {axis_sizes} needs {n} devices, have {len(devices)}"
        )
    dev_array = np.asarray(devices[:n]).reshape(axis_sizes)
    return Mesh(dev_array, tuple(axis_names))


def local_mesh(axis_name: str = "data") -> Mesh:
    return create_mesh(axis_names=(axis_name,))


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Place a batch pytree with its leading axis sharded over ``axis_name``."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
