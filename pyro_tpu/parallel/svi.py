"""Data-parallel SVI over a device mesh.

TPU-native replacement for ``pyro/optim/horovod.py:13`` (HorovodOptimizer)
+ ``examples/svi_horovod.py``: instead of ring-allreduce inside the
optimizer, the whole (loss, grad, update) step is jit-compiled with the
minibatch sharded over the ``data`` mesh axis and params replicated; XLA
inserts the gradient ``psum`` over ICI automatically from the sharding
constraint on the output params.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..infer.svi import SVI
from ..params.param_store import get_param_store
from .mesh import replicate, shard_batch


class DataParallelSVI(SVI):
    """SVI whose step shards ``*args`` leading axes over a mesh ``data``
    axis.  The ELBO's plate subsampling still works per-shard; the summed
    loss/grads are reduced across devices by XLA."""

    def __init__(self, model, guide, optim, loss, mesh: Optional[Mesh] = None, data_axis: str = "data", **kwargs):
        super().__init__(model, guide, optim, loss, **kwargs)
        if mesh is None:
            from .mesh import local_mesh

            mesh = local_mesh(data_axis)
        self.mesh = mesh
        self.data_axis = data_axis

    def _build_update_fn(self) -> None:
        super()._build_update_fn()
        base_update = self._update_fn
        mesh = self.mesh
        axis = self.data_axis
        rep = NamedSharding(mesh, P())
        shard = NamedSharding(mesh, P(axis))

        def sharded_update(params, opt_state, loss_state, rng_key, dyn, hstatic):
            params = jax.tree.map(
                lambda x: jax.device_put(x, rep), params
            )
            dyn = jax.tree.map(
                lambda x: jax.device_put(x, shard)
                if hasattr(x, "ndim") and x.ndim >= 1
                else x,
                dyn,
            )
            return base_update(
                params, opt_state, loss_state, rng_key, dyn, hstatic
            )

        self._update_fn = sharded_update
