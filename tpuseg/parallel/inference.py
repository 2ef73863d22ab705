"""Batch-sharded multi-chip inference (the v5e-8 serving path).

Wraps a per-batch jitted model function so the batch dimension is sharded
across the mesh's "data" axis and params are replicated — XLA partitions the
whole program across chips over ICI. This is the throughput lever behind the
BASELINE targets (>=200 img/s YOLACT / >=100 img/s Mask R-CNN on 8 chips).
"""
from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from tpuseg.parallel.mesh import make_mesh


class ShardedInference:
    """Jits ``fn(params, *batch_args) -> pytree`` with batch-dim sharding.

    Batch args must have a leading batch axis divisible by the mesh's data
    size. Params are replicated once at construction.
    """

    def __init__(self, fn, params, mesh=None):
        self.mesh = mesh or make_mesh()
        self.data_size = self.mesh.shape["data"]
        batch_s = NamedSharding(self.mesh, P("data"))
        rep = NamedSharding(self.mesh, P())
        self.params = jax.device_put(params, rep)
        self._fn = jax.jit(
            fn,
            in_shardings=(rep, batch_s),
            out_shardings=batch_s,
        )

    def __call__(self, batch):
        return self._fn(self.params, batch)
