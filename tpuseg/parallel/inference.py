"""Batch-sharded multi-chip inference (the v5e-8 serving path).

Wraps a per-batch jitted model function so the batch dimension is sharded
across the mesh's "data" axis and params are replicated — XLA partitions the
whole program across chips over ICI. This is the throughput lever behind the
BASELINE targets (>=200 img/s YOLACT / >=100 img/s Mask R-CNN on 8 chips).

Two partitioning modes:
  - GSPMD (default): ``jit`` with in/out shardings; XLA propagates the
    sharding through the program. Right for pure-XLA pipelines (YOLACT).
  - ``use_shard_map=True``: the function runs per-shard under
    ``jax.shard_map`` with the local batch. This is the REQUIRED mode when
    the program contains ``pallas_call`` (Mask R-CNN's RoIAlign/NMS
    kernels): a Pallas custom call carries no SPMD partitioning rule, so
    under GSPMD it would be partitioned as a black box (replicated /
    all-gathered). shard_map sidesteps that — each chip launches the
    kernel on its own batch shard, which is exactly the data-parallel
    semantics we want. Validated in interpret mode on the virtual CPU mesh
    (tests/test_parallel.py, __graft_entry__.dryrun_multichip).
"""
from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from tpuseg.parallel.mesh import make_mesh


class ShardedInference:
    """Jits ``fn(params, *batch_args) -> pytree`` with batch-dim sharding.

    Batch args must have a leading batch axis divisible by the mesh's data
    size. Params are replicated once at construction. This is the single
    home of the multi-chip inference wiring — the YOLACT and Mask R-CNN
    engines build on it rather than re-implementing the mesh/shard_map
    plumbing.
    """

    def __init__(self, fn, params, mesh=None, use_shard_map=False,
                 n_batch_args: int = 1):
        self.mesh = mesh or make_mesh()
        self.data_size = self.mesh.shape["data"]
        batch_s = NamedSharding(self.mesh, P("data"))
        rep = NamedSharding(self.mesh, P())
        self.params = jax.device_put(params, rep)
        if use_shard_map:
            inner = jax.shard_map(
                fn, mesh=self.mesh,
                in_specs=(P(),) + (P("data"),) * n_batch_args,
                out_specs=P("data"), check_vma=False)
            self._fn = jax.jit(inner)
        else:
            self._fn = jax.jit(
                fn,
                in_shardings=(rep,) + (batch_s,) * n_batch_args,
                out_shardings=batch_s,
            )

    def __call__(self, *batch_args):
        return self._fn(self.params, *batch_args)
