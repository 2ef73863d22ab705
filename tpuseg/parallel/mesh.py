"""Device mesh + sharding utilities (the jt.mpi / NCCL-DDP replacement).

The reference's distribution story is MPI-launched data parallelism with NCCL
collectives at the framework level (SURVEY.md §2.7, §5). The TPU-native
equivalent is declarative: build a ``jax.sharding.Mesh`` over the chips,
annotate batch-dim shardings, and let XLA insert all-reduce/all-gather over
ICI. One axis ("data") covers every model in this zoo (all ≤100M params —
weights replicate; see SURVEY §2.7: TP/PP/SP/EP not required). A second
optional "model" axis is plumbed through for oversized future configs.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, model_parallel: int = 1) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"make_mesh({n_devices}) but only {len(devs)} devices visible; "
                "refusing to silently under-provision the mesh"
            )
        devs = devs[:n_devices]
    n = len(devs)
    assert n % model_parallel == 0
    arr = np.asarray(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of [B, ...] arrays with B sharded across 'data'."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)
