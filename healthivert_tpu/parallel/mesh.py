"""Device mesh + sharding specs: the TPU-native replacement for the
reference's torch.nn.DataParallel (/root/reference/models/networks.py:112-116).

Strategy (SURVEY.md §2.4): the nets are ~1M params, so parallelism is pure
data parallelism — batch sharded over the 'data' mesh axis, parameters
replicated, gradients all-reduced automatically by XLA's GSPMD partitioner
over ICI. A 'model' axis is kept in the mesh spec for forward-compatibility
(unused by the pix2pix graph).

Multi-host: call jax.distributed.initialize() before make_mesh; the same
NamedShardings then span hosts with DCN between slices.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(spec: str = "data:-1", devices=None) -> Mesh:
    """Build a Mesh from 'axis:n[,axis:n]'; n=-1 absorbs remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    axes = []
    sizes = []
    for part in spec.split(","):
        name, _, n = part.partition(":")
        axes.append(name.strip())
        sizes.append(int(n) if n else -1)
    known = int(np.prod([s for s in sizes if s > 0])) if any(s > 0 for s in sizes) else 1
    sizes = [s if s > 0 else len(devices) // known for s in sizes]
    total = int(np.prod(sizes))
    mesh_devices = np.array(devices[:total]).reshape(sizes)
    return Mesh(mesh_devices, tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_batch(batch: dict, size: int) -> dict:
    """Pad a batch dict's leading dim up to `size` by cyclic repetition.

    Used for trailing partial batches that must keep the compiled step's
    static shapes / divide a mesh axis; callers either accept the duplicate
    weighting (training: one step per epoch) or drop the padded rows from
    their reductions (eval)."""
    n = next(iter(batch.values())).shape[0]
    if n == size:
        return batch
    reps = -(-size // n)
    return {k: np.concatenate([np.asarray(v)] * reps)[:size] for k, v in batch.items()}


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data", global_batch=None) -> dict:
    """Place a host batch dict on the mesh, sharded along the batch dim.

    Single-process: `batch` is the full global batch (device_put splits it
    over the axis). Multi-process: `batch` is this PROCESS'S slice of the
    global batch (see distributed.process_batch_slice) and `global_batch`
    names the global leading dim; the global jax.Array is assembled from the
    per-process shards without any cross-host data movement."""
    sh = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        def place(v):
            gb = global_batch if global_batch is not None else (
                v.shape[0] * jax.process_count()
            )
            return jax.make_array_from_process_local_data(
                sh, np.asarray(v), (gb, *v.shape[1:])
            )
        return {k: place(v) for k, v in batch.items()}
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate_state(state, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh.

    Multi-process: every process holds an identical host copy (same init
    PRNGKey / restored checkpoint), so the global replicated Array is
    assembled from the local copies — no broadcast traffic."""
    rep = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda v: jax.make_array_from_process_local_data(
                rep, np.asarray(v), np.shape(v)
            ),
            state,
        )
    return jax.device_put(state, rep)
