"""Multi-host initialization helper.

Single-pod DP runs need nothing beyond a Mesh over jax.devices(); this
wrapper exists for multi-host (DCN-connected) deployments: call
`ensure_initialized()` before building a mesh, driven by the standard
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars (or
cloud auto-detection, which jax.distributed.initialize handles natively).

There is no hand-rolled communication layer anywhere in this framework —
cross-device work is expressed as shardings and XLA collectives
(SURVEY.md §2.4, §5).
"""

from __future__ import annotations

import os

import jax

_initialized = False


def ensure_initialized() -> bool:
    """Idempotently initialize jax.distributed when env vars request it.

    Returns True if running multi-process after the call. On the first
    multi-process call it also runs a tiny cross-process all-reduce: the
    backend's collective contexts (Gloo on CPU, ICI/DCN setup on TPU) are
    established lazily at the FIRST collective, whose rendezvous has a short
    timeout — doing it eagerly here, before any large per-host compilations
    can skew the processes apart, keeps the real first step out of that
    window (observed as a 30s Gloo GetKeyValue timeout on skewed hosts).
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    if jax.process_count() > 1:
        _initialized = True
        _collective_handshake()
        return True
    want = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if want:
        jax.distributed.initialize()
        _initialized = True
        if jax.process_count() > 1:
            _collective_handshake()
    return jax.process_count() > 1


def _collective_handshake() -> None:
    """One tiny all-reduce over all devices to set up collective contexts."""
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("d",))
    sh = NamedSharding(mesh, P("d"))
    local = np.ones((len(jax.local_devices()),), np.float32)
    g = jax.make_array_from_process_local_data(sh, local, (len(devs),))
    out = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(g)
    assert float(out) == float(len(devs))


def process_batch_slice(global_batch: int) -> slice:
    """The host-local slice of a globally-indexed batch (each process feeds
    its own shard of the data-parallel batch)."""
    per = global_batch // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)
