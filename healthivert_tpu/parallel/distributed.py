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

    Returns True if running multi-process after the call.
    """
    global _initialized
    if _initialized or jax.process_count() > 1:
        _initialized = True
        return jax.process_count() > 1
    want = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if want:
        jax.distributed.initialize()
        _initialized = True
    return jax.process_count() > 1


def process_batch_slice(global_batch: int) -> slice:
    """The host-local slice of a globally-indexed batch (each process feeds
    its own shard of the data-parallel batch)."""
    per = global_batch // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)
