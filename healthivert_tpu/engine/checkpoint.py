"""Checkpoint manager: full train state (params + all 4 optimizer states +
SN/batch stats + step), addressing the reference's gap of never saving
optimizer state (/root/reference/models/base_model.py:152-173 saves only
net weights).

Surface mirrors the reference cadence: a 'latest' alias plus per-epoch
checkpoints under {checkpoints_dir}/{name}/ (base_model.py naming
{epoch}_net_G.pth becomes {epoch}/ orbax directories).
"""

from __future__ import annotations

import os
import jax
import orbax.checkpoint as ocp
from flax import serialization


def _abs(path: str) -> str:
    return os.path.abspath(path)


def save_checkpoint(state, directory: str, tag: str = "latest") -> str:
    """Serialize a TrainState pytree to {directory}/{tag} (atomic).

    Multi-process contract: EVERY process must call this with the same path
    (a shared filesystem) — orbax runs a cross-process sync barrier and only
    the primary host writes. Gating the call on process_index()==0 deadlocks
    the barrier (observed as a Gloo GetKeyValue timeout on CPU meshes)."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(_abs(directory), str(tag))
    ckptr = ocp.StandardCheckpointer()
    # to pure nested-dict-of-arrays for a stable on-disk schema
    pure = serialization.to_state_dict(jax.device_get(state))
    ckptr.save(path, pure, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(state_template, directory: str, tag: str = "latest"):
    """Restore into the same pytree structure as state_template."""
    path = os.path.join(_abs(directory), str(tag))
    ckptr = ocp.StandardCheckpointer()
    target = serialization.to_state_dict(jax.device_get(state_template))
    restored = ckptr.restore(path, target)
    return serialization.from_state_dict(state_template, restored)


def latest_exists(directory: str, tag: str = "latest") -> bool:
    return os.path.isdir(os.path.join(_abs(directory), str(tag)))


def resolve_tag(opt) -> str:
    """Checkpoint tag from CLI flags: `--load_iter N` (>0) selects the
    `iter_N` checkpoint written by `--save_by_iter`, else `--epoch`
    (load_networks parity, /root/reference/models/base_model.py:82-88)."""
    load_iter = getattr(opt, "load_iter", 0) or 0
    return f"iter_{load_iter}" if load_iter > 0 else str(opt.epoch)


def save_generator(state, directory: str, tag: str = "generator"):
    """Export a generator-only checkpoint ({'g_params','g_sn'}) — the
    shippable artifact format of checkpoints/pretrained_synthetic (the full
    TrainState with 3 discriminators + optimizer moments is ~30x larger).
    Inverse of restore_generator."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(_abs(directory), str(tag))
    ckptr = ocp.StandardCheckpointer()
    pure = serialization.to_state_dict(
        jax.device_get({"g_params": state.g_params, "g_sn": state.g_sn})
    )
    ckptr.save(path, pure, force=True)
    ckptr.wait_until_finished()
    return path


def restore_generator(state, directory: str, tag: str = "generator"):
    """Restore a generator-only checkpoint ({'g_params','g_sn'}, e.g. the
    shipped checkpoints/pretrained_synthetic/generator) into a TrainState."""
    path = os.path.join(_abs(directory), str(tag))
    ckptr = ocp.StandardCheckpointer()
    template = serialization.to_state_dict(
        jax.device_get({"g_params": state.g_params, "g_sn": state.g_sn})
    )
    restored = ckptr.restore(path, template)
    g = serialization.from_state_dict(
        {"g_params": state.g_params, "g_sn": state.g_sn}, restored
    )
    return state.replace(g_params=g["g_params"], g_sn=g["g_sn"])


def restore_generator_pth(state, pth_path: str):
    """Overlay a reference torch .pth generator checkpoint (state dict from
    /root/reference/models/base_model.py:189-212 save format) onto the
    TrainState's generator params + SN vectors. No torch required — see
    utils/pth.py."""
    from healthivert_tpu.utils.pth import load_generator_pth

    params, sn, n = load_generator_pth(pth_path, state.g_params, state.g_sn)
    print(f"loaded {n} generator tensors from {pth_path}")
    return state.replace(g_params=params, g_sn=sn)


def restore_full_pth(state, g_pth_path: str, n_layers_d: int = 3):
    """Reference-checkpoint training resume: load `{epoch}_net_G.pth` plus
    any sibling `{epoch}_net_D_{1,2,3}.pth` discriminator checkpoints
    (load_networks semantics, /root/reference/models/base_model.py:189-212,
    which loads every net in model_names = ['G','D_1','D_2','D_3'] when
    training). Missing D files are skipped with a notice — the reference
    only ships/needs G for inference."""
    import os

    from healthivert_tpu.utils.pth import load_discriminator_pth

    state = restore_generator_pth(state, g_pth_path)
    g_dir, g_base = os.path.split(g_pth_path)
    if "_net_G" not in g_base:
        return state
    for i in (1, 2, 3):
        # replace on the basename only: a run *directory* containing
        # '_net_G' must not corrupt the sibling paths
        d_path = os.path.join(g_dir, g_base.replace("_net_G", f"_net_D_{i}"))
        if not os.path.exists(d_path):
            print(f"no discriminator checkpoint {d_path}; keeping initialized D_{i}")
            continue
        params = getattr(state, f"d{i}_params")
        stats = getattr(state, f"d{i}_stats")
        params, stats, n = load_discriminator_pth(d_path, params, stats, n_layers=n_layers_d)
        print(f"loaded {n} discriminator tensors from {d_path}")
        state = state.replace(**{f"d{i}_params": params, f"d{i}_stats": stats})
    return state
