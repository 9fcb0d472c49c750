"""Subprocess worker for tests/test_multiprocess.py: one process of a REAL
multi-process `jax.distributed` training launch on the CPU backend (4 local
virtual devices per process; Gloo collectives between processes).

Not a pytest file — invoked as
    python mp_worker.py <pid> <nproc> <port> <dataroot> <ckpt_dir> <name> <out_json>
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
if os.environ.get("HV_DISABLE_COMPILE_CACHE") != "1":
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    dataroot, ckpt_dir, name, out_json = sys.argv[4:8]
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nproc,
            process_id=pid,
        )

    import numpy as np

    from healthivert_tpu.config.options import TrainOptions
    from healthivert_tpu.engine.train_loop import run_training

    opt = TrainOptions().parse(
        [
            "--dataroot", dataroot, "--name", name,
            "--checkpoints_dir", ckpt_dir, "--batch_size", "8",
            "--crop_size", "64", "--num_threads", "2", "--print_freq", "8",
            "--save_latest_freq", "1000000", "--seed", "0",
            # display at step 1: regression for the multi-process
            # _save_web_visuals deadlock (must run on host-local params)
            "--display_freq", "8",
        ]
    )
    state, cfg = run_training(opt, None, max_steps=1)

    g = jax.device_get(state.g_params)
    csum = float(
        sum(np.abs(l).astype(np.float64).sum() for l in jax.tree_util.tree_leaves(g))
    )
    with open(out_json, "w") as f:
        json.dump(
            {
                "pid": pid,
                "process_count": jax.process_count(),
                "global_devices": len(jax.devices()),
                "step": int(state.step),
                "g_checksum": csum,
            },
            f,
        )
    print(f"[p{pid}] done checksum={csum:.6f}", flush=True)


if __name__ == "__main__":
    main()
