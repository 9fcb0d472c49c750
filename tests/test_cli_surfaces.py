"""CLI surface smoke tests: every entry script parses --help (catches import
and argparse wiring breakage) and the --mesh flag drives the sharded path."""

import subprocess
import sys

import pytest

SCRIPTS = [
    "train.py",
    "test.py",
    "eval_3d_sagittal_twostage.py",
    "evaluation/RHLV_quantification.py",
    "evaluation/SVM_grading.py",
    "evaluation/SVM_grading_2.5d.py",
    "evaluation/generation_eval_sagittal.py",
    "straighten/location_json_local.py",
    "straighten/straighten_mask_3d.py",
    "Attention/grad_CAM_3d_sagittal.py",
]


@pytest.mark.parametrize("script", SCRIPTS)
def test_cli_help(script):
    r = subprocess.run(
        [sys.executable, script, "--help"],
        capture_output=True, text=True, timeout=180, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert "usage" in r.stdout.lower()


def test_train_mesh_flag(tmp_path):
    """--mesh data:8 shards the batch over the virtual CPU mesh."""
    import jax

    import train

    opt_argv = [
        "--dataset_mode", "synthetic", "--name", "mesh8", "--model", "pix2pix",
        "--batch_size", "8", "--crop_size", "64", "--n_epochs", "1",
        "--n_epochs_decay", "0", "--mesh", "data:8", "--ndf", "8",
        "--checkpoints_dir", str(tmp_path), "--print_freq", "64",
        "--save_epoch_freq", "99", "--eval_freq", "99",
    ]
    state, cfg = train.main(opt_argv)
    assert int(jax.device_get(state.step)) > 0


def test_train_mesh_indivisible_batch(tmp_path):
    import pytest as _pytest

    import train

    with _pytest.raises(ValueError, match="must divide"):
        train.main([
            "--dataset_mode", "synthetic", "--name", "bad", "--model", "pix2pix",
            "--batch_size", "6", "--crop_size", "64", "--mesh", "data:8",
            "--checkpoints_dir", str(tmp_path),
        ])
