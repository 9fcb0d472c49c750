"""Config options, visualizer sinks, prefetcher semantics."""

import json
import os
import types

import numpy as np
import pytest

from healthivert_tpu.config.options import TestOptions, TrainOptions
from healthivert_tpu.data.prefetch import prefetch_to_device
from healthivert_tpu.engine.visualizer import HTMLGallery, Visualizer, save_images, tensor2im


def test_train_options_defaults(tmp_path):
    opt = TrainOptions().parse(
        ["--name", "t", "--checkpoints_dir", str(tmp_path), "--model", "pix2pix"],
        save=True,
    )
    # reference defaults incl. pix2pix overrides (pix2pix_model.py:67-70)
    assert opt.lr == 2e-4 and opt.beta1 == 0.5
    assert opt.gan_mode == "vanilla" and opt.pool_size == 0
    assert opt.lambda_L1 == 200.0
    assert opt.n_epochs == 200 and opt.n_epochs_decay == 800
    assert opt.batch_size == 12 and opt.vert_class == "normal"
    assert opt.isTrain
    # resolved options persisted (base_options.py:94-117)
    assert (tmp_path / "t" / "train_opt.txt").exists()


def test_test_options_known_only():
    opt = TestOptions().parse(
        ["--name", "t", "--n_epochs", "5"], save=False, known_only=True
    )
    assert opt.phase == "test" and not opt.isTrain


def test_options_reject_unknown_when_strict():
    with pytest.raises(SystemExit):
        TestOptions().parse(["--definitely_not_a_flag", "1"], save=False)


def test_visualizer_loss_log_format(tmp_path):
    opt = types.SimpleNamespace(checkpoints_dir=str(tmp_path), name="v")
    viz = Visualizer(opt)
    viz.print_current_losses(3, 64, {"G_GAN": 0.5, "h": 1.25}, 0.1, 0.02)
    log = (tmp_path / "v" / "loss_log.txt").read_text()
    assert "(epoch: 3, iters: 64" in log and "G_GAN: 0.500" in log
    viz.log_scalars("train", {"a": 1.0}, 10)
    rec = json.loads((tmp_path / "v" / "metrics.jsonl").read_text().strip())
    assert rec["tag"] == "train" and rec["a"] == 1.0 and rec["step"] == 10


def test_html_gallery(tmp_path, rng):
    g = HTMLGallery(str(tmp_path / "web"), "t")
    save_images(g, {"fake": rng.random((8, 8, 1)).astype(np.float32)}, "0001")
    g.save()
    html = (tmp_path / "web" / "index.html").read_text()
    assert "0001_fake.png" in html
    assert os.path.exists(tmp_path / "web" / "images" / "0001_fake.png")


def test_tensor2im_ranges():
    x = np.array([[-1.0, 0.0, 1.0]])
    np.testing.assert_array_equal(tensor2im(x), [[0, 127, 255]])
    y = np.array([[0.0, 0.5, 1.0]])
    np.testing.assert_array_equal(tensor2im(y, 0.0, 1.0), [[0, 127, 255]])


def test_visual_rendering_keyed_by_label_not_content():
    """The same visual must map identically regardless of its pixel content:
    an all-positive CT crop stays on the [-1,1] mapping, and a CAM/seg with a
    tiny negative artifact stays on [0,1] (code-review r3: the old
    im.min()<0 heuristic doubled brightness / flattened CAMs)."""
    from healthivert_tpu.engine.visualizer import visual_to_uint8

    ct = np.array([[0.0, 0.5, 1.0]])  # all-positive CT content
    np.testing.assert_array_equal(visual_to_uint8("fake_B", ct), [[127, 191, 255]])
    cam = np.array([[-0.001, 0.5, 1.0]])  # tiny negative artifact
    got = visual_to_uint8("CAM", cam)
    np.testing.assert_array_equal(got, [[0, 127, 255]])
    seg = np.array([[0.0, 1.0]])
    np.testing.assert_array_equal(visual_to_uint8("fake_B_mask", seg), [[0, 255]])
    flow = np.array([[0.0, 1.0]])
    np.testing.assert_array_equal(visual_to_uint8("offset_flow", flow), [[0, 255]])


def test_html_gallery_history_accumulates(tmp_path, rng):
    """history=True galleries rebuild index.html from ALL rows ever written
    (newest first), across instances — the reference training page lists
    every epoch, not only the latest (util/visualizer.py:198-211)."""
    web = str(tmp_path / "web")
    for epoch in (1, 2):
        g = HTMLGallery(web, "training progress", history=True)
        save_images(g, {"fake": rng.random((8, 8, 1)).astype(np.float32)},
                    f"epoch{epoch:03d}", header=f"epoch [{epoch}]")
        g.save()
    html = (tmp_path / "web" / "index.html").read_text()
    assert "epoch001_fake.png" in html and "epoch002_fake.png" in html
    assert html.index("epoch [2]") < html.index("epoch [1]")  # newest first


def test_prefetch_order_and_errors():
    out = list(prefetch_to_device(range(5), lambda x: x * 2))
    assert out == [0, 2, 4, 6, 8]

    def bad():
        yield 1
        raise RuntimeError("boom")

    it = prefetch_to_device(bad(), lambda x: x)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(it)
