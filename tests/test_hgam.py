"""HGAM tests: classifier learns a separable task; Grad-CAM++ highlights the
discriminative region and normalizes correctly."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from healthivert_tpu.models.hgam import (
    FractureClassifier,
    classifier_train_step,
    grad_cam_pp,
)


def _toy_batch(rng, n=16, size=64):
    """Class 1 images carry a bright square in the top-left quadrant."""
    x = rng.standard_normal((n, size, size, 1)).astype(np.float32) * 0.1
    y = rng.integers(0, 2, n)
    for i in range(n):
        if y[i] == 1:
            x[i, 8:24, 8:24, 0] += 2.0
    return jnp.asarray(x), jnp.asarray(y)


def test_classifier_learns_and_cam_localizes(rng):
    model = FractureClassifier(width=8)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))
    opt_state = optax.scale_by_adam().init(params)
    acc = 0.0
    for step in range(60):
        x, y = _toy_batch(rng)
        params, opt_state, loss, acc = classifier_train_step(
            model, params, opt_state, x, y, jnp.float32(1e-3)
        )
    assert float(acc) > 0.9, float(acc)

    # CAM on a class-1 image must be in [0,1], peak inside the bright square
    x, y = _toy_batch(rng, n=8)
    pos = x[y == 1]
    cam = np.asarray(grad_cam_pp(model, params, pos, target_class=1))
    assert cam.shape == pos.shape
    assert cam.min() >= 0.0 and cam.max() <= 1.0 + 1e-6
    # energy concentrated in the discriminative quadrant (uniform would be 0.25)
    top_left = cam[:, :32, :32].sum(axis=(1, 2, 3))
    total = cam.sum(axis=(1, 2, 3)) + 1e-8
    assert float((top_left / total).mean()) > 0.35


def test_slices_for_z_context(rng):
    """2.5D extraction: channel d of sample z is slice z+d-k, clamped at the
    volume edges; z_context=0 reproduces the old single-channel shape."""
    import importlib.util as ilu
    import os

    spec = ilu.spec_from_file_location(
        "gcam", os.path.join(os.path.dirname(__file__), "..",
                             "Attention", "grad_CAM_3d_sagittal.py"))
    gcam = ilu.module_from_spec(spec)
    spec.loader.exec_module(gcam)

    h = w = 16
    nz = 10
    ct = rng.integers(0, 255, (h, w, nz)).astype(np.float64)
    labels = np.zeros((h, w, nz))
    labels[:, :, 1:9] = 20  # 8 vert slices -> central 4/5 = 6 centers
    sl0, idx, r0 = gcam._slices_for(ct, labels, 20, z_context=0)
    assert sl0.shape == (len(idx), h, w, 1) and r0 == 0
    sl2, idx2, _ = gcam._slices_for(ct, labels, 20, z_context=2)
    assert idx2 == idx and sl2.shape == (len(idx), h, w, 5)
    ctf = ct.astype(np.float32) / 255.0 * 2 - 1
    for i, z in enumerate(idx):
        np.testing.assert_array_equal(sl2[i, :, :, 2], ctf[:, :, z])  # center
        np.testing.assert_array_equal(
            sl2[i, :, :, 0], ctf[:, :, max(z - 2, 0)])  # clamped low edge
        np.testing.assert_array_equal(
            sl2[i, :, :, 4], ctf[:, :, min(z + 2, nz - 1)])
    np.testing.assert_array_equal(sl2[:, :, :, 2:3], sl0)


def test_slices_for_band(rng):
    """band=B crops B rows centered on the TARGET vertebra's row extent
    (clamped at the edges), localizing the per-vertebra label — a full
    straightened slice shows every vertebra of the case, so unbanded inputs
    carry conflicting labels across the case's vertebrae."""
    import importlib.util as ilu
    import os

    spec = ilu.spec_from_file_location(
        "gcam", os.path.join(os.path.dirname(__file__), "..",
                             "Attention", "grad_CAM_3d_sagittal.py"))
    gcam = ilu.module_from_spec(spec)
    spec.loader.exec_module(gcam)

    h, w, nz = 32, 16, 10
    ct = rng.integers(0, 255, (h, w, nz)).astype(np.float64)
    labels = np.zeros((h, w, nz))
    labels[4:10, :, 1:9] = 20   # target near the TOP edge (clamp case)
    labels[20:26, :, 1:9] = 21  # a second vertebra below
    sl, idx, r0 = gcam._slices_for(ct, labels, 20, z_context=0, band=8)
    assert sl.shape == (len(idx), 8, w, 1)
    assert r0 == 2  # centroid row int(6.5)=6 - band//2=4, clamped >= 0
    full, _, _ = gcam._slices_for(ct, labels, 20, z_context=0)
    np.testing.assert_array_equal(sl, full[:, r0:r0 + 8])
    # the second vertebra's band differs -> inputs are now label-consistent
    _, _, r1 = gcam._slices_for(ct, labels, 21, z_context=0, band=8)
    assert r1 != r0
    # band larger than the volume degrades to full height
    slf, _, r0f = gcam._slices_for(ct, labels, 20, z_context=0, band=99)
    assert slf.shape[1] == h and r0f == 0


def test_classifier_learns_25d(rng):
    """The classifier accepts multi-channel 2.5D input and Grad-CAM++ still
    emits a single-channel [0,1] heatmap of the input's spatial shape."""
    model = FractureClassifier(width=8)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)))
    opt_state = optax.scale_by_adam().init(params)
    rng_np = np.random.default_rng(0)
    for _ in range(30):
        x = rng_np.standard_normal((16, 64, 64, 5)).astype(np.float32) * 0.1
        y = rng_np.integers(0, 2, 16)
        for i in range(16):
            if y[i] == 1:
                x[i, 8:24, 8:24, :] += 1.0  # persists across channels
        params, opt_state, loss, acc = classifier_train_step(
            model, params, opt_state, jnp.asarray(x), jnp.asarray(y),
            jnp.float32(1e-3))
    assert float(acc) > 0.85, float(acc)
    cam = np.asarray(grad_cam_pp(model, params, jnp.asarray(x[:2])))
    assert cam.shape == (2, 64, 64, 1)
    assert cam.min() >= 0.0 and cam.max() <= 1.0 + 1e-6


def test_cam_finite_on_init_weights(rng):
    model = FractureClassifier(width=8)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 1)))
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 1)).astype(np.float32))
    cam = np.asarray(grad_cam_pp(model, params, x))
    assert np.isfinite(cam).all()
