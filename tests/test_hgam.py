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


def test_cam_finite_on_init_weights(rng):
    model = FractureClassifier(width=8)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 1)))
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 1)).astype(np.float32))
    cam = np.asarray(grad_cam_pp(model, params, x))
    assert np.isfinite(cam).all()
