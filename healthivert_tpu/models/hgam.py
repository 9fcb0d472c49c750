"""HGAM: Height-loss Guided Attention Module — fracture classifier + Grad-CAM++.

The reference consumes per-vertebra Grad-CAM++ heatmap NIfTIs
(data/aligned_dataset.py:162-171, eval_3d_sagittal_twostage.py:170-181,
suffix _0/_1 = binary classifier class) but the generating script
(`Attention/grad_CAM_3d_sagittal.py`, invoked in README.md:99) is NOT in the
repo — it lives in a sibling project. This module is a ground-up design
(SURVEY.md §2.2): a small conv fracture classifier over straightened
sagittal slices and a jitted Grad-CAM++ implementation over its last conv
features.

Grad-CAM++ (Chattopadhay et al., 2018) closed form on logit gradients g:
  alpha = g^2 / (2 g^2 + sum_{ij} A g^3),  w_k = sum_{ij} alpha * relu(g),
  cam = relu(sum_k w_k A_k), max-normalized, upsampled to input size.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from healthivert_tpu.ops.image import resize_nearest


class FractureClassifier(nn.Module):
    """Conv encoder -> GAP -> 2-class logits (normal / fractured)."""

    width: int = 32
    dtype: Any = None

    def setup(self):
        w = self.width
        self.convs = [
            nn.Conv(f, (3, 3), strides=(s, s), padding=1, name=f"conv{i}")
            for i, (f, s) in enumerate([(w, 2), (w * 2, 2), (w * 4, 2), (w * 4, 2)])
        ]
        self.norms = [
            nn.GroupNorm(num_groups=8, name=f"gn{i}") for i in range(4)
        ]
        self.fc = nn.Dense(2, name="fc")

    def features(self, x):
        for conv, norm in zip(self.convs, self.norms):
            x = nn.relu(norm(conv(x)))
        return x  # (B, H/16, W/16, 4w)

    def head(self, feats):
        return self.fc(jnp.mean(feats, axis=(1, 2)))

    def __call__(self, x):
        return self.head(self.features(x))

    # separate feature/head application for grad-CAM
    def apply_features(self, variables, x):
        return self.apply(variables, x, method="features")

    def apply_head(self, variables, feats):
        return self.apply(variables, feats, method="head")


@functools.partial(jax.jit, static_argnames=("model", "target_class"))
def grad_cam_pp(model: FractureClassifier, variables, x, target_class: int = 1):
    """Grad-CAM++ heatmaps for a batch of slices.

    x: (B, H, W, 1) in [-1, 1]. Returns (B, H, W, 1) in [0, 1].
    """
    feats = model.apply_features(variables, x)

    def score(f):
        return model.apply_head(variables, f)[:, target_class].sum()

    g = jax.grad(score)(feats)  # (B, h, w, C)
    g2 = g * g
    g3 = g2 * g
    denom = 2.0 * g2 + jnp.sum(feats * g3, axis=(1, 2), keepdims=True)
    alpha = g2 / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    w = jnp.sum(alpha * nn.relu(g), axis=(1, 2), keepdims=True)  # (B,1,1,C)
    cam = nn.relu(jnp.sum(w * feats, axis=-1, keepdims=True))  # (B,h,w,1)
    cam = cam / (jnp.max(cam, axis=(1, 2, 3), keepdims=True) + 1e-8)
    return resize_nearest(cam, x.shape[1], x.shape[2])


def classifier_loss(model, params, batch_x, batch_y):
    logits = model.apply(params, batch_x)
    onehot = jax.nn.one_hot(batch_y, 2)
    ce = -jnp.mean(jnp.sum(onehot * jax.nn.log_softmax(logits), axis=-1))
    acc = jnp.mean((jnp.argmax(logits, -1) == batch_y).astype(jnp.float32))
    return ce, acc


@functools.partial(jax.jit, static_argnames=("model",), donate_argnums=(1, 2))
def classifier_train_step(model, params, opt_state, batch_x, batch_y, lr):
    import optax

    opt = optax.scale_by_adam()

    def loss_fn(p):
        return classifier_loss(model, p, batch_x, batch_y)

    (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, jax.tree_util.tree_map(lambda u: -lr * u, updates))
    return params, opt_state, loss, acc
