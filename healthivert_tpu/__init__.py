"""HealthiVert-TPU: a TPU-native (JAX/XLA/Pallas) framework for pseudo-healthy
vertebra synthesis and Genant fracture grading.

Ground-up rebuild of the capabilities of zhibaishouheilab/HealthiVert-GAN
(reference mounted at /root/reference) designed for TPU hardware:

- functional core: pure JAX functions over pytree state, one jitted train step
- NHWC layouts, static shapes, MXU-friendly batched einsum contextual attention
- data parallelism via jax.sharding.Mesh + NamedSharding (no DataParallel port)
- host-side IO (pure-numpy NIfTI) feeding a device prefetch pipeline

Subpackages
-----------
config      layered option system mirroring the reference CLI surface
ops         pure math: sobel/ssim/psnr/dice, mask geometry, contextual attention
models      flax.linen networks: coarse/fine generators, PatchGAN discriminators
parallel    mesh construction and sharding specs
data        datasets (aligned vertebra sampler, synthetic fixtures), prefetch
straighten  spine-straightening engine (curve resampling, de-pedicle masks)
evaluation  RHLV quantification, SVM Genant grading, generation metrics
engine      train loop, checkpointing, iterative 3D synthesis driver
utils       NIfTI IO, HTML galleries, logging
"""

__version__ = "0.1.0"
