"""sivae_tpu — TPU-native Soft-IntroVAE framework for 3D brain MRI.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
M-hayatooo/Soft-intro-VAE-for-3D-MRI (PyTorch): Soft-IntroVAE / VAE / CAE
model families over 3D MRI volumes, two-phase adversarial training, data
pipeline, evaluation (reconstruction quality, latent separability, CBIR
retrieval), checkpointing and metrics.

Layout is NDHWC (channels-last) throughout — the TPU-native convolution
layout — and all hot paths run inside a single jitted train step designed
for `jax.sharding.Mesh` data parallelism.
"""

__version__ = "0.1.0"

from sivae_tpu import config as config  # noqa: F401
