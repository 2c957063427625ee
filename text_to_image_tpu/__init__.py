"""text_to_image_tpu — a TPU-native JAX framework for conditional text-to-image GANs.

A ground-up rebuild of the capabilities of ``crisbodnar/text-to-image``
(GAN-CLS / GAN-INT, WGAN-CLS with gradient penalty, StackGAN Stage-I/II,
char-CNN-RNN-embedding conditioning, Inception-score evaluation), designed
TPU-first:

* every model is a pure function over an explicit parameter pytree,
* the full alternating G/D update schedule compiles to ONE XLA program
  (``jax.jit``) — including the WGAN-GP double-backprop,
* data parallelism is expressed with ``jax.sharding`` over a device mesh so
  gradient all-reduce rides the ICI interconnect,
* hot elementwise/conditioning paths have fused Pallas TPU kernels behind the
  same functional signatures (see ``text_to_image_tpu.ops.pallas``).

The reference is TensorFlow 1.x, single-process, single-device; see SURVEY.md
at the repo root for the complete component map this package implements.
"""

__version__ = "0.1.0"

from text_to_image_tpu.config import Config, load_config  # noqa: F401
