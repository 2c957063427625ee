"""Weight initializers matching the reference's TF1/DCGAN recipe.

The reference op library (``utils/ops.py``, DCGAN-tensorflow lineage) uses
``tf.random_normal_initializer(stddev=0.02)`` for conv / deconv / linear
weights, ``random_normal_initializer(1.0, 0.02)`` for batch-norm scale, and
zeros for biases.  GAN convergence is sensitive to these choices (SURVEY.md §7
"hard parts" #6), so they are reproduced exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DEFAULT_STDDEV = 0.02


def normal(key, shape, stddev: float = DEFAULT_STDDEV, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * jnp.asarray(stddev, dtype)


def bn_scale(key, shape, dtype=jnp.float32):
    return 1.0 + jax.random.normal(key, shape, dtype) * jnp.asarray(0.02, dtype)


def zeros(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)
