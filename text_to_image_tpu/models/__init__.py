"""Model families: GAN-CLS (+GAN-INT), WGAN-CLS (+GP), StackGAN Stage-I/II.

Every model is a pair of pure functions per network:
``*_init(key, cfg, ...) -> (params, state)`` and an apply function.  The
registry maps config ``model`` names to a `ModelBundle` the trainer consumes.
"""

from text_to_image_tpu.models.registry import ModelBundle, get_model  # noqa: F401
