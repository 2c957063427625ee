"""InceptionV3 architecture smoke (shapes + torch state-dict conversion)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text_to_image_tpu.eval import inception_v3 as iv3


@pytest.mark.slow
def test_forward_shape():
    params = iv3.init(jax.random.PRNGKey(0), num_classes=10)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3),
                              minval=-1, maxval=1)
    logits = iv3.apply(params, imgs)
    assert logits.shape == (1, 10)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow   # the convert chain is covered end-to-end in test_is_parity
def test_param_tree_matches_torchvision_names():
    """Every torchvision key we expect maps to a unit in our tree: build a
    fake state dict from our random params and round-trip it."""
    params = iv3.init(jax.random.PRNGKey(0), num_classes=7)

    sd = {}

    def put(prefix, unit):
        w = np.transpose(np.asarray(unit["w"]), (3, 2, 0, 1))  # HWIO→OIHW
        sd[f"{prefix}.conv.weight"] = w
        sd[f"{prefix}.bn.weight"] = np.asarray(unit["bn_scale"])
        sd[f"{prefix}.bn.bias"] = np.asarray(unit["bn_bias"])
        sd[f"{prefix}.bn.running_mean"] = np.asarray(unit["bn_mean"])
        sd[f"{prefix}.bn.running_var"] = np.asarray(unit["bn_var"])

    for ours, tv in iv3._TV_UNIT.items():
        put(tv, params[ours])
    for name, kind, _, _ in iv3._MIXED:
        for okey, tv in iv3._TV_BRANCH[kind].items():
            put(f"Mixed_{name}.{tv}", params[f"mixed_{name}"][okey])
    sd["fc.weight"] = np.asarray(params["fc"]["w"]).T
    sd["fc.bias"] = np.asarray(params["fc"]["b"])

    restored = iv3.params_from_torch_state_dict(sd)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
