"""InceptionV3 in functional JAX — the classifier backbone of the reference's
Inception-score protocol (SURVEY.md §3.5: dataset-finetuned Inception, lineage
hanzhanggit/StackGAN-inception-model → openai/improved-gan).

Implements the standard InceptionV3 topology (Szegedy et al. 2015,
torchvision layout, aux head omitted — eval only): stem convs → InceptionA×3
→ B → C×4 → D → E×2 → global pool → FC.  Every conv is conv+BN(eps 1e-3)+ReLU
in NHWC so the whole network jits into one MXU-friendly XLA program; IS eval
runs as batched on-device inference.

Weights: `params_from_torch_state_dict` converts a torchvision-format
``.pth``/state-dict (OIHW → HWIO, fc transpose) — use it to import the
dataset-finetuned checkpoints the reference evaluates with; the architecture
is weight-compatible.  `init` gives random weights for pipeline tests.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax

from text_to_image_tpu.utils import prng

_DIMS = ("NHWC", "HWIO", "NHWC")


# --- conv+bn+relu unit ---------------------------------------------------------

def _unit_init(key, kh, kw, cin, cout):
    # He-scaled init, NOT torchvision's trunc_normal(std=0.1): that std
    # assumes live batch-norm renormalizes each unit, but `_unit` applies
    # BN as FIXED buffers (inference semantics — imported weights carry the
    # running stats), so a from-scratch finetune (evaluate_iv3) needs the
    # init itself to preserve activation scale through ~40 sequential units
    std = jnp.sqrt(2.0 / (kh * kw * cin))
    w = jax.random.truncated_normal(key, -2, 2, (kh, kw, cin, cout)) * std
    return {"w": w.astype(jnp.float32),
            "bn_scale": jnp.ones((cout,)), "bn_bias": jnp.zeros((cout,)),
            "bn_mean": jnp.zeros((cout,)), "bn_var": jnp.ones((cout,))}


def _unit(p, x, stride=1, padding="SAME"):
    y = lax.conv_general_dilated(x, p["w"].astype(x.dtype),
                                 (stride, stride), padding,
                                 dimension_numbers=_DIMS,
                                 preferred_element_type=x.dtype)
    y32 = y.astype(jnp.float32)
    inv = lax.rsqrt(p["bn_var"] + 1e-3) * p["bn_scale"]
    y32 = (y32 - p["bn_mean"]) * inv + p["bn_bias"]
    return jax.nn.relu(y32).astype(x.dtype)


def _pad(ph, pw):
    return [(ph, ph), (pw, pw)]


def _maxpool3s2(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1),
                             (1, 2, 2, 1), "VALID")


def _avgpool3s1(x):
    s = lax.reduce_window(x, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                          [(0, 0), (1, 1), (1, 1), (0, 0)])
    n = lax.reduce_window(jnp.ones_like(x), 0.0, lax.add, (1, 3, 3, 1),
                          (1, 1, 1, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    return s / n


# --- inception blocks ------------------------------------------------------------

def _block_a_init(key, cin, pool_features):
    k = prng.split_tree(key, ("b1", "b5_1", "b5_2", "d1", "d2", "d3", "p"))
    return {
        "b1": _unit_init(k["b1"], 1, 1, cin, 64),
        "b5_1": _unit_init(k["b5_1"], 1, 1, cin, 48),
        "b5_2": _unit_init(k["b5_2"], 5, 5, 48, 64),
        "d1": _unit_init(k["d1"], 1, 1, cin, 64),
        "d2": _unit_init(k["d2"], 3, 3, 64, 96),
        "d3": _unit_init(k["d3"], 3, 3, 96, 96),
        "p": _unit_init(k["p"], 1, 1, cin, pool_features),
    }


def _block_a(p, x):
    b1 = _unit(p["b1"], x)
    b5 = _unit(p["b5_2"], _unit(p["b5_1"], x), padding=_pad(2, 2))
    d = _unit(p["d3"], _unit(p["d2"], _unit(p["d1"], x), padding=_pad(1, 1)),
              padding=_pad(1, 1))
    pool = _unit(p["p"], _avgpool3s1(x))
    return jnp.concatenate([b1, b5, d, pool], -1)


def _block_b_init(key, cin):
    k = prng.split_tree(key, ("b3", "d1", "d2", "d3"))
    return {
        "b3": _unit_init(k["b3"], 3, 3, cin, 384),
        "d1": _unit_init(k["d1"], 1, 1, cin, 64),
        "d2": _unit_init(k["d2"], 3, 3, 64, 96),
        "d3": _unit_init(k["d3"], 3, 3, 96, 96),
    }


def _block_b(p, x):
    b3 = _unit(p["b3"], x, stride=2, padding="VALID")
    d = _unit(p["d2"], _unit(p["d1"], x), padding=_pad(1, 1))
    d = _unit(p["d3"], d, stride=2, padding="VALID")
    return jnp.concatenate([b3, d, _maxpool3s2(x)], -1)


def _block_c_init(key, cin, c7):
    k = prng.split_tree(key, ("b1", "s1", "s2", "s3",
                              "d1", "d2", "d3", "d4", "d5", "p"))
    return {
        "b1": _unit_init(k["b1"], 1, 1, cin, 192),
        "s1": _unit_init(k["s1"], 1, 1, cin, c7),
        "s2": _unit_init(k["s2"], 1, 7, c7, c7),
        "s3": _unit_init(k["s3"], 7, 1, c7, 192),
        "d1": _unit_init(k["d1"], 1, 1, cin, c7),
        "d2": _unit_init(k["d2"], 7, 1, c7, c7),
        "d3": _unit_init(k["d3"], 1, 7, c7, c7),
        "d4": _unit_init(k["d4"], 7, 1, c7, c7),
        "d5": _unit_init(k["d5"], 1, 7, c7, 192),
        "p": _unit_init(k["p"], 1, 1, cin, 192),
    }


def _block_c(p, x):
    b1 = _unit(p["b1"], x)
    s = _unit(p["s2"], _unit(p["s1"], x), padding=_pad(0, 3))
    s = _unit(p["s3"], s, padding=_pad(3, 0))
    d = _unit(p["d2"], _unit(p["d1"], x), padding=_pad(3, 0))
    d = _unit(p["d3"], d, padding=_pad(0, 3))
    d = _unit(p["d4"], d, padding=_pad(3, 0))
    d = _unit(p["d5"], d, padding=_pad(0, 3))
    pool = _unit(p["p"], _avgpool3s1(x))
    return jnp.concatenate([b1, s, d, pool], -1)


def _block_d_init(key, cin):
    k = prng.split_tree(key, ("t1", "t2", "s1", "s2", "s3", "s4"))
    return {
        "t1": _unit_init(k["t1"], 1, 1, cin, 192),
        "t2": _unit_init(k["t2"], 3, 3, 192, 320),
        "s1": _unit_init(k["s1"], 1, 1, cin, 192),
        "s2": _unit_init(k["s2"], 1, 7, 192, 192),
        "s3": _unit_init(k["s3"], 7, 1, 192, 192),
        "s4": _unit_init(k["s4"], 3, 3, 192, 192),
    }


def _block_d(p, x):
    t = _unit(p["t2"], _unit(p["t1"], x), stride=2, padding="VALID")
    s = _unit(p["s2"], _unit(p["s1"], x), padding=_pad(0, 3))
    s = _unit(p["s3"], s, padding=_pad(3, 0))
    s = _unit(p["s4"], s, stride=2, padding="VALID")
    return jnp.concatenate([t, s, _maxpool3s2(x)], -1)


def _block_e_init(key, cin):
    k = prng.split_tree(key, ("b1", "s1", "s2a", "s2b",
                              "d1", "d2", "d3a", "d3b", "p"))
    return {
        "b1": _unit_init(k["b1"], 1, 1, cin, 320),
        "s1": _unit_init(k["s1"], 1, 1, cin, 384),
        "s2a": _unit_init(k["s2a"], 1, 3, 384, 384),
        "s2b": _unit_init(k["s2b"], 3, 1, 384, 384),
        "d1": _unit_init(k["d1"], 1, 1, cin, 448),
        "d2": _unit_init(k["d2"], 3, 3, 448, 384),
        "d3a": _unit_init(k["d3a"], 1, 3, 384, 384),
        "d3b": _unit_init(k["d3b"], 3, 1, 384, 384),
        "p": _unit_init(k["p"], 1, 1, cin, 192),
    }


def _block_e(p, x):
    b1 = _unit(p["b1"], x)
    s = _unit(p["s1"], x)
    s = jnp.concatenate([_unit(p["s2a"], s, padding=_pad(0, 1)),
                         _unit(p["s2b"], s, padding=_pad(1, 0))], -1)
    d = _unit(p["d2"], _unit(p["d1"], x), padding=_pad(1, 1))
    d = jnp.concatenate([_unit(p["d3a"], d, padding=_pad(0, 1)),
                         _unit(p["d3b"], d, padding=_pad(1, 0))], -1)
    pool = _unit(p["p"], _avgpool3s1(x))
    return jnp.concatenate([b1, s, d, pool], -1)


# --- full network ----------------------------------------------------------------

_STEM = (("1a", 3, 3, 3, 32), ("2a", 3, 3, 32, 32), ("2b", 3, 3, 32, 64),
         ("3b", 1, 1, 64, 80), ("4a", 3, 3, 80, 192))

_MIXED = (("5b", "a", 192, 32), ("5c", "a", 256, 64), ("5d", "a", 288, 64),
          ("6a", "b", 288, None), ("6b", "c", 768, 128), ("6c", "c", 768, 160),
          ("6d", "c", 768, 160), ("6e", "c", 768, 192), ("7a", "d", 768, None),
          ("7b", "e", 1280, None), ("7c", "e", 2048, None))

_BLOCK_INIT = {"a": _block_a_init, "b": _block_b_init, "c": _block_c_init,
               "d": _block_d_init, "e": _block_e_init}
_BLOCK_APPLY = {"a": _block_a, "b": _block_b, "c": _block_c, "d": _block_d,
                "e": _block_e}


def init(key, num_classes: int = 1000) -> Dict:
    params: Dict = {}
    for name, kh, kw, cin, cout in _STEM:
        params[f"conv_{name}"] = _unit_init(jax.random.fold_in(key, hashs(name)),
                                            kh, kw, cin, cout)
    for name, kind, cin, extra in _MIXED:
        k = jax.random.fold_in(key, hashs("mix" + name))
        params[f"mixed_{name}"] = (_BLOCK_INIT[kind](k, cin, extra)
                                   if extra is not None
                                   else _BLOCK_INIT[kind](k, cin))
    kfc = jax.random.fold_in(key, hashs("fc"))
    params["fc"] = {
        "w": jax.random.normal(kfc, (2048, num_classes)) * 0.01,
        "b": jnp.zeros((num_classes,)),
    }
    return params


def hashs(s: str) -> int:
    import zlib
    return zlib.crc32(s.encode()) % (2**31)


def apply(params: Dict, images: jax.Array) -> jax.Array:
    """images[B,H,W,3] in tanh range [-1,1] → logits[B, num_classes].
    Resizes to 299×299 (the inception input) with bilinear interpolation."""
    x = images.astype(jnp.float32)
    if x.shape[1] != 299:
        x = jax.image.resize(x, (x.shape[0], 299, 299, 3), "bilinear")
    x = _unit(params["conv_1a"], x, stride=2, padding="VALID")
    x = _unit(params["conv_2a"], x, padding="VALID")
    x = _unit(params["conv_2b"], x, padding=_pad(1, 1))
    x = _maxpool3s2(x)
    x = _unit(params["conv_3b"], x, padding="VALID")
    x = _unit(params["conv_4a"], x, padding="VALID")
    x = _maxpool3s2(x)
    for name, kind, _, _ in _MIXED:
        x = _BLOCK_APPLY[kind](params[f"mixed_{name}"], x)
    x = jnp.mean(x, axis=(1, 2))
    return x @ params["fc"]["w"] + params["fc"]["b"]


# --- torchvision weight import -----------------------------------------------

_TV_UNIT = {  # our unit name → torchvision module prefix
    "conv_1a": "Conv2d_1a_3x3", "conv_2a": "Conv2d_2a_3x3",
    "conv_2b": "Conv2d_2b_3x3", "conv_3b": "Conv2d_3b_1x1",
    "conv_4a": "Conv2d_4a_3x3",
}

_TV_BRANCH = {
    "a": {"b1": "branch1x1", "b5_1": "branch5x5_1", "b5_2": "branch5x5_2",
          "d1": "branch3x3dbl_1", "d2": "branch3x3dbl_2",
          "d3": "branch3x3dbl_3", "p": "branch_pool"},
    "b": {"b3": "branch3x3", "d1": "branch3x3dbl_1", "d2": "branch3x3dbl_2",
          "d3": "branch3x3dbl_3"},
    "c": {"b1": "branch1x1", "s1": "branch7x7_1", "s2": "branch7x7_2",
          "s3": "branch7x7_3", "d1": "branch7x7dbl_1", "d2": "branch7x7dbl_2",
          "d3": "branch7x7dbl_3", "d4": "branch7x7dbl_4",
          "d5": "branch7x7dbl_5", "p": "branch_pool"},
    "d": {"t1": "branch3x3_1", "t2": "branch3x3_2", "s1": "branch7x7x3_1",
          "s2": "branch7x7x3_2", "s3": "branch7x7x3_3", "s4": "branch7x7x3_4"},
    "e": {"b1": "branch1x1", "s1": "branch3x3_1", "s2a": "branch3x3_2a",
          "s2b": "branch3x3_2b", "d1": "branch3x3dbl_1",
          "d2": "branch3x3dbl_2", "d3a": "branch3x3dbl_3a",
          "d3b": "branch3x3dbl_3b", "p": "branch_pool"},
}


def params_from_torch_state_dict(sd) -> Dict:
    """Convert a torchvision InceptionV3 state dict (e.g. a dataset-finetuned
    checkpoint, `torch.load(..., map_location='cpu')`) to our param tree.
    Conv OIHW → HWIO; linear [out,in] → [in,out]."""
    import numpy as np

    def unit(prefix):
        w = np.asarray(sd[f"{prefix}.conv.weight"])          # [O,I,H,W]
        return {
            "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "bn_scale": jnp.asarray(np.asarray(sd[f"{prefix}.bn.weight"])),
            "bn_bias": jnp.asarray(np.asarray(sd[f"{prefix}.bn.bias"])),
            "bn_mean": jnp.asarray(np.asarray(sd[f"{prefix}.bn.running_mean"])),
            "bn_var": jnp.asarray(np.asarray(sd[f"{prefix}.bn.running_var"])),
        }

    params: Dict = {}
    for ours, tv in _TV_UNIT.items():
        params[ours] = unit(tv)
    for name, kind, _, _ in _MIXED:
        block = {}
        for ours, tv in _TV_BRANCH[kind].items():
            block[ours] = unit(f"Mixed_{name}.{tv}")
        params[f"mixed_{name}"] = block
    params["fc"] = {
        "w": jnp.asarray(np.asarray(sd["fc.weight"]).T),
        "b": jnp.asarray(np.asarray(sd["fc.bias"])),
    }
    return params


def load_npz(path: str) -> Dict:
    """Load a converted checkpoint (`scripts/convert_inception.py` output)
    back into the param tree."""
    import numpy as np
    host = np.load(path, allow_pickle=True)["params"].item()
    return jax.tree.map(jnp.asarray, host)


def make_classifier(params: Dict):
    """jitted images→logits closure for `compute_inception_score`."""
    @jax.jit
    def classifier(images):
        return apply(params, images)
    return classifier


def export_torchvision_state_dict(params: Dict):
    """Inverse of `from_torchvision_state_dict`: our param tree → a
    torchvision-layout state dict of torch tensors.  Used by fixtures and the
    parity runbook to fabricate a realistic finetuned-checkpoint file when
    the real (non-redistributable) weights are unavailable."""
    import numpy as np
    import torch

    sd = {}

    def put(prefix, unit):
        w = np.transpose(np.asarray(unit["w"]), (3, 2, 0, 1))  # HWIO→OIHW
        sd[f"{prefix}.conv.weight"] = torch.from_numpy(w.copy())
        for ours, tv in (("bn_scale", "bn.weight"), ("bn_bias", "bn.bias"),
                         ("bn_mean", "bn.running_mean"),
                         ("bn_var", "bn.running_var")):
            sd[f"{prefix}.{tv}"] = torch.from_numpy(
                np.asarray(unit[ours]).copy())

    for ours, tv in _TV_UNIT.items():
        put(tv, params[ours])
    for name, kind, _, _ in _MIXED:
        for okey, tv in _TV_BRANCH[kind].items():
            put(f"Mixed_{name}.{tv}", params[f"mixed_{name}"][okey])
    sd["fc.weight"] = torch.from_numpy(np.asarray(params["fc"]["w"]).T.copy())
    sd["fc.bias"] = torch.from_numpy(np.asarray(params["fc"]["b"]).copy())
    return sd
