"""Convert a torch InceptionV3 checkpoint (e.g. a dataset-finetuned one, the
reference's IS-evaluation classifier) into this framework's param format.

    python scripts/convert_inception.py --pth model.pth --out inception.npz

The output .npz loads via eval/inception_v3.py and plugs into
`compute_inception_score` / `main.py --eval-is`:

    import numpy as np, jax.numpy as jnp, jax
    from text_to_image_tpu.eval import inception_v3 as iv3
    params = jax.tree.map(jnp.asarray,
                          np.load(path, allow_pickle=True)["params"].item())
    classifier = iv3.make_classifier(params)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pth", required=True, help="torch state-dict / checkpoint")
    p.add_argument("--out", required=True, help=".npz output path")
    args = p.parse_args()

    import torch

    from text_to_image_tpu.eval import inception_v3 as iv3

    sd = torch.load(args.pth, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model", "params"):  # common checkpoint nests
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
    sd = {k.removeprefix("module."): np.asarray(v)
          for k, v in sd.items() if hasattr(v, "numpy") or isinstance(v, np.ndarray)}

    import jax

    params = iv3.params_from_torch_state_dict(sd)
    host = jax.tree.map(np.asarray, params)
    np.savez(args.out, params=np.array(host, dtype=object))
    n = sum(x.size for x in jax.tree.leaves(host))
    print(f"wrote {args.out}: {n/1e6:.1f}M params, "
          f"fc out dim {host['fc']['b'].shape[0]}")


if __name__ == "__main__":
    main()
