#!/usr/bin/env bash
# End-to-end demo on synthetic raw data, all through the public surfaces:
#   raw images + embeddings → preprocess (StackGAN pickles) → CLI training
#   → checkpoints/samples/metrics → CLI eval (grids + Inception score).
# Runs on whatever jax.devices() provides (TPU or CPU). ~5 min on 1x v5e.
set -euo pipefail
cd "$(dirname "$0")/.."
WORK="${1:-/tmp/t2i_e2e}"
rm -rf "$WORK" && mkdir -p "$WORK"

echo "== 1. make raw data (class-colored images + fake char-CNN-RNN embeddings)"
python - "$WORK" <<'EOF'
import sys, os
import numpy as np
from PIL import Image
work = sys.argv[1]
rng = np.random.default_rng(0)
img_dir = os.path.join(work, "raw"); os.makedirs(img_dir)
colors = rng.uniform(0.2, 0.8, (6, 3))
names, lines = [], []
for i in range(48):
    cls = i % 6
    arr = np.clip(colors[cls] + rng.uniform(-.2, .2, (80, 80, 3)), 0, 1)
    name = f"img_{i:03d}.jpg"
    Image.fromarray((arr * 255).astype(np.uint8)).save(os.path.join(img_dir, name))
    names.append(name)
    lines.append(f"{name} {cls} {'test' if i % 7 == 0 else 'train'}")
cents = rng.normal(size=(6, 1024)).astype(np.float32)
emb = np.stack([np.stack([cents[i % 6] + .1 * rng.normal(size=1024).astype(np.float32)
                          for _ in range(3)]) for i in range(48)])
# preprocess() pairs sorted(filenames) with embedding rows — keep that order
order = np.argsort(names)
np.savez(os.path.join(work, "emb.npz"), embeddings=emb[order])
open(os.path.join(work, "classes.txt"), "w").write("\n".join(lines))
print("raw data under", img_dir)
EOF

echo "== 2. preprocess → StackGAN-format pickles"
python -m text_to_image_tpu.data.preprocess generic \
  --images "$WORK/raw" --embeddings "$WORK/emb.npz" \
  --classes "$WORK/classes.txt" --out "$WORK/data"

echo "== 3. write config + train"
cat > "$WORK/cfg.yml" <<EOF
model: gancls
data: {dataset_name: demo, data_dir: $WORK/data, image_size: 64}
train: {batch_size: 16, summary_interval: 50, sample_interval: 200, snapshot_interval: 400}
dtype: bfloat16
checkpoint_dir: $WORK/run/ck
sample_dir: $WORK/run/samples
log_dir: $WORK/run/logs
EOF
python main.py --cfg "$WORK/cfg.yml" --train --steps 400

echo "== 4. eval: grids + Inception score (dataset-finetuned classifier)"
python main.py --cfg "$WORK/cfg.yml" --eval-is --is-images 320

echo "== artifacts:"
find "$WORK/run" -name '*.png' | sort
echo "e2e demo OK"
