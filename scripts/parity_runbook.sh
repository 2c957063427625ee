#!/usr/bin/env bash
# Absolute Inception-score parity runbook (SURVEY.md §6 anchors).
#
# The reference's quality claim is IS on Oxford-102/CUB with a
# dataset-finetuned Inception network.  This environment has no network
# access, so absolute parity cannot be produced here — but every offline
# step of the chain is runnable.  This script IS the documented command
# sequence; run it:
#
#   scripts/parity_runbook.sh synthetic          # fixture stand-ins for every
#                                                # external artifact (CI-able)
#   scripts/parity_runbook.sh flowers RAW EMB PTH [WORK]
#                                                # the real thing, given the
#                                                # downloaded artifacts
#
# == External artifacts (download where network exists) ==
#  1. Oxford-102 images:  https://www.robots.ox.ac.uk/~vgg/data/flowers/102/102flowers.tgz
#     (jpg/image_%05d.jpg; also setid.mat, imagelabels.mat from the same page)
#  2. char-CNN-RNN embeddings (reedscot/icml2016):
#     https://github.com/reedscot/icml2016 → flowers_icml.tar.gz
#     (.t7 per-split tensors; our loader reads them dependency-free)
#  3. A dataset-finetuned InceptionV3 checkpoint (.pth, torchvision layout),
#     e.g. finetuned with hanzhanggit/StackGAN-inception-model's protocol.
#
# == Expected anchors (StackGAN paper, arXiv:1612.03242 Tab. 2) ==
#  GAN-INT-CLS  Oxford-102: IS 2.66 ± .03     CUB: 2.88 ± .04
#  StackGAN     Oxford-102: IS 3.20 ± .01     CUB: 3.70 ± .04
set -euo pipefail
cd "$(dirname "$0")/.."

MODE="${1:-synthetic}"

if [ "$MODE" = "synthetic" ]; then
  WORK="${2:-/tmp/t2i_parity}"
  rm -rf "$WORK" && mkdir -p "$WORK/raw/jpg"
  echo "== 0. fabricate stand-ins for every external artifact"
  python - "$WORK" <<'EOF'
import sys, os
import numpy as np
from PIL import Image
from scipy.io import savemat
work = sys.argv[1]
rng = np.random.default_rng(0)
N, NCLS = 60, 6
# official Oxford-102 raw layout: jpg/image_%05d.jpg + setid/imagelabels .mat
colors = rng.uniform(0.2, 0.8, (NCLS, 3))
labels = np.array([1 + i % NCLS for i in range(N)])
for i in range(1, N + 1):
    arr = np.clip(colors[labels[i-1]-1] + rng.uniform(-.2, .2, (80, 80, 3)), 0, 1)
    Image.fromarray((arr * 255).astype(np.uint8)).save(
        os.path.join(work, "raw", "jpg", f"image_{i:05d}.jpg"))
ids = rng.permutation(np.arange(1, N + 1))
savemat(os.path.join(work, "raw", "setid.mat"),
        {"trnid": ids[:40], "valid": ids[40:50], "tstid": ids[50:]})
savemat(os.path.join(work, "raw", "imagelabels.mat"), {"labels": labels})
# char-CNN-RNN-shaped embeddings, class-structured, image-id order
cents = rng.normal(size=(NCLS, 1024)).astype(np.float32)
emb = (cents[labels - 1][:, None, :]
       + .1 * rng.normal(size=(N, 4, 1024))).astype(np.float32)
np.savez(os.path.join(work, "emb.npz"), embeddings=emb)
# a torchvision-layout finetuned-InceptionV3 .pth (random weights — only the
# VALUES differ from a real finetune; layout and every code path are real)
import jax, torch
from text_to_image_tpu.eval import inception_v3 as iv3
params = iv3.init(jax.random.PRNGKey(0), num_classes=NCLS)
torch.save({"state_dict": iv3.export_torchvision_state_dict(params)},
           os.path.join(work, "finetuned_inception.pth"))
print("stand-ins under", work)
EOF
  RAW="$WORK/raw"; EMB="$WORK/emb.npz"; PTH="$WORK/finetuned_inception.pth"
  STEPS=200; IS_IMAGES=320; BATCH=16
else
  RAW="${2:?raw dataset root (jpg/ + setid.mat + imagelabels.mat)}"
  EMB="${3:?embeddings (.t7/.npz/.pickle, image-id order)}"
  PTH="${4:?finetuned InceptionV3 .pth (torchvision layout)}"
  WORK="${5:-runs/parity_flowers}"
  mkdir -p "$WORK"
  STEPS=48000   # ≈600 epochs × 80 steps at batch 64 on the 5.1k-image split
  IS_IMAGES=30000
  BATCH=64
fi

echo "== 1. preprocess → StackGAN-format pickles (76px + 304px crop sources)"
python -m text_to_image_tpu.data.preprocess flowers \
  --raw "$RAW" --embeddings "$EMB" --out "$WORK/data"

echo "== 2. convert the finetuned Inception checkpoint (autodetected by --eval-is)"
python scripts/convert_inception.py --pth "$PTH" --out "$WORK/data/inception.npz"

echo "== 3. train GAN-INT-CLS"
cat > "$WORK/cfg.yml" <<EOF
model: gancls
data: {dataset_name: flowers, data_dir: $WORK/data, image_size: 64}
train:
  batch_size: $BATCH
  use_interpolation: true
  summary_interval: 100
  sample_interval: 2000
  snapshot_interval: 2000
dtype: bfloat16
checkpoint_dir: $WORK/run/ck
sample_dir: $WORK/run/samples
log_dir: $WORK/run/logs
EOF
python main.py --cfg "$WORK/cfg.yml" --train --steps "$STEPS"

echo "== 4. Inception score with the finetuned classifier (reference protocol)"
python main.py --cfg "$WORK/cfg.yml" --eval-is --is-images "$IS_IMAGES"

echo "== 5. compare against the anchors:"
echo "   GAN-INT-CLS Oxford-102: 2.66 ± .03   (StackGAN paper Tab. 2)"
echo "   (synthetic mode: the number is meaningless — the run only proves"
echo "    the chain; swap in the real artifacts for the parity figure)"
echo "parity runbook OK"
