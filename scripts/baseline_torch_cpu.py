"""Measured CPU baseline for the north-star comparison.

The reference is TF1 on a single CPU/GPU and publishes no numbers
(BASELINE.json "published": {}); TF1 is not installable here.  This script
measures the SAME workload — GAN-CLS 64×64, batch 64, one schedule tick =
1 D step (real/fake/wrong streams) + 2 G steps — implemented in torch on CPU
(torch's CPU kernels are at least as fast as TF1-era Eigen, so the resulting
speedup factor is conservative).

Writes {"images_per_sec": N, ...} to BASELINE_MEASURED.json at the repo root;
bench.py uses it as the vs_baseline denominator when present.
"""

import json
import os
import time

import torch
import torch.nn as nn
import torch.nn.functional as F

Z, E, CE, GF, DF, RES, B = 100, 1024, 128, 128, 64, 64, 64


class G(nn.Module):
    def __init__(self):
        super().__init__()
        self.embed = nn.Linear(E, CE)
        self.stem = nn.Linear(Z + CE, 4 * 4 * GF * 8)
        self.stem_bn = nn.BatchNorm2d(GF * 8)
        ups, c = [], GF * 8
        for i in range(3):
            o = GF * (4 >> i)
            ups += [nn.ConvTranspose2d(c, o, 5, 2, 2, output_padding=1),
                    nn.BatchNorm2d(o), nn.ReLU()]
            c = o
        self.ups = nn.Sequential(*ups)
        self.out = nn.ConvTranspose2d(c, 3, 5, 2, 2, output_padding=1)

    def forward(self, z, emb):
        t = F.leaky_relu(self.embed(emb), 0.2)
        h = self.stem(torch.cat([z, t], 1)).view(-1, GF * 8, 4, 4)
        h = F.relu(self.stem_bn(h))
        return torch.tanh(self.out(self.ups(h)))


class D(nn.Module):
    def __init__(self):
        super().__init__()
        layers, c = [], 3
        for i in range(4):
            o = DF * (2 ** i)
            layers.append(nn.Conv2d(c, o, 5, 2, 2))
            if i > 0:
                layers.append(nn.BatchNorm2d(o))
            layers.append(nn.LeakyReLU(0.2))
            c = o
        self.downs = nn.Sequential(*layers)
        self.embed = nn.Linear(E, CE)
        self.join = nn.Conv2d(c + CE, c, 1)
        self.join_bn = nn.BatchNorm2d(c)
        self.logit = nn.Conv2d(c, 1, 4)

    def forward(self, x, emb):
        h = self.downs(x)
        t = F.leaky_relu(self.embed(emb), 0.2)
        t = t[:, :, None, None].expand(-1, -1, 4, 4)
        h = F.leaky_relu(self.join_bn(self.join(torch.cat([h, t], 1))))
        return self.logit(h).view(-1)


def main(measure_steps: int = 5, warmup: int = 1):
    torch.manual_seed(0)
    g, d = G(), D()
    g_opt = torch.optim.Adam(g.parameters(), 2e-4, betas=(0.5, 0.9))
    d_opt = torch.optim.Adam(d.parameters(), 2e-4, betas=(0.5, 0.9))
    bce = nn.BCEWithLogitsLoss()
    ones, zeros = torch.ones(B), torch.zeros(B)

    real = torch.rand(B, 3, RES, RES) * 2 - 1
    wrong = torch.rand(B, 3, RES, RES) * 2 - 1
    emb = torch.randn(B, E)

    def tick():
        z = torch.randn(B, Z)
        fake = g(z, emb)
        d_loss = (bce(d(real, emb), ones)
                  + 0.5 * (bce(d(fake.detach(), emb), zeros)
                           + bce(d(wrong, emb), zeros)))
        d_opt.zero_grad(); d_loss.backward(); d_opt.step()
        for _ in range(2):
            z2 = torch.randn(B, Z)
            g_loss = bce(d(g(z2, emb), emb), ones)
            g_opt.zero_grad(); g_loss.backward(); g_opt.step()

    for _ in range(warmup):
        tick()
    t0 = time.perf_counter()
    for _ in range(measure_steps):
        tick()
    dt = time.perf_counter() - t0
    ips = measure_steps * B / dt

    result = {
        "images_per_sec": round(ips, 2),
        "ms_per_step": round(dt / measure_steps * 1e3, 1),
        "workload": "GAN-CLS 64x64 train tick (1 D + 2 G steps), batch 64",
        "backend": f"torch-{torch.__version__} CPU, "
                   f"{torch.get_num_threads()} threads",
        "note": "proxy for the TF1-era single-CPU reference (BASELINE.md)",
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BASELINE_MEASURED.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
