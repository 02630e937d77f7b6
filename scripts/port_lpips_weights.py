"""Port torchmetrics/Zhang VGG16-LPIPS weights to the framework's .npz.

Run this on a machine WITH internet + torchvision (this sandbox has
neither; the weight file is a drop-in artifact):

    python scripts/port_lpips_weights.py --out lpips_vgg.npz

then point NERF_EMITTER_LPIPS_WEIGHTS at the file; eval reports `lpips`
(numerically the reference's LPIPS(VGG), nerfstudio/models/nerfacto.py:292-295)
instead of the random-feature fallback `lpips_rf`.

Layout written (consumed by nerf_emitter_tpu/utils/perceptual.py):
  vgg_conv0..vgg_conv12  (3,3,Cin,Cout) HWIO float32 — VGG16 conv kernels
  vgg_bias0..vgg_bias12  (Cout,)
  lin0..lin4             (C,) non-negative per-tap 1x1 LPIPS weights
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="lpips_vgg.npz")
    args = ap.parse_args()

    try:
        import lpips  # pip install lpips
        import torch
    except ImportError as e:
        raise SystemExit(
            f"needs the `lpips` + `torch(vision)` packages and egress: {e}"
        )

    net = lpips.LPIPS(net="vgg")
    out = {}
    convs = [m for m in net.net.modules() if isinstance(m, torch.nn.Conv2d)]
    assert len(convs) == 13, len(convs)
    for i, c in enumerate(convs):
        # torch OIHW -> HWIO
        out[f"vgg_conv{i}"] = (
            c.weight.detach().permute(2, 3, 1, 0).numpy().astype(np.float32)
        )
        out[f"vgg_bias{i}"] = c.bias.detach().numpy().astype(np.float32)
    for i, lin in enumerate(net.lins):
        w = lin.model[-1].weight.detach()  # (1, C, 1, 1)
        out[f"lin{i}"] = w.reshape(-1).numpy().astype(np.float32)
    np.savez(args.out, **out)
    print(f"wrote {args.out}: " + ", ".join(sorted(out)))


if __name__ == "__main__":
    main()
