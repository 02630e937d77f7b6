"""Masked-PSNR CLI: PSNR over a mask between two image directories.

Re-design of nerfstudio/scripts/masked_psnr.py (:29-73): pairs of
rendered/GT images (exr/npy/png), optional mask images; prints mean PSNR.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def _load(path: Path) -> np.ndarray:
    if path.suffix == ".npy":
        return np.load(path).astype(np.float32)
    if path.suffix.lower() in (".exr", ".hdr"):
        from ..utils import exr

        return exr.read_exr(path)
    from PIL import Image

    return np.asarray(Image.open(path)).astype(np.float32) / 255.0


def masked_psnr(pred: np.ndarray, gt: np.ndarray, mask: np.ndarray | None) -> float:
    from ..utils.math import linear_to_srgb

    import jax.numpy as jnp

    p = np.asarray(linear_to_srgb(jnp.asarray(pred[..., :3])))
    g = np.asarray(linear_to_srgb(jnp.asarray(gt[..., :3])))
    if mask is not None:
        m = mask[..., :1] > 0.5
        se = ((p - g) ** 2 * m).sum() / max(m.sum() * 3, 1)
    else:
        se = ((p - g) ** 2).mean()
    return float(10 * np.log10(1.0 / max(se, 1e-12)))


def main(argv=None):
    ap = argparse.ArgumentParser(prog="masked_psnr")
    ap.add_argument("pred_dir", type=Path)
    ap.add_argument("gt_dir", type=Path)
    ap.add_argument("--mask-dir", type=Path, default=None)
    ap.add_argument("--pattern", default="*.exr")
    args = ap.parse_args(argv)

    preds = sorted(args.pred_dir.glob(args.pattern))
    gts = sorted(args.gt_dir.glob(args.pattern))
    assert len(preds) == len(gts) and preds, (len(preds), len(gts))
    masks = (
        sorted(args.mask_dir.glob(args.pattern)) if args.mask_dir else [None] * len(preds)
    )
    vals = []
    for p, g, m in zip(preds, gts, masks):
        pm = _load(p)
        gm = _load(g)
        mm = _load(m) if m is not None else (pm[..., 3:4] if pm.shape[-1] == 4 else None)
        vals.append(masked_psnr(pm, gm, mm))
    print(json.dumps({"psnr": float(np.mean(vals)), "per_image": vals}))


if __name__ == "__main__":
    main()
