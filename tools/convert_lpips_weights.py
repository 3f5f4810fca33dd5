"""Convert torchvision VGG16 (+ optional LPIPS linear heads) into the local
``.npz`` layout consumed by cropnerf_tpu.ops.lpips.

Run on any machine with internet-enabled torch/torchvision once, then copy
``lpips_weights.npz`` next to your run directory:

    python tools/convert_lpips_weights.py --out lpips_weights.npz

In zero-egress environments this only works if the torchvision weight cache
(~/.cache/torch/hub/checkpoints) is pre-populated.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

# VGG16 feature-stage boundaries used by LPIPS (conv indices in
# torchvision's features Sequential): relu1_2, relu2_2, relu3_3, relu4_3,
# relu5_3.
_STAGE_CONVS = [(0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28)]


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=Path, default=Path("lpips_weights.npz"))
    parser.add_argument("--lpips-lin", type=Path, default=None,
                        help="optional LPIPS 'lin' checkpoint (vgg.pth) for "
                             "calibrated per-channel weights; ones otherwise")
    args = parser.parse_args()

    import torch
    import torchvision

    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features.eval()

    out = {}
    stage = 0
    conv_idx = 0
    for i, layer in enumerate(vgg):
        if not isinstance(layer, torch.nn.Conv2d):
            continue
        # [out,in,kh,kw] → [kh,kw,in,out] (HWIO)
        out[f"conv{conv_idx}_w"] = (
            layer.weight.detach().numpy().transpose(2, 3, 1, 0))
        out[f"conv{conv_idx}_b"] = layer.bias.detach().numpy()
        if i == _STAGE_CONVS[stage][-1]:
            ch = layer.out_channels
            out[f"lin{conv_idx}"] = np.ones((ch,), np.float32) / ch
            stage += 1
            if stage == len(_STAGE_CONVS):
                conv_idx += 1
                break
        conv_idx += 1

    if args.lpips_lin is not None and args.lpips_lin.exists():
        lin = torch.load(args.lpips_lin, map_location="cpu")
        lin_keys = [k for k in lin if k.endswith(".weight")]
        stage_lin_positions = [k for k in out if k.startswith("lin")]
        for k_npz, k_pt in zip(sorted(stage_lin_positions,
                                      key=lambda s: int(s[3:])),
                               sorted(lin_keys)):
            out[k_npz] = lin[k_pt].squeeze().numpy().astype(np.float32)

    np.savez_compressed(args.out, **out)
    print(f"wrote {args.out} ({len(out)} arrays)")


if __name__ == "__main__":
    main()
