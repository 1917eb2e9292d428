"""Convert torch LPIPS (VGG) weights to the npz layout utils/lpips.py loads.

The reference scores eval images with the `lpips` pip package
(``/root/reference/nerf/internal/image.py:8,128-130``), whose weights
(torchvision VGG-16 features + 5 learned 1x1 linear heads) cannot be
downloaded in an egress-free environment.  This tool makes LPIPS turnkey
wherever the torch weights DO exist: feed it a torch checkpoint and it emits
``lpips_vgg.npz`` with keys

  vgg/conv{stage}_{j}/kernel  [kh, kw, cin, cout]   (HWIO)
  vgg/conv{stage}_{j}/bias    [cout]
  lin{k}/kernel               [1, 1, c_k, 1]        (k = 0..4)

Accepted inputs (auto-detected):
  - a state_dict of the `lpips` package's LPIPS(net='vgg') module
    (keys like net.slice1.0.weight / lin0.model.1.weight)
  - a plain torchvision vgg16 features state_dict PLUS the lpips package's
    small `vgg.pth` head file (pass both: --vgg vgg16.pth --heads vgg.pth)

Usage:
  python tools/convert_lpips_weights.py --ckpt lpips_full.pth -o lpips_vgg.npz
  python tools/convert_lpips_weights.py --vgg vgg16.pth --heads vgg.pth \
      -o lpips_vgg.npz

Then:  MetricHarness(lpips_path='lpips_vgg.npz')  (utils/image.py).
"""

from __future__ import annotations

import argparse

import numpy as np

# VGG-16 conv structure: (stage, convs per stage).
VGG_CFG = [(1, 2), (2, 2), (3, 3), (4, 3), (5, 3)]
VGG_OUT_CHANNELS = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512,
                    512, 512]


def _load_state_dict(path):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: v for k, v in obj.items() if hasattr(v, "shape")}


def _conv_names():
    names = []
    for stage, convs in VGG_CFG:
        for j in range(1, convs + 1):
            names.append(f"vgg/conv{stage}_{j}")
    return names


def extract_arrays(state_dicts):
    """Map torch tensors from any supported naming scheme onto our keys.

    Strategy: 4-D tensors with kh = kw = 3 in order of appearance are the 13
    VGG convs (their out-channel sequence is verified against VGG-16); 4-D
    [1, c, 1, 1] tensors in order are the 5 linear heads; 1-D tensors paired
    with each conv (same key stem, 'bias') are the conv biases.
    """
    convs, biases, heads = [], {}, []
    for sd in state_dicts:
        for key, t in sd.items():
            arr = np.asarray(t.detach().cpu().numpy()
                             if hasattr(t, "detach") else t)
            if arr.ndim == 4 and arr.shape[-2:] == (3, 3):
                convs.append((key, arr))
            elif (arr.ndim == 4 and arr.shape[0] == 1
                    and arr.shape[-2:] == (1, 1)):
                heads.append((key, arr))
            elif arr.ndim == 1:
                biases[key] = arr

    if len(convs) != 13:
        raise ValueError(
            f"expected 13 3x3 conv tensors (VGG-16), found {len(convs)}")
    out_ch = [c.shape[0] for _, c in convs]
    if out_ch != VGG_OUT_CHANNELS:
        raise ValueError(
            f"conv out-channel sequence {out_ch} is not VGG-16's "
            f"{VGG_OUT_CHANNELS}")
    if len(heads) != 5:
        raise ValueError(f"expected 5 linear heads, found {len(heads)}")

    out = {}
    for name, (key, kernel) in zip(_conv_names(), convs):
        # OIHW -> HWIO.
        out[f"{name}/kernel"] = kernel.transpose(2, 3, 1, 0).astype(
            np.float32)
        bias_key = key.replace("weight", "bias")
        if bias_key not in biases:
            raise ValueError(f"no bias found for conv {key}")
        out[f"{name}/bias"] = biases[bias_key].astype(np.float32)
    for k, (_, head) in enumerate(heads):
        # [1, c, 1, 1] -> [1, 1, c, 1].
        out[f"lin{k}/kernel"] = head.transpose(2, 3, 1, 0).astype(np.float32)
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ckpt", default=None,
                        help="full lpips-package LPIPS state_dict")
    parser.add_argument("--vgg", default=None,
                        help="torchvision vgg16 (features) state_dict")
    parser.add_argument("--heads", default=None,
                        help="lpips package per-layer head file (vgg.pth)")
    parser.add_argument("-o", "--output", default="lpips_vgg.npz")
    args = parser.parse_args(argv)

    if args.ckpt:
        sds = [_load_state_dict(args.ckpt)]
    elif args.vgg and args.heads:
        sds = [_load_state_dict(args.vgg), _load_state_dict(args.heads)]
    else:
        parser.error("pass --ckpt, or both --vgg and --heads")

    arrays = extract_arrays(sds)
    np.savez(args.output, **arrays)
    print(f"wrote {len(arrays)} arrays to {args.output}")


if __name__ == "__main__":
    main()
