"""Convert torch SuperPoint weights to the npz layout pose/features.py loads.

The reference's pose-refinement pipeline detects features with a pretrained
SuperPoint network (``/root/reference/pose_refinement/stpr/scripts/mvs/
superpoint.py``; weights ``superpoint_v1.pth`` are a missing large blob in
this image).  This tool makes the learned-feature path turnkey wherever the
torch weights DO exist: feed it the checkpoint and it emits
``superpoint.npz`` with keys

  conv{1a,1b,2a,2b,3a,3b,4a,4b,Pa,Da}/kernel  [3, 3, cin, cout]   (HWIO)
  conv{Pb,Db}/kernel                          [1, 1, cin, cout]
  conv*/bias                                  [cout]

matching the flax ``SuperPointNet`` parameter tree
(ucnerf_tpu/pose/features.py), loadable via
``features.load_superpoint_params('superpoint.npz')``.

Usage:
  python tools/convert_superpoint_weights.py --ckpt superpoint_v1.pth \
      -o superpoint.npz
"""

from __future__ import annotations

import argparse

import numpy as np

# (name, kernel hw, cin, cout) in state-dict order; cin of conv1a is the
# grayscale input channel (superpoint.py:69-82).
SUPERPOINT_LAYERS = [
    ("conv1a", 3, 1, 64), ("conv1b", 3, 64, 64),
    ("conv2a", 3, 64, 64), ("conv2b", 3, 64, 64),
    ("conv3a", 3, 64, 128), ("conv3b", 3, 128, 128),
    ("conv4a", 3, 128, 128), ("conv4b", 3, 128, 128),
    ("convPa", 3, 128, 256), ("convPb", 1, 256, 65),
    ("convDa", 3, 128, 256), ("convDb", 1, 256, 256),
]


def _load_state_dict(path):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: v for k, v in obj.items() if hasattr(v, "shape")}


def extract_arrays(state_dict):
    """Map a SuperPoint state_dict onto our npz keys, validating shapes.

    Keys may carry a module prefix (e.g. ``net.conv1a.weight``); matching is
    by layer-name suffix.
    """
    def find(layer, suffix):
        hits = [k for k in state_dict
                if k == f"{layer}.{suffix}" or k.endswith(f".{layer}.{suffix}")]
        if len(hits) != 1:
            raise ValueError(
                f"expected exactly one key for {layer}.{suffix}, got {hits}")
        t = state_dict[hits[0]]
        return np.asarray(t.detach().cpu().numpy()
                          if hasattr(t, "detach") else t)

    out = {}
    for name, hw, cin, cout in SUPERPOINT_LAYERS:
        kernel = find(name, "weight")
        if kernel.shape != (cout, cin, hw, hw):
            raise ValueError(
                f"{name}.weight has shape {kernel.shape}, expected "
                f"{(cout, cin, hw, hw)} (not a SuperPoint checkpoint?)")
        bias = find(name, "bias")
        if bias.shape != (cout,):
            raise ValueError(f"{name}.bias has shape {bias.shape}")
        # OIHW -> HWIO.
        out[f"{name}/kernel"] = kernel.transpose(2, 3, 1, 0).astype(np.float32)
        out[f"{name}/bias"] = bias.astype(np.float32)
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ckpt", required=True,
                        help="torch SuperPoint checkpoint (superpoint_v1.pth)")
    parser.add_argument("-o", "--output", default="superpoint.npz")
    args = parser.parse_args(argv)

    arrays = extract_arrays(_load_state_dict(args.ckpt))
    np.savez(args.output, **arrays)
    print(f"wrote {len(arrays)} arrays to {args.output}")


if __name__ == "__main__":
    main()
