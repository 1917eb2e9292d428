"""MVS depth CLI: per-view depth estimation + multires/geometric fusion.

TPU-native port of the reference's MVS orchestration
(``/root/reference/mvs/demo_custom.py:13-69``): run the RAFT-MVS cascade over
every reference view's temporal window at multiple rescales, post-process
(inference.py:52-58), fuse across resolutions (multires.py:16-40), and write
the per-view ``.npy`` depth maps the NeRF trainer consumes
(nerf/internal/datasets.py:950).

Checkpoint: a pretrained parameter file (msgpack/npz of the RAFTMVS params);
the reference ships train_BlendedMVS.pth as a missing blob, so training from
scratch (cli.mvs_train) or random-init smoke runs are supported too.

Usage:
  python -m ucnerf_tpu.cli.mvs_depth --data-dir /path/segment \
      --pose-json /path/pose.json --output /path/depths [--ckpt params.msgpack]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def load_params(path, model, example_args):
    import jax
    from flax.serialization import from_bytes

    init = model.init(jax.random.PRNGKey(0), *example_args)
    if path is None:
        return init
    with open(path, "rb") as f:
        return from_bytes(init, f.read())


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data-dir", required=True)
    parser.add_argument("--pose-json", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--num-cams", type=int, default=3)
    parser.add_argument("--rescales", type=float, nargs="+",
                        default=[0.5, 1.0])
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--encoder-type", default="HR")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ucnerf_tpu.models.mvs.datasets import WaymoMVSWindows
    from ucnerf_tpu.models.mvs.pipelines import (multires_fusion,
                                                 postprocess_disp)
    from ucnerf_tpu.models.mvs.raft import RAFTMVS

    ds = WaymoMVSWindows(args.data_dir, args.pose_json,
                         num_cams=args.num_cams)
    os.makedirs(args.output, exist_ok=True)

    model = RAFTMVS(encoder_type=args.encoder_type)

    @jax.jit
    def run(params, images, poses, intr, scale):
        return model.apply(params, images, poses, intr, scale=scale)

    params = None
    n = len(ds) if args.limit is None else min(len(ds), args.limit)
    for index in range(n):
        images, poses, intr, names, scale = ds[index]
        depths_at_scale = {}
        for rescale in args.rescales:
            if rescale != 1.0:
                import jax.image
                h = int(images.shape[1] * rescale) // 8 * 8
                w = int(images.shape[2] * rescale) // 8 * 8
                imgs = np.asarray(jax.image.resize(
                    jnp.asarray(images), (images.shape[0], h, w, 3),
                    "bilinear"))
                k = intr.copy()
                k[:, 0] *= w / images.shape[2]
                k[:, 1] *= h / images.shape[1]
            else:
                imgs, k = images, intr
            if params is None:
                params = load_params(
                    args.ckpt, model,
                    (jnp.asarray(imgs), jnp.asarray(poses), jnp.asarray(k)))
            t0 = time.time()
            disp = run(params, jnp.asarray(imgs), jnp.asarray(poses),
                       jnp.asarray(k), jnp.float32(scale))
            depth = np.asarray(postprocess_disp(disp))
            print(f"{names[0]} rescale={rescale}: per view time "
                  f"{time.time() - t0:.2f}s")
            depths_at_scale[rescale] = depth

        if len(args.rescales) >= 2:
            d_half = depths_at_scale[args.rescales[0]]
            d_full = depths_at_scale[args.rescales[-1]]
            fused = multires_fusion(d_half, d_full)
        else:
            fused = depths_at_scale[args.rescales[0]]
        np.save(os.path.join(args.output, f"{names[0]}.npy"),
                fused.astype(np.float32))
    print(f"wrote {n} depth maps to {args.output}")


if __name__ == "__main__":
    main()
