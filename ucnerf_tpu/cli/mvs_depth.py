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
    parser.add_argument("--num-frames", type=int, nargs="+", default=None,
                        help="temporal source count per pass, paired with "
                             "--rescales (reference demo runs (0.5, 6), "
                             "(1, 8), (2, 10); demo_custom.py:33-44). "
                             "Defaults to 6 for every pass.")
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--encoder-type", default="HR")
    parser.add_argument("--fuse", action="store_true",
                        help="adaptive-threshold geometric fusion across "
                             "views: masked depths + fused result.ply "
                             "(fusion.py:109-342)")
    parser.add_argument("--fuse-glb", type=float, default=0.25,
                        help="target surviving-pixel fraction for the "
                             "adaptive threshold search")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ucnerf_tpu.models.mvs.datasets import WaymoMVSWindows
    from ucnerf_tpu.models.mvs.pipelines import (
        adaptive_geometric_fusion, fused_point_cloud, multires_fusion,
        postprocess_disp)
    from ucnerf_tpu.models.mvs.raft import RAFTMVS

    nf_list = args.num_frames or [6] * len(args.rescales)
    if len(nf_list) != len(args.rescales):
        parser.error("--num-frames must pair 1:1 with --rescales")
    if len(set(zip(args.rescales, nf_list))) != len(args.rescales):
        parser.error("duplicate (rescale, num-frames) pass: each pass must "
                     "be distinct or it would fuse with itself")
    ds_by_nf = {nf: WaymoMVSWindows(args.data_dir, args.pose_json,
                                    num_cams=args.num_cams, num_frames=nf)
                for nf in sorted(set(nf_list))}
    ds = ds_by_nf[nf_list[-1]]  # final pass drives fusion bookkeeping
    os.makedirs(args.output, exist_ok=True)

    model = RAFTMVS(encoder_type=args.encoder_type)

    @jax.jit
    def run(params, images, poses, intr, scale):
        return model.apply(params, images, poses, intr, scale=scale)

    params = None
    n = len(ds) if args.limit is None else min(len(ds), args.limit)
    # Per-ref-view records for optional cross-view fusion.
    ref_imgs, ref_poses, ref_ks, ref_depths = [], [], [], []
    name_to_index, pair_names = {}, []
    for index in range(n):
        # Keyed by pass index: duplicate rescale values (e.g. two passes at
        # 1.0 with different --num-frames) must stay distinct passes.
        pass_depths = []
        for rescale, nf in zip(args.rescales, nf_list):
            images, poses, intr, names, scale = ds_by_nf[nf][index]
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
            # RAFT predicts at 1/4 ("HR") or 1/8 feature resolution
            # (raft.py:49-52); the NeRF loader consumes depth at image
            # resolution without resizing (datasets.py:1066-1073, the
            # resize is commented out upstream — their npy files were
            # pre-upsampled offline).  Emit loader-ready files directly.
            full_hw = (images.shape[1], images.shape[2])
            if depth.shape != full_hw:
                depth = np.asarray(jax.image.resize(
                    jnp.asarray(depth), full_hw, "nearest"))
            print(f"{names[0]} rescale={rescale}: per view time "
                  f"{time.time() - t0:.2f}s")
            pass_depths.append(depth)

        if len(pass_depths) >= 2:
            fused = multires_fusion(pass_depths[0], pass_depths[-1])
        else:
            fused = pass_depths[0]
        np.save(os.path.join(args.output, f"{names[0]}.npy"),
                fused.astype(np.float32))
        if args.fuse:
            name_to_index[names[0]] = index
            pair_names.append((names[0], list(names[1:])))
            ref_imgs.append(np.asarray(images[0]))
            ref_poses.append(np.asarray(poses[0]))
            ref_ks.append(np.asarray(intr[0]))
            ref_depths.append(np.asarray(fused, np.float32))
    print(f"wrote {n} depth maps to {args.output}")

    if args.fuse:
        pairs = [(name_to_index[r], [name_to_index[s] for s in srcs
                                     if s in name_to_index])
                 for r, srcs in pair_names]
        pairs = [(r, s) for r, s in pairs if s]
        results = adaptive_geometric_fusion(
            np.stack(ref_depths), np.stack(ref_poses), np.stack(ref_ks),
            pairs, glb=args.fuse_glb, log_fn=print)
        os.makedirs(os.path.join(args.output, "mask"), exist_ok=True)
        idx_to_name = {v: k for k, v in name_to_index.items()}
        for ref, (mask, fused_d, _) in sorted(results.items()):
            name = idx_to_name[ref]
            masked = np.where(mask, fused_d, 0.0).astype(np.float32)
            np.save(os.path.join(args.output, f"{name}.npy"), masked)
            np.save(os.path.join(args.output, "mask", f"{name}.npy"), mask)
        xyz, rgb = fused_point_cloud(results, np.stack(ref_imgs),
                                     np.stack(ref_poses), np.stack(ref_ks))
        from ucnerf_tpu.extraction.meshing import write_ply
        ply_path = os.path.join(args.output, "result.ply")
        write_ply(ply_path, xyz, np.zeros((0, 3), np.int32), colors=rgb)
        print(f"fused point cloud: {len(xyz)} points -> {ply_path}")


if __name__ == "__main__":
    main()
