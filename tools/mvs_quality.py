"""MVS depth-quality measurement: trained cascade vs analytic ground truth.

Round-3 verdict item 5: "Train the RAFT cascade on the synthetic scene with
cli/mvs_train.py to convergence, run the full inference -> multires ->
adaptive geometric fusion pipeline with the TRAINED weights, and record
mean/median abs-rel depth error vs the analytic GT (and the fused-point
count)".  Reference pipeline: mvs/demo_custom.py:13-69, inference.py:19-70.

Stages (mirrors cli/mvs_depth.py at synthetic scale):
  1. train the tiny cascade on SyntheticMVSWindows via cli.mvs_train
     (the same entry point users run),
  2. per view: cascade inference at rescales (0.5, 1.0) ->
     postprocess_disp -> nearest-upsample -> multires_fusion,
  3. adaptive-threshold geometric fusion across views -> fused point cloud,
  4. abs-rel depth error (mean/median over valid pixels) vs the analytic
     depth at every stage, for both RANDOM-INIT and TRAINED weights.

Run (CPU is fine; ~minutes):  python tools/mvs_quality.py --steps 800
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def abs_rel(pred, gt):
    import numpy as np
    valid = (pred > 0) & (gt > 0)
    if valid.sum() == 0:
        return float("nan"), float("nan"), 0.0
    r = np.abs(pred[valid] - gt[valid]) / gt[valid]
    return float(r.mean()), float(np.median(r)), float(valid.mean())


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=800)
    parser.add_argument("--crop", type=int, nargs=2, default=(64, 96))
    parser.add_argument("--eval-crop", type=int, nargs=2, default=None,
                        help="run stages 2-3 at this crop (defaults to "
                             "--crop).  VERDICT r4 item 7: at eval crops "
                             "where the HALF-res pass is still above the "
                             "cascade's useful resolution (e.g. train 64x96 "
                             "/ eval 128x192), multires_fusion helps "
                             "instead of hurting; at 64x96 the 32x48 pass "
                             "is below it and degrades depth (QUALITY_r04)")
    parser.add_argument("--views", type=int, default=5)
    args = parser.parse_args()

    import jax

    # Force CPU: the axon sitecustomize pins jax_platforms, so the env var
    # alone is not enough (.claude/skills/verify/SKILL.md), and this tool
    # must not contend with bench runs for the tunneled chip.
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from flax.serialization import from_bytes

    from ucnerf_tpu.cli import mvs_train
    from ucnerf_tpu.models.mvs.datasets import SyntheticMVSWindows
    from ucnerf_tpu.models.mvs.pipelines import (adaptive_geometric_fusion,
                                                 fused_point_cloud,
                                                 multires_fusion,
                                                 postprocess_disp)
    from ucnerf_tpu.models.mvs.raft import RAFTMVS

    ch, cw = args.crop
    ech, ecw = args.eval_crop or args.crop
    from ucnerf_tpu import configs as cfglib
    scene_cfg = cfglib.tiny(synthetic_height=max(ch, ech),
                            synthetic_width=max(cw, ecw))
    win = SyntheticMVSWindows(config=scene_cfg, num_views=args.views)
    model = RAFTMVS(cascade=((8, 64, 2), (-1, 320, 2)), dim_fmap=16,
                    dim_net=16, dim_inp=16, num_levels=2, radius=2)

    # --- 1. train via the CLI entry point ---------------------------------
    ckpt = os.path.join(tempfile.mkdtemp(prefix="mvs_quality_"),
                        "params.msgpack")
    losses = mvs_train.main(["--tiny", "--steps", str(args.steps),
                             "--crop", str(ch), str(cw), "--out", ckpt])
    print(f"\ntraining: loss {losses[0]:.4f} -> {losses[-1]:.4f} "
          f"over {args.steps} steps")

    def crop_window(index):
        images, poses, intr, scale = win.window(index)
        return images[:, :ech, :ecw], poses, intr, scale

    example = crop_window(0)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(example[0]),
                      jnp.asarray(example[1]), jnp.asarray(example[2]))
    with open(ckpt, "rb") as f:
        trained = from_bytes(init, f.read())

    run = jax.jit(lambda p, im, po, k, s: model.apply(p, im, po, k, scale=s))

    def pipeline(params):
        """Stages 2-3 for every view; returns per-stage metrics."""
        per_view, fused_depths = [], []
        for index in range(len(win)):
            images, poses, intr, scale = crop_window(index)
            pass_depths = []
            for rescale in (0.5, 1.0):
                if rescale != 1.0:
                    h = int(ech * rescale) // 8 * 8
                    w = int(ecw * rescale) // 8 * 8
                    imgs = np.asarray(jax.image.resize(
                        jnp.asarray(images), (images.shape[0], h, w, 3),
                        "bilinear"))
                    k = intr.copy()
                    k[:, 0] *= w / ecw
                    k[:, 1] *= h / ech
                else:
                    imgs, k = images, intr
                disp = run(params, jnp.asarray(imgs), jnp.asarray(poses),
                           jnp.asarray(k), jnp.float32(scale))
                depth = np.asarray(postprocess_disp(disp))
                if depth.shape != (ech, ecw):
                    depth = np.asarray(jax.image.resize(
                        jnp.asarray(depth), (ech, ecw), "nearest"))
                pass_depths.append(depth)
            fused = multires_fusion(pass_depths[0], pass_depths[-1])
            per_view.append(pass_depths[-1])
            fused_depths.append(fused)

        gts = np.stack([win.depths[i][:ech, :ecw]
                        for i in range(len(win))])
        raw = abs_rel(np.stack(per_view), gts)
        mr = abs_rel(np.stack(fused_depths), gts)

        # Geometric fusion across views (each view vs 2 neighbors).
        n = len(win)
        pairs = [(i, [(i - 1) % n, (i + 1) % n]) for i in range(n)]
        results = adaptive_geometric_fusion(
            np.stack(fused_depths), win.poses[:n], win.intrinsics[:n],
            pairs, glb=0.25)
        masked = np.stack([
            np.where(results[i][0], results[i][1], 0.0) for i in range(n)
        ])
        geo = abs_rel(masked, gts)
        xyz, _ = fused_point_cloud(
            results, win.images[:n] / 255.0, win.poses[:n],
            win.intrinsics[:n])
        return raw, mr, geo, len(xyz)

    print("\n          stage            mean-absrel  median-absrel  "
          "valid-frac")
    for label, params in (("random-init", init), ("TRAINED", trained)):
        raw, mr, geo, npts = pipeline(params)
        for stage, m in (("per-view", raw), ("multires", mr),
                         ("geo-fused", geo)):
            print(f"{label:>12} {stage:<12} {m[0]:11.4f}  {m[1]:13.4f}  "
                  f"{m[2]:9.3f}")
        print(f"{label:>12} fused points: {npts}")


if __name__ == "__main__":
    main()
