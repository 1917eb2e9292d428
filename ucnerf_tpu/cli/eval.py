"""Evaluation CLI: render the test split, compute PSNR/SSIM (+cc variants).

TPU-native port of the reference's ``eval.py:57-311``: renders every test
image through the sharded jitted renderer, computes metrics plus the
color-corrected variants (affine fit of prediction onto ground truth,
image.py:71-111), writes per-image outputs and per-metric txt files, and can
poll for new checkpoints like the reference's follower mode (eval.py:115-120).

Usage:
  python -m ucnerf_tpu.cli.eval --preset waymo -b "Config.exp_name = '...'"
"""

from __future__ import annotations

import os
import time

import numpy as np


def main(argv=None):
    from ucnerf_tpu.cli import common

    parser = common.make_parser(__doc__)
    parser.add_argument("--limit", type=int, default=None,
                        help="evaluate at most N test images")
    parser.add_argument("--ray-histograms", action="store_true",
                        help="save per-level ray color/weight histogram "
                             "panels for the first test image "
                             "(vis.py:193-221)")
    args = parser.parse_args(argv)
    config = common.load_config_from_args(args)
    exp, logger = common.setup_experiment(config, "eval")

    import jax

    from ucnerf_tpu.data import datasets
    from ucnerf_tpu.parallel import mesh as meshlib
    from ucnerf_tpu.train import checkpoints as ckpt_lib
    from ucnerf_tpu.train import state as state_lib
    from ucnerf_tpu.train import step as step_lib
    from ucnerf_tpu.utils import image as image_lib
    from ucnerf_tpu.utils import vis as vis_lib

    mesh = meshlib.create_mesh()
    test_dataset = datasets.load_dataset("test", config)
    model, params = step_lib.init_model(config, jax.random.PRNGKey(0))
    state = state_lib.create_train_state(config, params)

    last_step = -1
    while True:
        # Cheap poll first: a full restore deserializes the whole state
        # (~350 MB at the canonical architecture) and would hammer the host
        # and device transfer path every poll tick in follower mode.
        step = ckpt_lib.latest_checkpoint_step(exp) or 0
        if step == last_step:
            if config.eval_only_once:
                break
            time.sleep(10)
            continue
        state_restored, step = ckpt_lib.restore_checkpoint(exp, state)
        last_step = step
        params_eval = state_restored.params
        logger.info("evaluating checkpoint step %d", step)

        eval_step = step_lib.make_eval_step(model, config, mesh=mesh)
        harness = image_lib.MetricHarness()

        n = test_dataset.n_examples
        if args.limit:
            n = min(n, args.limit)
        all_metrics = []
        out_dir = os.path.join(exp, "test_preds")
        os.makedirs(out_dir, exist_ok=True)
        for idx in range(n):
            img_batch = test_dataset.image_batch(idx)
            t0 = time.time()
            rendering = step_lib.render_image(
                eval_step, params_eval, img_batch, config, train_frac=1.0,
                eval_camidx=_eval_camidx(config, idx, test_dataset.cam_num),
                mesh=mesh)
            dt = time.time() - t0
            gt = img_batch["rgb"]
            pred = np.clip(rendering["rgb"], 0, 1)
            metrics = harness(pred, gt,
                              quantize=config.eval_quantize_metrics)
            # Color-corrected variants (eval.py:178-179).
            pred_cc = image_lib.color_correct(pred, gt)
            metrics.update(harness(pred_cc, gt, name_fn=lambda s: s + "_cc",
                                   quantize=config.eval_quantize_metrics))
            rays_per_sec = gt.shape[0] * gt.shape[1] / dt
            logger.info(
                "image %d/%d: psnr=%.3f ssim=%.4f psnr_cc=%.3f (%.0f rays/s)",
                idx, n, metrics["psnr"], metrics["ssim"], metrics["psnr_cc"],
                rays_per_sec)
            all_metrics.append(metrics)
            if config.eval_save_output:
                vis_lib.save_image_u8(
                    os.path.join(out_dir, f"color_{idx:03d}.png"), pred)
                panels = vis_lib.visualize_suite(rendering)
                for name in ("depth", "acc"):
                    if name in panels:
                        vis_lib.save_image_u8(
                            os.path.join(out_dir, f"{name}_{idx:03d}.png"),
                            panels[name])

            if args.ray_histograms and idx == 0:
                # Per-level ray histograms for a strip of the first image
                # (vis.py:193-221): run the model directly on the first
                # rays so the per-level step functions are available.
                import jax.numpy as jnp

                nvr = 64
                flat = {k: jnp.asarray(
                    np.asarray(v).reshape((-1,) + v.shape[2:])[:nvr])
                    for k, v in img_batch.items()}
                _, ray_history = model.apply(
                    {"params": params_eval}, None, flat, 1.0,
                    compute_extras=False, train=False,
                    eval_camidx=_eval_camidx(config, idx,
                                             test_dataset.cam_num))
                hist = vis_lib.visualize_ray_histograms(ray_history)
                for name, img in hist.items():
                    vis_lib.save_image_u8(
                        os.path.join(out_dir, f"{name}_{idx:03d}.png"), img)

        # Per-metric txt dumps (eval.py:261-289).
        if all_metrics and config.eval_save_output:
            for key in all_metrics[0]:
                vals = [m[key] for m in all_metrics]
                path = os.path.join(exp, f"{key}_{step}.txt")
                with open(path, "w") as f:
                    f.write("\n".join(str(v) for v in vals) + "\n")
                logger.info("mean %s = %.4f", key, float(np.mean(vals)))
        if config.eval_only_once:
            break


def _eval_camidx(config, test_idx, cam_num):
    """Map a test image to a training-view latent id for the brightness
    correction (reference remap (idx//3)*21+idx%3, train.py:332: test group g
    sits before 7 train frame-groups of `cam_num` cams each)."""
    cam_num = max(cam_num, 1)
    group = test_idx // cam_num
    cam = test_idx % cam_num
    return min(group * 7 * cam_num + cam, config.training_views - 1)


if __name__ == "__main__":
    main()
