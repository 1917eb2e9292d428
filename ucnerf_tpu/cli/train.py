"""Training CLI: the reference's train loop (train.py:35-395), TPU-native.

One jitted sharded train step per iteration; host does only ray sampling and
logging.  Per-``print_every`` stats (loss breakdown, rays/s), per-
``train_render_every`` test render with PSNR, per-``checkpoint_every`` orbax
checkpoints with keep-last-N and resume.

Usage:
  python -m ucnerf_tpu.cli.train --preset waymo \
      -b "Config.data_dir = '/path/to/segment'" \
      -b "Config.exp_name = 'checkpoints/run1'"
  python -m ucnerf_tpu.cli.train --tiny        # synthetic smoke run
"""

from __future__ import annotations

import os
import time

import numpy as np


def main(argv=None):
    from ucnerf_tpu.cli import common

    parser = common.make_parser(__doc__)
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--profile-steps", type=int, default=0,
                        help="capture a jax.profiler trace over N steps "
                             "(written to <exp>/profile)")
    parser.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed before training")
    args = parser.parse_args(argv)
    config = common.load_config_from_args(args)
    if args.max_steps is not None:
        import dataclasses
        config = dataclasses.replace(config, max_steps=args.max_steps)

    exp, logger = common.setup_experiment(config, "train")

    import jax
    import jax.numpy as jnp

    from ucnerf_tpu.data import datasets
    from ucnerf_tpu.parallel import mesh as meshlib
    from ucnerf_tpu.train import checkpoints as ckpt_lib
    from ucnerf_tpu.train import state as state_lib
    from ucnerf_tpu.train import step as step_lib
    from ucnerf_tpu.utils import image as image_lib

    if args.multihost:
        meshlib.initialize_multihost()
    logger.info("devices: %s (process %d/%d)", jax.devices(),
                jax.process_index(), jax.process_count())
    mesh = meshlib.create_mesh()

    dataset = datasets.load_dataset("train", config)
    test_dataset = datasets.load_dataset("test", config)
    logger.info("train views: %d, test views: %d, %dx%d",
                dataset.n_examples, test_dataset.n_examples,
                dataset.width, dataset.height)

    if (config.brightness_correction
            and dataset.n_examples > config.training_views):
        # Each training view owns a brightness latent (reference
        # configs.py:61 sizes training_views=210 for 70 frame-groups x 3
        # cams); too few latents would alias views onto clamped indices.
        raise ValueError(
            f"brightness_correction: {dataset.n_examples} training views "
            f"but Config.training_views={config.training_views}; raise "
            f"training_views to at least the train-split size.")

    if config.optimize_cameras and dataset.cam_num > config.num_phys_cams:
        # jnp.take in se3_apply clamps out-of-range phys_cam_idx, which would
        # silently alias cameras >= num_phys_cams onto the last se(3) delta.
        raise ValueError(
            f"optimize_cameras: dataset has {dataset.cam_num} physical "
            f"cameras but Config.num_phys_cams={config.num_phys_cams}; set "
            f"num_phys_cams={dataset.cam_num} (e.g. cam_type=7 -> 5).")

    example = dataset.sample_batch(np.random.default_rng(0), 16)
    model, params = step_lib.init_model(config, jax.random.PRNGKey(0),
                                        example)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    logger.info("parameters: %.2fM", n_params / 1e6)

    state = state_lib.create_train_state(config, params)
    init_step = 0
    if config.resume_from_checkpoint:
        state, init_step = ckpt_lib.restore_checkpoint(exp, state)
        if init_step:
            logger.info("resumed from step %d", init_step)

    train_step = step_lib.make_train_step(model, config, mesh=mesh)
    eval_step = step_lib.make_eval_step(model, config, mesh=mesh)
    metric_harness = image_lib.MetricHarness()

    # TensorBoard scalars/images (reference train.py:119,260-283).
    writer = None
    if meshlib.is_main_process():
        try:
            from tensorboardX import SummaryWriter
            writer = SummaryWriter(exp)
        except ImportError:
            pass

    # Per-process input pipeline (reference datasets.py:278: per-process
    # batch = batch_size // world_size): each host samples only its slice
    # with a process-folded seed; shard_local_batch assembles the global
    # sharded array without any host ever holding the full batch.
    if config.batch_size % jax.process_count() != 0:
        raise ValueError(
            f"batch_size {config.batch_size} must divide evenly across "
            f"{jax.process_count()} processes")
    local_batch_size = config.batch_size // jax.process_count()
    rng = np.random.default_rng(
        1234 + init_step + 7919 * jax.process_index())
    key = jax.random.PRNGKey(5678)
    t_start = time.time()
    t_window = time.time()
    profile_stop = init_step + 5 + args.profile_steps  # skip compile steps
    for step in range(init_step + 1, config.max_steps + 1):
        if args.profile_steps and step == init_step + 5:
            # Trace steady-state steps (per-step rays/s is the BASELINE.json
            # north-star metric; the trace shows where each step's time goes).
            jax.profiler.start_trace(os.path.join(exp, "profile"))
        if args.profile_steps and step == profile_stop:
            jax.profiler.stop_trace()
            logger.info("profiler trace written to %s/profile", exp)
        batch = dataset.sample_batch(rng, local_batch_size)
        batch = meshlib.shard_local_batch(batch, mesh)
        train_frac = np.clip(
            (step - 1) / max(config.max_steps - 1, 1), 0, 1)
        state, stats = train_step(state, batch, jax.random.fold_in(key, step),
                                  jnp.float32(train_frac))

        if step % config.print_every == 0 or step == init_step + 1:
            stats = jax.tree.map(np.asarray, stats)
            dt = time.time() - t_window
            t_window = time.time()
            steps_per_sec = config.print_every / max(dt, 1e-9)
            rays_per_sec = config.batch_size * steps_per_sec
            psnr = float(image_lib.mse_to_psnr(stats["mses"][-1]))
            loss_str = " ".join(
                f"{k}={float(v):.4f}" for k, v in
                sorted(stats["losses"].items()))
            logger.info(
                "step %d/%d: loss=%.4f psnr=%.2f %.0f rays/s (%s)",
                step, config.max_steps, float(stats["loss"]), psnr,
                rays_per_sec, loss_str)
            if writer is not None:
                writer.add_scalar("train_loss", float(stats["loss"]), step)
                writer.add_scalar("train_psnr", psnr, step)
                writer.add_scalar("train_rays_per_sec", rays_per_sec, step)
                writer.add_scalar("learning_rate",
                                  float(state_lib.lr_schedule(config)(step)),
                                  step)
                for k, v in stats["losses"].items():
                    writer.add_scalar(f"train_losses/{k}", float(v), step)

        if (config.train_render_every > 0
                and step % config.train_render_every == 0):
            idx = (step // config.train_render_every) % \
                test_dataset.n_examples
            img_batch = test_dataset.image_batch(idx)
            t0 = time.time()
            # Test-index -> training-latent remap for the brightness
            # correction (reference train.py:332).
            from ucnerf_tpu.cli.eval import _eval_camidx
            rendering = step_lib.render_image(
                eval_step, state.params, img_batch, config,
                train_frac=train_frac,
                eval_camidx=_eval_camidx(config, idx, test_dataset.cam_num),
                mesh=mesh)
            metrics = metric_harness(rendering["rgb"], img_batch["rgb"])
            logger.info("test render %d: psnr=%.2f ssim=%.3f (%.1fs)",
                        idx, metrics["psnr"], metrics["ssim"],
                        time.time() - t0)
            if writer is not None:
                writer.add_scalar("test_psnr", metrics["psnr"], step)
                writer.add_scalar("test_ssim", metrics["ssim"], step)
                writer.add_image(
                    "test_render",
                    np.clip(rendering["rgb"], 0, 1).transpose(2, 0, 1), step)

        if step % config.checkpoint_every == 0:
            ckpt_lib.save_checkpoint(exp, jax.device_get(state), step,
                                     config.checkpoints_total_limit)
            logger.info("checkpoint saved at step %d", step)

    ckpt_lib.save_checkpoint(exp, jax.device_get(state), config.max_steps,
                             config.checkpoints_total_limit)
    logger.info("done in %.1fs", time.time() - t_start)


if __name__ == "__main__":
    main()
