"""Render CLI: novel-view path renders -> image frames + videos.

TPU-native port of the reference's ``render.py:27-172``: interpolates a
camera path from the dataset trajectory, renders color/depth/acc frames
through the sharded jitted renderer (skipping frames that already exist so
re-runs resume, render.py:136-141), and assembles mp4 videos when an ffmpeg
backend is available.

Usage:
  python -m ucnerf_tpu.cli.render --preset waymo -b "Config.exp_name = '...'"
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np


def main(argv=None):
    from ucnerf_tpu.cli import common

    parser = common.make_parser(__doc__)
    parser.add_argument(
        "--path-type", default=None,
        choices=["keyframe", "spiral", "ellipse", "spline"],
        help="render trajectory generator (default: Config.render_path_type)")
    args = parser.parse_args(argv)
    config = common.load_config_from_args(args)
    if args.path_type is not None:
        config = dataclasses.replace(config, render_path_type=args.path_type)
    exp, logger = common.setup_experiment(config, "render")

    import jax

    from ucnerf_tpu.data import datasets, paths
    from ucnerf_tpu.parallel import mesh as meshlib
    from ucnerf_tpu.train import checkpoints as ckpt_lib
    from ucnerf_tpu.train import state as state_lib
    from ucnerf_tpu.train import step as step_lib
    from ucnerf_tpu.utils import vis as vis_lib

    mesh = meshlib.create_mesh()
    dataset = datasets.load_dataset("test", config)
    model, params = step_lib.init_model(config, jax.random.PRNGKey(0))
    state = state_lib.create_train_state(config, params)
    state, step = ckpt_lib.restore_checkpoint(exp, state)
    logger.info("rendering checkpoint at step %d", step)

    eval_step = step_lib.make_eval_step(model, config, mesh=mesh)
    path_poses = paths.generate_render_path(config.render_path_type, dataset,
                                            config)
    logger.info("path type %s: %d frames", config.render_path_type,
                len(path_poses))

    out_dir = os.path.join(exp, "render", f"path_renders_step_{step}")
    os.makedirs(out_dir, exist_ok=True)
    zpad = max(3, len(str(len(path_poses) - 1)))

    x, y = np.meshgrid(np.arange(dataset.width), np.arange(dataset.height))
    for idx, pose in enumerate(path_poses):
        idx_str = str(idx).zfill(zpad)
        color_file = os.path.join(out_dir, f"color_{idx_str}.png")
        if os.path.exists(color_file):
            logger.info("frame %d already exists, skipping", idx)
            continue
        img_batch = _pose_image_batch(dataset, pose, x, y, config)
        rendering = step_lib.render_image(
            eval_step, state.params, img_batch, config, train_frac=1.0,
            eval_camidx=0, mesh=mesh)
        vis_lib.save_image_u8(color_file, np.clip(rendering["rgb"], 0, 1))
        panels = vis_lib.visualize_suite(rendering)
        for name in ("depth", "acc"):
            if name in panels:
                vis_lib.save_image_u8(
                    os.path.join(out_dir, f"{name}_{idx_str}.png"),
                    panels[name])
        logger.info("rendered frame %d/%d", idx + 1, len(path_poses))

    _write_videos(out_dir, exp, len(path_poses), zpad, config, logger)


def _pose_image_batch(dataset, pose, x, y, config):
    """Ray batch for every pixel of a novel pose."""
    from ucnerf_tpu.data import cameras as camlib

    h, w = dataset.height, dataset.width
    pixtocam = dataset.pixtocams[0]
    origins, directions, viewdirs, radii, _ = camlib.pixels_to_rays(
        x, y, pixtocam[None], pose[None, :3, :])
    scal = lambda v: np.full((h, w, 1), v, np.float32)
    return {
        "origins": origins.astype(np.float32),
        "directions": directions.astype(np.float32),
        "viewdirs": viewdirs.astype(np.float32),
        "cam_dirs": np.broadcast_to(-pose[:3, 2], (h, w, 3)).astype(
            np.float32),
        "radii": radii.astype(np.float32),
        "near": scal(config.near),
        "far": scal(config.far),
        "lossmult": scal(1.0),
        "cam_idx": np.zeros((h, w), np.int32),
        "sky_segs": np.zeros((h, w), np.float32),
        "rgb": np.zeros((h, w, 3), np.float32),
    }


def _write_videos(out_dir, exp, num_frames, zpad, config, logger):
    try:
        import imageio
        for tag in ("color", "depth", "acc"):
            f0 = os.path.join(out_dir, f"{tag}_{'0'.zfill(zpad)}.png")
            if not os.path.exists(f0):
                continue
            video_file = os.path.join(exp, "render", f"{tag}.mp4")
            with imageio.get_writer(video_file,
                                    fps=config.render_video_fps) as wr:
                for idx in range(num_frames):
                    p = os.path.join(
                        out_dir, f"{tag}_{str(idx).zfill(zpad)}.png")
                    if os.path.exists(p):
                        wr.append_data(imageio.imread(p))
            logger.info("wrote %s", video_file)
    except Exception as e:  # ffmpeg backend may be absent in this image
        logger.info("video assembly skipped (%s); frames are in %s", e,
                    out_dir)


if __name__ == "__main__":
    main()
