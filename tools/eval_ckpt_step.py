"""Evaluate ONE specific checkpoint step on selected test images.

The eval CLI (ucnerf_tpu/cli/eval.py) follows the reference's follower
semantics (eval.py:115-120): it always restores the NEWEST checkpoint.
For A/B comparisons at a matched training step (QUALITY_r05) we need to
score an OLDER retained checkpoint (keep-N leaves several on disk), so this
tool stages the requested step into a scratch folder where it IS the newest,
restores it, renders the requested test indices, and prints PSNR/SSIM.

Runs on whatever backend JAX picks — set JAX_PLATFORMS=cpu to score
checkpoints while a training job owns the TPU (the metric harness is
backend-independent; cross-backend render deltas are ~1e-5 in RGB).

Usage:
  JAX_PLATFORMS=cpu python tools/eval_ckpt_step.py \
      --preset synthetic_quality --step 3000 --indices 2 \
      -b "Config.batch_size = 1024" \
      -b "NerfMLP.hex_single_query = True" \
      -b "Config.exp_name = 'runs/ab_flagship'"
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from ucnerf_tpu.cli import common

    parser = common.make_parser(__doc__)
    parser.add_argument("--step", type=int, required=True)
    parser.add_argument("--indices", type=int, nargs="+", default=[0])
    args = parser.parse_args(argv)
    config = common.load_config_from_args(args)

    import jax
    import numpy as np

    from ucnerf_tpu.cli.eval import _eval_camidx
    from ucnerf_tpu.data import datasets
    from ucnerf_tpu.parallel import mesh as meshlib
    from ucnerf_tpu.train import checkpoints as ckpt_lib
    from ucnerf_tpu.train import state as state_lib
    from ucnerf_tpu.train import step as step_lib
    from ucnerf_tpu.utils import image as image_lib

    src = os.path.join(config.exp_name, "checkpoints", str(args.step))
    if not os.path.isdir(src):
        raise SystemExit(f"no checkpoint at step {args.step} under "
                         f"{config.exp_name} (keep-N may have pruned it)")

    mesh = meshlib.create_mesh()
    test_dataset = datasets.load_dataset("test", config)
    model, params = step_lib.init_model(config, jax.random.PRNGKey(0))
    state = state_lib.create_train_state(config, params)

    with tempfile.TemporaryDirectory() as scratch:
        os.makedirs(os.path.join(scratch, "checkpoints"))
        # Stage so the requested step is the newest; copytree not symlink —
        # orbax resolves paths and refuses dangling/partial trees.
        shutil.copytree(src,
                        os.path.join(scratch, "checkpoints", str(args.step)))
        state, step = ckpt_lib.restore_checkpoint(scratch, state)
    assert step == args.step, (step, args.step)

    eval_step = step_lib.make_eval_step(model, config, mesh=mesh)
    harness = image_lib.MetricHarness()
    for idx in args.indices:
        img_batch = test_dataset.image_batch(idx)
        rendering = step_lib.render_image(
            eval_step, state.params, img_batch, config, train_frac=1.0,
            eval_camidx=_eval_camidx(config, idx, test_dataset.cam_num),
            mesh=mesh)
        pred = np.clip(rendering["rgb"], 0, 1)
        metrics = harness(pred, img_batch["rgb"],
                          quantize=config.eval_quantize_metrics)
        print(f"step {step} image {idx}: psnr={metrics['psnr']:.3f} "
              f"ssim={metrics['ssim']:.4f}")


if __name__ == "__main__":
    main()
