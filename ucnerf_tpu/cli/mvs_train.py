"""MVS training CLI: RAFT-MVS with the gamma-decayed sequence loss.

TPU-native port of the reference's MVS trainer (``/root/reference/mvs/train.py:37-141``):
per-window forward through the cascade collecting per-iteration disparity
predictions, sequence loss against ground-truth inverse depth
(loss.py:5-41), Adam with gradient clipping.  The reference trains on
BlendedMVS; without that dataset this trains/smokes on the synthetic scene's
exact analytic depths (models/mvs/datasets.SyntheticMVSWindows).

Usage:
  python -m ucnerf_tpu.cli.mvs_train --steps 200 --out params.msgpack
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--lr", type=float, default=2e-4)
    parser.add_argument("--gradual-weight", type=float, default=0.5)
    parser.add_argument("--crop", type=int, nargs=2, default=(64, 96))
    parser.add_argument("--out", default=None)
    parser.add_argument("--tiny", action="store_true")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from flax.serialization import to_bytes

    from ucnerf_tpu.models.mvs.datasets import SyntheticMVSWindows
    from ucnerf_tpu.models.mvs.pipelines import sequence_loss
    from ucnerf_tpu.models.mvs.raft import RAFTMVS

    if args.tiny:
        model = RAFTMVS(cascade=((8, 64, 2), (-1, 320, 2)), dim_fmap=16,
                        dim_net=16, dim_inp=16, num_levels=2, radius=2)
    else:
        model = RAFTMVS()

    win = SyntheticMVSWindows(num_views=5)
    ch, cw = args.crop

    def get_batch(idx):
        images, poses, intr, scale = win.window(idx % len(win))
        images = images[:, :ch, :cw]
        gt_depth = win.depths[idx % len(win)][:ch, :cw]
        gt_disp = np.where(gt_depth > 0, 1.0 / np.maximum(gt_depth, 1e-6),
                           0.0)
        return (jnp.asarray(images), jnp.asarray(poses), jnp.asarray(intr),
                jnp.asarray(gt_disp))

    images, poses, intr, gt = get_batch(0)
    params = model.init(jax.random.PRNGKey(0), images, poses, intr)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(args.lr))
    opt_state = tx.init(params)

    def loss_fn(p, images, poses, intr, gt_disp):
        _, preds = model.apply(p, images, poses, intr,
                               return_predictions=True)
        loss, metrics = sequence_loss(preds, gt_disp,
                                      gradual_weight=args.gradual_weight)
        return loss, metrics

    @jax.jit
    def train_step(p, opt_state, images, poses, intr, gt_disp):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, images, poses, intr, gt_disp)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss, metrics

    t0 = time.time()
    losses = []
    for step in range(args.steps):
        images, poses, intr, gt = get_batch(step)
        params, opt_state, loss, metrics = train_step(
            params, opt_state, images, poses, intr, gt)
        losses.append(float(loss))
        if step % 10 == 0 or step == args.steps - 1:
            print(f"step {step}: loss={float(loss):.5f} "
                  f"mde={float(metrics['mean_depth_error']):.4f} "
                  f"({time.time() - t0:.1f}s)", flush=True)

    if args.out:
        with open(args.out, "wb") as f:
            f.write(to_bytes(params))
        print(f"wrote {args.out}")
    return losses


if __name__ == "__main__":
    main()
