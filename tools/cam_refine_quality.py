"""Cam-refine training evidence: joint field + per-camera se(3) recovery.

Round-2 verdict item 5: "prove in-graph camera refinement through the actual
field" — the pose-recovery test used an analytic renderer; this experiment
trains the REAL UCNeRF model on the synthetic scene with a deliberately
miscalibrated rig and records pose-error reduction and test PSNR, refinement
on vs off.

Setup: synthetic views alternate between two logical physical cameras
(view % 2).  Camera 1's poses are perturbed by a fixed rigid Delta before
ray generation; supervision images stay rendered from TRUE poses (exactly an
under-calibrated rig: rays don't point where the pixels say).  Camera 0
anchors the gauge.  With optimize_cameras on, the model's se(3) deltas
should converge so Exp(xi_1) . Delta ~= Exp(xi_0) (the residual relative
miscalibration goes to zero) and test PSNR should beat the frozen-pose run.

Usage:
  python tools/cam_refine_quality.py               # CPU-scale smoke
  python tools/cam_refine_quality.py --preset synthetic_quality \
      --steps 1500 --rot-deg 1.0                   # the QUALITY_r03 run
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def _rigid(rot_deg, trans):
    from scipy.spatial.transform import Rotation

    m = np.eye(4, dtype=np.float32)
    axis = np.array([0.3, 1.0, 0.2])
    axis /= np.linalg.norm(axis)
    m[:3, :3] = Rotation.from_rotvec(
        np.radians(rot_deg) * axis).as_matrix()
    m[:3, 3] = trans
    return m


def _perturb(ds, delta):
    sel = (np.arange(ds.n_examples) % 2) == 1
    ds.camtoworlds = ds.camtoworlds.copy()
    ds.camtoworlds[sel] = (delta[None] @ ds.camtoworlds[sel]).astype(
        np.float32)
    return ds


def residual_error(se3_deltas, delta):
    """Residual relative miscalibration after refinement: the rig-relative
    transform Exp(xi_0)^-1 Exp(xi_1) Delta should be identity."""
    from scipy.spatial.transform import Rotation

    from ucnerf_tpu.models import cam_refine

    import jax.numpy as jnp

    def exp(xi):
        m = np.eye(4)
        m[:3, :3] = np.asarray(cam_refine.so3_exp(jnp.asarray(xi[:3])))
        m[:3, 3] = xi[3:]
        return m

    fix0 = exp(np.asarray(se3_deltas[0]))
    fix1 = exp(np.asarray(se3_deltas[1]))
    resid = np.linalg.inv(fix0) @ fix1 @ delta
    rot = np.degrees(np.linalg.norm(
        Rotation.from_matrix(resid[:3, :3]).as_rotvec()))
    return rot, float(np.linalg.norm(resid[:3, 3]))


def run(cfg, delta, steps, optimize, seed=0, log_every=0,
        origin_grads=False):
    import jax
    import jax.numpy as jnp

    from ucnerf_tpu.data import datasets
    from ucnerf_tpu.train import state as state_lib
    from ucnerf_tpu.train import step as step_lib
    from ucnerf_tpu.utils import image as image_lib

    cfg = dataclasses.replace(cfg, optimize_cameras=optimize,
                              num_phys_cams=2, max_steps=steps,
                              contract_origin_grads=origin_grads)
    train = datasets.load_dataset("train", cfg)
    test = datasets.load_dataset("test", cfg)
    for ds in (train, test):
        ds.cam_num = 2  # alternate views across two logical rig slots
        _perturb(ds, delta)

    model, params = step_lib.init_model(cfg, jax.random.PRNGKey(seed))
    state = state_lib.create_train_state(cfg, params)
    train_step = step_lib.make_train_step(model, cfg)
    eval_step = step_lib.make_eval_step(model, cfg, compute_extras=False)

    rng = np.random.default_rng(1234 + seed)
    key = jax.random.PRNGKey(5678 + seed)
    t0 = time.time()
    for step in range(1, steps + 1):
        batch = jax.tree.map(jnp.asarray,
                             train.sample_batch(rng, cfg.batch_size))
        frac = np.clip((step - 1) / max(steps - 1, 1), 0, 1)
        state, stats = train_step(state, batch, jax.random.fold_in(key, step),
                                  jnp.float32(frac))
        if log_every and step % log_every == 0:
            print(f"  step {step}: loss={float(stats['loss']):.4f} "
                  f"({time.time() - t0:.0f}s)")

    psnrs = []
    for i in range(test.n_examples):
        img_batch = test.image_batch(i)
        rendering = step_lib.render_image(eval_step, state.params, img_batch,
                                          cfg, train_frac=1.0, eval_camidx=i)
        mse = float(np.mean(
            (rendering["rgb"] - test.images[i]) ** 2))
        psnrs.append(float(image_lib.mse_to_psnr(mse)))

    out = dict(optimize=optimize, steps=steps,
               train_loss=float(stats["loss"]),
               psnr_mean=float(np.mean(psnrs)), psnr=psnrs)
    if optimize:
        se3 = np.asarray(state.params["cam_refine"]["se3_deltas"])
        rot, tr = residual_error(se3, delta)
        out.update(residual_rot_deg=rot, residual_trans=tr,
                   se3_deltas=se3.tolist())
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default=None,
                        help="config preset; default = CPU-scale smoke")
    parser.add_argument("--steps", type=int, default=400)
    parser.add_argument("--rot-deg", type=float, default=1.0)
    parser.add_argument("--trans", type=float, default=0.02)
    parser.add_argument("--binding", "-b", action="append", default=[])
    parser.add_argument("--log-every", type=int, default=100)
    parser.add_argument("--arms", default="off,on",
                        help="comma list from {off, on, on_og} (on_og = "
                             "refinement + contract_origin_grads)")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (the axon plugin pins "
                             "jax_platforms at interpreter start, so the "
                             "env var alone is not enough)")
    args = parser.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from ucnerf_tpu import configs

    if args.preset:
        cfg = configs.parse_bindings(
            configs._PRESETS[args.preset]() if callable(
                configs._PRESETS[args.preset])
            else configs._PRESETS[args.preset], args.binding)
    else:
        cfg = configs.parse_bindings(
            configs.tiny(training_views=12, batch_size=256), args.binding)

    delta = _rigid(args.rot_deg, [args.trans, -args.trans, args.trans / 2])
    rot0 = args.rot_deg
    tr0 = float(np.linalg.norm([args.trans, -args.trans, args.trans / 2]))
    print(f"injected miscalibration: rot={rot0:.2f} deg trans={tr0:.4f}")

    all_arms = {
        "off": dict(optimize=False),
        "on": dict(optimize=True),
        # The round-4 deviation arm: origin gradients opened so TRANSLATION
        # is learnable (Config.contract_origin_grads; QUALITY_r04).
        "on_og": dict(optimize=True, origin_grads=True),
    }
    arms = [a.strip() for a in args.arms.split(",")]
    results = {}
    for name in arms:
        print(f"--- refine_{name}")
        results[name] = run(cfg, delta, args.steps,
                            log_every=args.log_every, **all_arms[name])
        print(json.dumps({k: v for k, v in results[name].items()
                          if k != "se3_deltas"}))

    summary = {"injected_rot_deg": rot0, "injected_trans": tr0}
    for name in arms:
        r = results[name]
        summary[f"psnr_{name}"] = round(r["psnr_mean"], 3)
        if r.get("residual_rot_deg") is not None:
            summary[f"residual_rot_deg_{name}"] = round(
                r["residual_rot_deg"], 4)
            summary[f"residual_trans_{name}"] = round(r["residual_trans"], 5)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
