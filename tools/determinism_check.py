"""Bitwise-determinism check of the train step on real hardware.

The reference's hash-grid backward accumulates with CUDA ``atomicAdd``
(gridencoder.cu:323-338): gradient summation order is nondeterministic, so
two identical steps can produce different parameters.  This framework's
sort-based Pallas scatter is deterministic by construction; the CPU tests
assert it in interpreter mode, and THIS tool asserts it on the actual TPU
kernel: run the full canonical train step twice from an identical state /
batch / key and require the resulting parameter pytrees to be BITWISE equal.

Usage:
  python tools/determinism_check.py [--preset waymo_tpu] [--batch-size 15000]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="waymo_tpu")
    p.add_argument("--batch-size", type=int, default=15000)
    p.add_argument("--binding", "-b", action="append", default=[])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ucnerf_tpu import configs
    from ucnerf_tpu.train import state as state_lib
    from ucnerf_tpu.train import step as step_lib

    cfg = configs.parse_bindings(
        getattr(configs, args.preset)(batch_size=args.batch_size,
                                      donate_train_state=False),
        args.binding)
    model, params = step_lib.init_model(cfg, jax.random.PRNGKey(0))
    train_step = step_lib.make_train_step(model, cfg)
    batch = jax.tree.map(jnp.asarray, step_lib.dummy_batch(cfg, cfg.batch_size))
    key = jax.random.PRNGKey(7)

    results = []
    for run in range(2):
        state = state_lib.create_train_state(cfg, params)
        state, stats = train_step(state, batch, key, jnp.float32(0.5))
        loss = float(stats["loss"])
        assert np.isfinite(loss), loss
        results.append((jax.tree.map(np.asarray, state.params), loss))

    (pa, la), (pb, lb) = results
    leaves_a, leaves_b = jax.tree.leaves(pa), jax.tree.leaves(pb)
    mismatched = 0
    for a, b in zip(leaves_a, leaves_b):
        a = np.ascontiguousarray(a)
        b = np.ascontiguousarray(b)
        if not np.array_equal(a.view(np.uint8), b.view(np.uint8)):
            mismatched += 1
    print(f"backend={jax.default_backend()} preset={args.preset} "
          f"batch={cfg.batch_size} loss={la:.6f}/{lb:.6f} "
          f"param_leaves={len(leaves_a)} bitwise_mismatched={mismatched}")
    if mismatched or la != lb:
        raise SystemExit("NONDETERMINISTIC")
    print("DETERMINISTIC: two identical steps produced bitwise-equal params")


if __name__ == "__main__":
    main()
