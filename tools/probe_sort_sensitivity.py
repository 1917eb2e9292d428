"""Flagship train-step sensitivity to the backward scatter's sort structure:
flat sort (sort_segments=1) vs the default per-level segmented sorts."""
import sys, time, functools
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
import ucnerf_tpu.ops.scatter as scatter
from ucnerf_tpu import configs
from ucnerf_tpu.train import state as state_lib, step as step_lib

orig = scatter.scatter_add_cm

def measure(tag, force_flat):
    if force_flat:
        def patched(values, idx, num_rows, **kw):
            kw["sort_segments"] = 1
            return orig(values, idx, num_rows, **kw)
        scatter.scatter_add_cm = patched
    else:
        scatter.scatter_add_cm = orig
    cfg = configs.waymo_tpu(batch_size=15000)
    model, params = step_lib.init_model(cfg, jax.random.PRNGKey(0))
    state = state_lib.create_train_state(cfg, params)
    ts = step_lib.make_train_step(model, cfg)
    batch = jax.tree.map(jnp.asarray, step_lib.dummy_batch(cfg, cfg.batch_size))
    key = jax.random.PRNGKey(1)
    for i in range(3):
        state, stats = ts(state, batch, jax.random.fold_in(key, i), jnp.float32(0.5))
    float(stats["loss"])
    t0 = time.perf_counter()
    for i in range(12):
        state, stats = ts(state, batch, jax.random.fold_in(key, 100+i), jnp.float32(0.5))
    loss = float(stats["loss"])
    dt = (time.perf_counter() - t0) / 12
    print(f"{tag}: {15000/dt:.1f} rays/s (loss {loss:.4f})", flush=True)

measure("segmented (default)", False)
measure("flat sort", True)
