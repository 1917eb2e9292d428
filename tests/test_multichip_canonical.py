"""One sharded train step of the CANONICAL waymo() architecture on the
8-device virtual CPU mesh (round-3 verdict item 4a; mirrors
__graft_entry__.dryrun_multichip, kept as a test so regressions surface in
CI, not only in the driver's dryrun).  ~90 s: the full 2^21-table model with
sky + brightness + scan microbatching + in-graph se(3) refinement.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ucnerf_tpu import configs
from ucnerf_tpu.parallel import mesh as meshlib
from ucnerf_tpu.train import state as state_lib
from ucnerf_tpu.train import step as step_lib


def test_canonical_architecture_sharded_step():
    n = 8
    devices = jax.devices()[:n]
    assert len(devices) == n, "conftest must force an 8-device CPU platform"
    mesh = meshlib.create_mesh(devices)
    cfg = configs.waymo(batch_size=16 * n, microbatches=2,
                        host_microbatches=False, optimize_cameras=True,
                        num_phys_cams=3)
    model, params = step_lib.init_model(cfg, jax.random.PRNGKey(0))
    state = state_lib.create_train_state(cfg, params)
    train_step = step_lib.make_train_step(model, cfg, mesh=mesh)
    batch = meshlib.shard_batch(step_lib.dummy_batch(cfg, cfg.batch_size),
                                mesh)
    state, stats = train_step(state, batch, jax.random.PRNGKey(1),
                              jnp.float32(0.0))
    assert np.isfinite(float(stats["loss"]))
    assert int(state.step) == 1
