"""utils/roofline.py: the gather-traffic hand model and the MFU/BW math
(the BENCH extras' scoreboard must not silently drift from the config)."""

import numpy as np

from ucnerf_tpu import configs
from ucnerf_tpu.utils import roofline


def test_gather_model_flagship_counts():
    """Flagship (single-query hex): lookups = sum over levels of
    batch x samples x 1 hex x grid_levels x 8 corners."""
    cfg = configs.waymo_tpu(batch_size=15000)
    gm = roofline.gather_model(cfg)
    # prop level: desired 512 -> 6 grid levels; nerf: 10 grid levels.
    expect = 15000 * 128 * 1 * 6 * 8 + 15000 * 32 * 1 * 10 * 8
    assert gm["lookups"] == expect
    assert gm["tile_bytes"] == expect * 8 * 128 * 4
    assert gm["ideal_bytes"] == expect * 4 * 4  # level_dim=4, f32


def test_gather_model_exact_is_six_times():
    """The 6-point hex preset looks up exactly 6x the flagship."""
    flag = roofline.gather_model(configs.waymo_tpu(batch_size=1000))
    exact = roofline.gather_model(configs.waymo(batch_size=1000))
    assert exact["lookups"] == 6 * flag["lookups"]


def test_metrics_math():
    m = roofline.metrics(dt=0.5, flops=roofline.PEAK_FLOPS * 0.05,
                        bytes_=roofline.PEAK_BW * 0.2,
                        gm=dict(lookups=10, tile_bytes=roofline.PEAK_BW * 0.1))
    assert m["mfu"] == 0.1          # 5% of peak work in half the time
    assert m["hbm_util_xla"] == 0.4
    assert m["hbm_util_gather_tile"] == 0.2
    assert m["gather_lookups_per_step"] == 10


def test_train_step_cost_positive_and_scales():
    """Cost analysis returns positive flops/bytes that grow with batch."""
    import jax
    import jax.numpy as jnp

    from ucnerf_tpu.train import state as state_lib
    from ucnerf_tpu.train import step as step_lib

    def cost(batch_size):
        cfg = configs.tiny(batch_size=batch_size)
        model, params = step_lib.init_model(cfg, jax.random.PRNGKey(0))
        state = state_lib.create_train_state(cfg, params)
        batch = jax.tree.map(jnp.asarray,
                             step_lib.dummy_batch(cfg, cfg.batch_size))
        return roofline.train_step_cost(cfg, model, params, state, batch)

    f1, b1 = cost(64)
    f2, b2 = cost(128)
    assert f1 > 0 and b1 > 0
    assert f2 > f1 and b2 > b1
