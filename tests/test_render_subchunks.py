"""In-graph render sub-chunking (Config.render_subchunks, train/step.py).

The lax.map sub-chunk scan must be output-identical to the monolithic eval
step: it exists purely to bound the forward's activation peak so the
CANONICAL 15000-ray render chunk (reference models.py:943) fits on one chip.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ucnerf_tpu import configs
from ucnerf_tpu.train import step as step_lib


def test_subchunked_eval_matches_monolithic():
    cfg1 = configs.tiny(render_chunk_size=64)
    cfg2 = configs.tiny(render_chunk_size=64, render_subchunks=4)
    model, params = step_lib.init_model(cfg1, jax.random.PRNGKey(0))
    batch = jax.tree.map(jnp.asarray, step_lib.dummy_batch(cfg1, 64))
    o1 = step_lib.make_eval_step(model, cfg1)(params, batch, 1.0, 0)
    o2 = step_lib.make_eval_step(model, cfg2)(params, batch, 1.0, 0)
    assert set(o1) == set(o2)
    for k in o1:
        a, b = np.asarray(o1[k]), np.asarray(o2[k])
        assert a.shape == b.shape, (k, a.shape, b.shape)
        np.testing.assert_allclose(a, b, atol=1e-5, err_msg=k)


def test_render_image_pads_for_subchunks():
    """render_image must pad chunks to a multiple of the sub-chunk count so
    the in-graph reshape is valid for ragged final chunks."""
    cfg = configs.tiny(render_chunk_size=48, render_subchunks=4)
    model, params = step_lib.init_model(cfg, jax.random.PRNGKey(0))
    eval_step = step_lib.make_eval_step(model, cfg)
    h, w = 5, 7  # 35 rays: not divisible by 48 or 4
    flat = step_lib.dummy_batch(cfg, h * w)
    batch = {k: np.asarray(v).reshape((h, w) + v.shape[1:])
             for k, v in flat.items()}
    out = step_lib.render_image(eval_step, params, batch, cfg)
    assert out["rgb"].shape == (h, w, 3)
    assert np.isfinite(out["rgb"]).all()
