"""Mesh extraction CLI: density isosurface -> colored PLY.

TPU-native port of the reference's ``extract.py:290-638``: sample the nerf
field's density on a dense grid in CONTRACTED space (better far-field
coverage), mesh the isosurface (surface nets replacing marching cubes), map
vertices back to world via the inverse contraction, clip to a world radius,
and bake vertex colors by querying the field's view-dependent color with the
downward axis as view direction.  The nvdiffrast UV-texture path is replaced
by vertex colors (per BASELINE.json north star).

Usage:
  python -m ucnerf_tpu.cli.extract --preset waymo -b "Config.exp_name = '...'"
"""

from __future__ import annotations

import os

import numpy as np


def main(argv=None):
    from ucnerf_tpu.cli import common

    parser = common.make_parser(__doc__)
    parser.add_argument("--resolution", type=int, default=256)
    parser.add_argument("--iso-density", type=float, default=20.0,
                        help="density isosurface level "
                             "(Config.isosurface_threshold in the ref)")
    parser.add_argument("--mesh-radius", type=float, default=1.0,
                        help="half-extent in contracted space (x2 = full)")
    parser.add_argument("--max-world-radius", type=float, default=10.0)
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)
    config = common.load_config_from_args(args)
    exp, logger = common.setup_experiment(config, "extract")

    import jax
    import jax.numpy as jnp

    from ucnerf_tpu.extraction import meshing
    from ucnerf_tpu.ops import coord
    from ucnerf_tpu.train import checkpoints as ckpt_lib
    from ucnerf_tpu.train import state as state_lib
    from ucnerf_tpu.train import step as step_lib

    model, params = step_lib.init_model(config, jax.random.PRNGKey(0))
    state = state_lib.create_train_state(config, params)
    state, step = ckpt_lib.restore_checkpoint(exp, state)
    logger.info("extracting from checkpoint step %d", step)
    params = state.params

    res = args.resolution
    r_c = args.mesh_radius * 2.0  # contracted-space half extent
    lin = (np.arange(res) + 0.5) / res * 2 * r_c - r_c

    def density_of_world(pts_world):
        """pts_world [N, 3] -> density [N] via the nerf field."""
        n = pts_world.shape[0]
        means = jnp.broadcast_to(
            jnp.asarray(pts_world.T, jnp.float32)[:, None, :, None],
            (3, 6, n, 1))
        stds = jnp.full((6, n, 1), 1e-3)

        def run(mdl, mn, sd):
            raw, _, _ = mdl.nerf_mlp.predict_density(mn, sd)
            return jax.nn.softplus(raw + mdl.nerf_mlp.config.density_bias)

        return model.apply({"params": params}, means, stds,
                           method=run)[:, 0]

    density_fn = jax.jit(density_of_world)

    logger.info("sampling %d^3 grid in contracted space", res)
    vol = np.empty((res, res, res), np.float32)
    chunk = max(1, (1 << 18) // res)
    yy, zz = np.meshgrid(lin, lin, indexing="ij")
    for x0 in range(0, res, chunk):
        xs = lin[x0:x0 + chunk]
        pts_c = np.stack([
            np.repeat(xs, res * res),
            np.tile(yy.reshape(-1), len(xs)),
            np.tile(zz.reshape(-1), len(xs)),
        ], axis=1)
        pts_w = np.asarray(coord.inv_contract(jnp.asarray(pts_c)))
        d = np.asarray(density_fn(pts_w))
        vol[x0:x0 + len(xs)] = d.reshape(len(xs), res, res)

    logger.info("density range: %.3f .. %.3f", vol.min(), vol.max())
    verts_c, faces = meshing.surface_nets(
        -(vol - args.iso_density),  # negative inside (density > iso)
        origin=(-r_c + r_c / res,) * 3, voxel_size=2 * r_c / res)
    logger.info("mesh: %d vertices, %d faces", len(verts_c), len(faces))
    if len(verts_c) == 0:
        logger.info("empty mesh; nothing to write")
        return

    verts_w = np.asarray(coord.inv_contract(jnp.asarray(verts_c)))
    keep = np.linalg.norm(verts_w, axis=-1) < args.max_world_radius
    remap = -np.ones(len(verts_w), np.int64)
    remap[keep] = np.arange(keep.sum())
    faces = faces[keep[faces].all(axis=1)]
    faces = remap[faces].astype(np.int32)
    verts_w = verts_w[keep]

    # Vertex colors: query the field color with a fixed downward viewdir.
    def color_of_world(pts_world):
        n = pts_world.shape[0]
        means = jnp.broadcast_to(
            jnp.asarray(pts_world.T, jnp.float32)[:, None, :, None],
            (3, 6, n, 1))
        stds = jnp.full((6, n, 1), 1e-3)
        viewdirs = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]), (n, 3))

        def run(mdl, mn, sd, vd):
            out = mdl.nerf_mlp(None, mn, sd, viewdirs=vd)
            return out["rgb"][:, :, 0].T  # [n, 3]

        return model.apply({"params": params}, means, stds, viewdirs,
                           method=run)

    color_fn = jax.jit(color_of_world)
    colors = np.empty((len(verts_w), 3), np.float32)
    vchunk = 1 << 16
    for i0 in range(0, len(verts_w), vchunk):
        colors[i0:i0 + vchunk] = np.asarray(
            color_fn(verts_w[i0:i0 + vchunk]))

    out_path = args.out or os.path.join(exp, f"mesh_{step}.ply")
    meshing.write_ply(out_path, verts_w, faces, colors)
    logger.info("wrote %s", out_path)


if __name__ == "__main__":
    main()
