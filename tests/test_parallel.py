"""Multi-host input-pipeline logic (parallel/mesh.py).

process_count > 1 cannot be simulated in one process, so these tests cover
the pure per-process slicing math (reference datasets.py:278), the
single-process equivalences of shard_batch / shard_local_batch on the
8-device CPU mesh, and fetch_to_host on replicated and sharded outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ucnerf_tpu.parallel import mesh as meshlib


def test_process_slice_partitions_exactly():
    n, pc = 960, 8
    slices = [meshlib.process_slice(n, pi, pc) for pi in range(pc)]
    assert slices[0][0] == 0 and slices[-1][1] == n
    for (lo0, hi0), (lo1, hi1) in zip(slices, slices[1:]):
        assert hi0 == lo1
        assert hi1 - lo1 == hi0 - lo0 == n // pc


def test_process_slice_rejects_ragged():
    with pytest.raises(ValueError):
        meshlib.process_slice(10, 0, 3)


def test_shard_batch_roundtrip():
    mesh = meshlib.create_mesh()
    n = 8 * 5
    batch = {"origins": np.arange(n * 3, dtype=np.float32).reshape(n, 3),
             "cam_idx": np.arange(n, dtype=np.int32)}
    sharded = meshlib.shard_batch(batch, mesh)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(sharded[k]), batch[k])
        assert sharded[k].sharding.spec == jax.sharding.PartitionSpec(
            meshlib.DATA_AXIS)


def test_shard_local_batch_single_process_equals_shard_batch():
    mesh = meshlib.create_mesh()
    n = 8 * 3
    batch = {"x": np.arange(n, dtype=np.float32)}
    a = meshlib.shard_local_batch(batch, mesh)
    b = meshlib.shard_batch(batch, mesh)
    np.testing.assert_array_equal(np.asarray(a["x"]), np.asarray(b["x"]))


def test_shard_local_batch_global_shape_math():
    """With pc processes each holding m rows, the assembled global array is
    pc*m rows with process i's rows at process_slice(pc*m, i, pc)."""
    m, pc = 6, 4
    local = np.arange(m, dtype=np.float32)
    global_shape = (m * pc,)
    # Pure shape math (the actual make_array call requires pc processes).
    for pi in range(pc):
        lo, hi = meshlib.process_slice(global_shape[0], pi, pc)
        assert hi - lo == m
    del local


def test_fetch_to_host_replicated_and_sharded():
    mesh = meshlib.create_mesh()
    x = np.arange(16, dtype=np.float32)
    sharded = jax.device_put(x, meshlib.batch_sharding(mesh))
    repl = jax.device_put(x, meshlib.replicated_sharding(mesh))
    np.testing.assert_array_equal(meshlib.fetch_to_host(sharded), x)
    np.testing.assert_array_equal(meshlib.fetch_to_host(repl), x)
    np.testing.assert_array_equal(meshlib.fetch_to_host(jnp.asarray(x)), x)


def test_pad_rays_to_multiple():
    batch = {"x": np.arange(10, dtype=np.float32)[:, None]}
    padded, pad = meshlib.pad_rays_to_multiple(batch, 8)
    assert pad == 6
    assert padded["x"].shape[0] == 16
    np.testing.assert_array_equal(padded["x"][10:, 0],
                                  np.full(6, batch["x"][-1, 0]))
    same, pad0 = meshlib.pad_rays_to_multiple(batch, 5)
    assert pad0 == 0 and same["x"].shape[0] == 10


def test_scaling_bench_measure():
    """tools/scaling_bench.py's measure() runs the production sharded step
    at two mesh sizes on the virtual-device mesh and returns finite
    throughput (the weak-scaling harness for the BASELINE.md north star)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "scaling_bench",
        os.path.join(os.path.dirname(__file__), os.pardir, "tools",
                     "scaling_bench.py"))
    sb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sb)

    for n in (1, 2):
        rps = sb.measure(n, per_device_batch=32, steps=1, preset="tiny",
                         bindings=[])
        assert np.isfinite(rps) and rps > 0
