"""Load the PyTorch reference (/root/reference/nerf) as a CPU test oracle.

The reference's math / stepfun / coord / render / train_utils modules are pure
torch and runnable on CPU.  Its import chain, however, drags in packages that
are not in this image (gin, skimage, lpips, torch_scatter, rawpy) and a CUDA
extension (gridencoder).  None of those are needed by the functions under
test, so this module installs minimal stand-ins in ``sys.modules`` before
importing the reference.  The stand-ins either raise on use (skimage metrics,
rawpy) or implement the exact semantics the imported symbol needs at module
scope (gin decorators as no-ops, lpips.LPIPS as an inert object,
torch_scatter.segment_coo as a correct pure-torch reduction).

Usage (in a test module):

    oracle = torch_oracle.load()   # skips the test session part if torch
    oracle.stepfun.sample_intervals(...)
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference/nerf"

_cached = None


def _make_gin_stub():
    gin = types.ModuleType("gin")

    def configurable(*args, **kwargs):
        # Supports @gin.configurable, @gin.configurable(), and
        # @gin.configurable('name', module=...).
        if len(args) == 1 and callable(args[0]) and not kwargs:
            return args[0]
        return lambda fn: fn

    gin.configurable = configurable
    gin.add_config_file_search_path = lambda *a, **k: None
    gin.parse_config_files_and_bindings = lambda *a, **k: None
    gin.operative_config_str = lambda: ""
    gin.config_scope = lambda *a, **k: types.SimpleNamespace(
        __enter__=lambda s: None, __exit__=lambda s, *e: False)
    config = types.ModuleType("gin.config")
    config.external_configurable = lambda fn, *a, **k: fn
    gin.config = config
    sys.modules["gin"] = gin
    sys.modules["gin.config"] = config


def _make_skimage_stub():
    skimage = types.ModuleType("skimage")
    metrics = types.ModuleType("skimage.metrics")

    def _unavailable(*a, **k):
        raise RuntimeError("skimage is stubbed out in the parity harness")

    metrics.structural_similarity = _unavailable
    metrics.peak_signal_noise_ratio = _unavailable
    skimage.metrics = metrics
    sys.modules["skimage"] = skimage
    sys.modules["skimage.metrics"] = metrics


def _make_lpips_stub():
    lpips = types.ModuleType("lpips")

    class LPIPS:  # instantiated at internal/image.py:8 module scope
        def __init__(self, *a, **k):
            pass

        def __call__(self, *a, **k):
            raise RuntimeError("lpips is stubbed out in the parity harness")

        def to(self, *a, **k):
            return self

        def eval(self):
            return self

    lpips.LPIPS = LPIPS
    sys.modules["lpips"] = lpips


def _make_torch_scatter_stub():
    import torch

    torch_scatter = types.ModuleType("torch_scatter")

    def segment_coo(src, index, out=None, dim_size=None, reduce="sum"):
        """Pure-torch segment_coo over a sorted 1-D leading index.

        Matches the semantics the reference uses at
        nerf/internal/models.py:499 and train_utils.py:301: reduce segments
        of `src` (first dim) keyed by sorted `index`, 'sum' or 'mean'.
        """
        if dim_size is None:
            dim_size = int(index.max().item()) + 1 if index.numel() else 0
        flat_shape = (dim_size,) + tuple(src.shape[1:])
        sums = torch.zeros(flat_shape, dtype=src.dtype)
        idx = index.long()
        sums.index_add_(0, idx, src)
        if reduce == "sum":
            return sums
        if reduce == "mean":
            counts = torch.zeros(dim_size, dtype=src.dtype)
            counts.index_add_(0, idx, torch.ones_like(idx, dtype=src.dtype))
            counts = counts.clamp_min(1)
            return sums / counts.reshape((-1,) + (1,) * (src.dim() - 1))
        raise NotImplementedError(reduce)

    torch_scatter.segment_coo = segment_coo
    sys.modules["torch_scatter"] = torch_scatter


def _make_gridencoder_stub():
    gridencoder = types.ModuleType("gridencoder")

    class GridEncoder:  # constructed only inside MLP.__init__, not at import
        def __init__(self, *a, **k):
            raise RuntimeError(
                "the CUDA GridEncoder is stubbed out in the parity harness")

    gridencoder.GridEncoder = GridEncoder
    sys.modules["gridencoder"] = gridencoder


def _make_rawpy_stub():
    rawpy = types.ModuleType("rawpy")

    def imread(*a, **k):
        raise RuntimeError("rawpy is stubbed out in the parity harness")

    rawpy.imread = imread
    sys.modules["rawpy"] = rawpy


def _make_nuscenes_stub():
    nuscenes = types.ModuleType("nuscenes")
    sub = types.ModuleType("nuscenes.nuscenes")

    class NuScenes:  # referenced at internal/datasets.py:27, used lazily
        def __init__(self, *a, **k):
            raise RuntimeError(
                "nuscenes devkit is stubbed out in the parity harness")

    sub.NuScenes = NuScenes
    nuscenes.nuscenes = sub
    sys.modules["nuscenes"] = nuscenes
    sys.modules["nuscenes.nuscenes"] = sub


def _make_pyquaternion_stub():
    pyquaternion = types.ModuleType("pyquaternion")

    class Quaternion:  # referenced at internal/datasets.py:29, used lazily
        def __init__(self, *a, **k):
            raise RuntimeError(
                "pyquaternion is stubbed out in the parity harness")

    pyquaternion.Quaternion = Quaternion
    sys.modules["pyquaternion"] = pyquaternion


def _make_pycolmap_stub():
    # The vendored pycolmap (imported at internal/datasets.py:35) uses
    # np.uint64(-1) at class scope, which numpy 2.x rejects; datasets only
    # touches it inside loader methods we never call.
    pycolmap = types.ModuleType("pycolmap")

    class SceneManager:
        def __init__(self, *a, **k):
            raise RuntimeError(
                "pycolmap is stubbed out in the parity harness")

    pycolmap.SceneManager = SceneManager
    sys.modules["pycolmap"] = pycolmap


def load():
    """Import and return the reference modules behind the stub layer.

    Returns a namespace with .math, .stepfun, .coord, .render, .ref_utils,
    .train_utils (torch modules from /root/reference/nerf/internal).
    """
    global _cached
    if _cached is not None:
        return _cached

    import pytest

    torch = pytest.importorskip("torch")
    del torch

    for name, maker in [
        ("gin", _make_gin_stub),
        ("skimage", _make_skimage_stub),
        ("lpips", _make_lpips_stub),
        ("torch_scatter", _make_torch_scatter_stub),
        ("gridencoder", _make_gridencoder_stub),
        ("rawpy", _make_rawpy_stub),
        ("nuscenes", _make_nuscenes_stub),
        ("pyquaternion", _make_pyquaternion_stub),
        ("pycolmap", _make_pycolmap_stub),
    ]:
        if name not in sys.modules:
            maker()

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    from internal import coord as ref_coord
    from internal import math as ref_math
    from internal import ref_utils as ref_ref_utils
    from internal import render as ref_render
    from internal import stepfun as ref_stepfun
    from internal import train_utils as ref_train_utils

    _cached = types.SimpleNamespace(
        math=ref_math,
        stepfun=ref_stepfun,
        coord=ref_coord,
        render=ref_render,
        ref_utils=ref_ref_utils,
        train_utils=ref_train_utils,
    )
    return _cached


_models_cached = None


def load_models(grid_encoder_cls):
    """Import the reference's composed model layer (``internal.models``,
    models.py:31-365) with ``grid_encoder_cls`` standing in for the CUDA
    GridEncoder.  The class must honor the GridEncoder ctor signature
    (grid.py:97-149) and expose forward/output_dim/num_levels/grid_sizes/
    embeddings/idx/init_std.

    Returns the ``internal.models`` module.  The encoder class is installed
    once; callers share the first-installed class (tests pass the same
    deterministic mock).
    """
    global _models_cached
    load()
    if _models_cached is not None:
        return _models_cached
    sys.modules["gridencoder"].GridEncoder = grid_encoder_cls

    from internal import models as ref_models

    # internal.models is already imported during load() (train_utils.py:10
    # imports it), with `from gridencoder import GridEncoder` bound to the
    # raising stub — rebind the module-level name to the working mock.
    ref_models.GridEncoder = grid_encoder_cls

    _models_cached = ref_models
    return _models_cached
