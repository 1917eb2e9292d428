"""UC-NeRF TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of kcheng1021/UC-NeRF (ICLR 2024).

Subpackages
-----------
- ``ops``:      pure-function math core (step functions, coordinate warps,
                volume rendering, multiresolution hash-grid encoding).
- ``models``:   the UC-NeRF model family (Zip-NeRF field + proposal hierarchy,
                sky NeRF, brightness correction).
- ``train``:    losses, optimizer, jitted train/eval steps, checkpointing.
- ``parallel``: device-mesh construction and sharding policies.
- ``data``:     ray casting, dataset loaders, virtual-view warping.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: the flagship train step takes minutes to
# compile; caching it makes every CLI / bench / test re-run start in seconds.
# Opt out with UCNERF_NO_COMPILE_CACHE=1.  Harmless if jax is configured
# before import — jax only reads these at first compile.
if not _os.environ.get("UCNERF_NO_COMPILE_CACHE"):
    _cache = _os.environ.get(
        "UCNERF_COMPILE_CACHE_DIR",
        _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(
            __file__))), ".jax_compile_cache"))
    try:
        import jax as _jax

        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
