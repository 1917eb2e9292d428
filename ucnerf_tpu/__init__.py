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
# Opt out with UCNERF_NO_COMPILE_CACHE=1/true/yes.  We only set a cache dir
# when the user has not already configured one (via JAX_COMPILATION_CACHE_DIR
# or a prior jax.config.update) so we never clobber an explicit choice.
def _truthy(val):
    return str(val).strip().lower() in ("1", "true", "yes", "on")


def _default_cache_dir():
    # Source checkout: keep the cache next to the repo (gitignored).  Installed
    # wheel (site-packages may be read-only/shared): use a per-user cache.
    repo_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    if _os.path.isdir(_os.path.join(repo_root, ".git")):
        return _os.path.join(repo_root, ".jax_compile_cache")
    return _os.path.join(
        _os.path.expanduser("~"), ".cache", "ucnerf_tpu", "jax_compile_cache")


if not _truthy(_os.environ.get("UCNERF_NO_COMPILE_CACHE", "")):
    try:
        import jax as _jax

        _already = (
            "JAX_COMPILATION_CACHE_DIR" in _os.environ
            or getattr(_jax.config, "jax_compilation_cache_dir", None))
        if not _already:
            _cache = _os.environ.get(
                "UCNERF_COMPILE_CACHE_DIR", _default_cache_dir())
            _jax.config.update("jax_compilation_cache_dir", _cache)
            _jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 5)
            _jax.config.update(
                "jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
