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
