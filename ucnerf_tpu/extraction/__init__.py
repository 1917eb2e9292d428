from ucnerf_tpu.extraction import tsdf
from ucnerf_tpu.extraction import meshing
