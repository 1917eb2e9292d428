from ucnerf_tpu.ops import mathx
from ucnerf_tpu.ops import stepfun
from ucnerf_tpu.ops import coord
from ucnerf_tpu.ops import rendering
from ucnerf_tpu.ops import hashgrid
