from ucnerf_tpu.data import cameras
from ucnerf_tpu.data import datasets
from ucnerf_tpu.data import warping
