from ucnerf_tpu.utils import image
