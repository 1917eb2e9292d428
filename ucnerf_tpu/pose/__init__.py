from ucnerf_tpu.pose import features
from ucnerf_tpu.pose import matching
from ucnerf_tpu.pose import rigba
