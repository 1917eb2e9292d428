from ucnerf_tpu.train import losses
from ucnerf_tpu.train import state
from ucnerf_tpu.train import step
