from ucnerf_tpu.models.mvs.extractor import BasicEncoder
from ucnerf_tpu.models.mvs.raft import RAFTMVS
