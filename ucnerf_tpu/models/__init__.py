from ucnerf_tpu.models.fields import ZipMLP
from ucnerf_tpu.models.sky import SkyNeRF, render_sky
from ucnerf_tpu.models.brightness import BrightnessCorrection
from ucnerf_tpu.models.model import UCNeRFModel
