import funasr_tpu.models.e_paraformer.model  # noqa: F401

from funasr_tpu.models.e_paraformer.model import EParaformer  # noqa: F401
from funasr_tpu.models.e_paraformer.predictor import PifPredictor  # noqa: F401
