import funasr_tpu.models.paraformer.predictor  # noqa: F401
import funasr_tpu.models.paraformer.decoder  # noqa: F401
import funasr_tpu.models.paraformer.model  # noqa: F401

from funasr_tpu.models.paraformer.model import Paraformer  # noqa: F401
