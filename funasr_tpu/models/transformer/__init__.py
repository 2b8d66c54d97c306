import funasr_tpu.models.transformer.decoder  # noqa: F401
import funasr_tpu.models.transformer.model  # noqa: F401
import funasr_tpu.models.transformer.encoder  # noqa: F401

from funasr_tpu.models.transformer.model import Transformer, Conformer  # noqa: F401
