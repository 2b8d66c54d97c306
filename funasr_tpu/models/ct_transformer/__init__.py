import funasr_tpu.models.ct_transformer.model  # noqa: F401
import funasr_tpu.models.ct_transformer.streaming  # noqa: F401

from funasr_tpu.models.ct_transformer.model import (  # noqa: F401
    CTTransformer,
    CTTransformerModel,
)
from funasr_tpu.models.ct_transformer.streaming import (  # noqa: F401
    CTTransformerStreamingModel,
    vad_mask,
)
