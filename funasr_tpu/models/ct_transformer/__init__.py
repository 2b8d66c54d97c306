import funasr_tpu.models.ct_transformer.model  # noqa: F401

from funasr_tpu.models.ct_transformer.model import (  # noqa: F401
    CTTransformer,
    CTTransformerModel,
)
