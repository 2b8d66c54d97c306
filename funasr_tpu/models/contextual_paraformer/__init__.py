import funasr_tpu.models.contextual_paraformer.model  # noqa: F401

from funasr_tpu.models.contextual_paraformer.model import (  # noqa: F401
    ContextualParaformer,
)
