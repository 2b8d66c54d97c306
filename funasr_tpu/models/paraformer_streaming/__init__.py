import funasr_tpu.models.paraformer_streaming.model  # noqa: F401

from funasr_tpu.models.paraformer_streaming.model import ParaformerStreaming  # noqa: F401
