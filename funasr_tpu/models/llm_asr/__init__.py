import funasr_tpu.models.llm_asr.model  # noqa: F401

from funasr_tpu.models.llm_asr.model import Adaptor, LLMASR  # noqa: F401
