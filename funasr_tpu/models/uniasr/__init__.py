import funasr_tpu.models.uniasr.model  # noqa: F401

from funasr_tpu.models.uniasr.model import UniASR  # noqa: F401
