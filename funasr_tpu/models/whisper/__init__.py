import funasr_tpu.models.whisper.model  # noqa: F401

from funasr_tpu.models.whisper.model import WhisperWrap  # noqa: F401
