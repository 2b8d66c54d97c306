import funasr_tpu.models.qwen_audio.model  # noqa: F401

from funasr_tpu.models.qwen_audio.model import QwenAudio  # noqa: F401
