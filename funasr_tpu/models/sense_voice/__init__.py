import funasr_tpu.models.sense_voice.model  # noqa: F401

from funasr_tpu.models.sense_voice.model import SenseVoiceSmall  # noqa: F401
