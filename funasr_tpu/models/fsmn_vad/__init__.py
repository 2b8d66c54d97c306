import funasr_tpu.models.fsmn_vad.encoder  # noqa: F401
import funasr_tpu.models.fsmn_vad.model  # noqa: F401

from funasr_tpu.models.fsmn_vad.model import FsmnVADStreaming  # noqa: F401
