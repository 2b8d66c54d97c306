import funasr_tpu.frontends.default  # noqa: F401
import funasr_tpu.frontends.mel23  # noqa: F401
import funasr_tpu.frontends.whisper_frontend  # noqa: F401

from funasr_tpu.frontends.streaming import StreamingFrontend  # noqa: F401
