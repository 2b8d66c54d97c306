import funasr_tpu.models.scama.model  # noqa: F401

from funasr_tpu.models.scama.model import SCAMA  # noqa: F401
