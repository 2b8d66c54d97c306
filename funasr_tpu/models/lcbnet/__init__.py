import funasr_tpu.models.lcbnet.model  # noqa: F401

from funasr_tpu.models.lcbnet.model import LCBNet  # noqa: F401
