import funasr_tpu.models.mfcca.model  # noqa: F401

from funasr_tpu.models.mfcca.model import MFCCA  # noqa: F401
