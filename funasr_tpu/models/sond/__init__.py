import funasr_tpu.models.sond.model  # noqa: F401

from funasr_tpu.models.sond.model import SOND  # noqa: F401
