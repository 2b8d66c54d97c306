import funasr_tpu.models.eend.model  # noqa: F401

from funasr_tpu.models.eend.model import EENDOLA, pit_bce_loss  # noqa: F401
