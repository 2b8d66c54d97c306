import funasr_tpu.models.eend.model  # noqa: F401
import funasr_tpu.models.eend.eend_ola  # noqa: F401

from funasr_tpu.models.eend.model import EENDOLA, pit_bce_loss  # noqa: F401
from funasr_tpu.models.eend.eend_ola import DiarEENDOLAModel  # noqa: F401
