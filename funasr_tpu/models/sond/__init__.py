import funasr_tpu.models.sond.model  # noqa: F401
import funasr_tpu.models.sond.reference_arch  # noqa: F401

from funasr_tpu.models.sond.model import SOND  # noqa: F401
from funasr_tpu.models.sond.reference_arch import DiarSondModel  # noqa: F401
