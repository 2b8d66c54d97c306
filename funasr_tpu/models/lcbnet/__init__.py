import funasr_tpu.models.lcbnet.model  # noqa: F401
import funasr_tpu.models.lcbnet.reference_arch  # noqa: F401

from funasr_tpu.models.lcbnet.model import LCBNet  # noqa: F401  (registered
# as "LCBNetLite" — the compact single-file re-design kept for its tests)
from funasr_tpu.models.lcbnet.reference_arch import LCBNetModel  # noqa: F401
