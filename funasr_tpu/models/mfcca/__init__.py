import funasr_tpu.models.mfcca.model  # noqa: F401
import funasr_tpu.models.mfcca.reference_arch  # noqa: F401

from funasr_tpu.models.mfcca.model import MFCCA  # noqa: F401  (registered
# as "MFCCALite" — the compact single-file re-design kept for its tests)
from funasr_tpu.models.mfcca.reference_arch import MFCCAModel  # noqa: F401
