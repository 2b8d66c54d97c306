import funasr_tpu.models.sa_asr.model  # noqa: F401
import funasr_tpu.models.sa_asr.joint_model  # noqa: F401

from funasr_tpu.models.sa_asr.model import SAASR  # noqa: F401
from funasr_tpu.models.sa_asr.joint_model import SAASRModel  # noqa: F401
