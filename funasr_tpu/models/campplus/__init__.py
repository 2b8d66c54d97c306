import funasr_tpu.models.campplus.model  # noqa: F401

from funasr_tpu.models.campplus.model import CAMPPlus  # noqa: F401
from funasr_tpu.models.campplus.cluster import (  # noqa: F401
    ClusterBackend,
    distribute_spk,
    sv_chunk,
)
