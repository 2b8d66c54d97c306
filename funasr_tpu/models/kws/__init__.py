import funasr_tpu.models.kws.model  # noqa: F401

from funasr_tpu.models.kws.model import (  # noqa: F401
    FsmnKWS,
    ctc_keyword_score,
)
