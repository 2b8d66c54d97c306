import funasr_tpu.models.transducer.model  # noqa: F401

from funasr_tpu.models.transducer.model import Transducer  # noqa: F401
