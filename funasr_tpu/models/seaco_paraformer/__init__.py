import funasr_tpu.models.seaco_paraformer.model  # noqa: F401

from funasr_tpu.models.seaco_paraformer.model import SeacoParaformer  # noqa: F401
