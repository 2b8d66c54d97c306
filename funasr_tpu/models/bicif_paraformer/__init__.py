import funasr_tpu.models.bicif_paraformer.model  # noqa: F401

from funasr_tpu.models.bicif_paraformer.model import (  # noqa: F401
    BiCifParaformer,
    CifPredictorV3,
)
