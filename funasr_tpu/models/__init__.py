"""Model zoo. Importing this package registers all model/encoder/decoder/
predictor classes into the global tables (funasr_tpu.registry)."""

import funasr_tpu.models.sanm  # noqa: F401
import funasr_tpu.models.paraformer  # noqa: F401
