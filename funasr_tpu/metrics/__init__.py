from funasr_tpu.metrics.wer import compute_wer, edit_distance  # noqa: F401
from funasr_tpu.metrics.spk import compute_eer, compute_min_dcf  # noqa: F401
