from funasr_tpu.metrics.wer import compute_wer, edit_distance  # noqa: F401
