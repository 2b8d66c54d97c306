import funasr_tpu.models.monotonic_aligner.model  # noqa: F401

from funasr_tpu.models.monotonic_aligner.model import MonotonicAligner  # noqa: F401
