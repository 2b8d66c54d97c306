import funasr_tpu.models.mossformer.model  # noqa: F401

from funasr_tpu.models.mossformer.model import (  # noqa: F401
    MossFormer,
    si_snr,
    pit_si_snr_loss,
)
