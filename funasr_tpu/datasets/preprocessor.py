"""Waveform preprocessors (reference
funasr/datasets/audio_datasets/preprocessor.py:1
``SpeechPreprocessSpeedPerturb``): random speed perturbation by resampling
(factors like 0.9/1.0/1.1) applied on the host before batching."""

from __future__ import annotations

from typing import Sequence

import numpy as np

from funasr_tpu.registry import tables
from funasr_tpu.utils.audio import resample_linear


@tables.register("preprocessor_classes", "SpeechPreprocessSpeedPerturb")
class SpeedPerturb:
    def __init__(self, speed_perturb: Sequence[float] = (0.9, 1.0, 1.1),
                 seed: int = 0, **kwargs):
        self.factors = list(speed_perturb)
        self.rng = np.random.default_rng(seed)

    def __call__(self, waveform: np.ndarray) -> np.ndarray:
        f = self.factors[self.rng.integers(len(self.factors))]
        if f == 1.0:
            return waveform
        # speed x f == resample to fs/f then play at fs
        return resample_linear(waveform, int(16000 * f), 16000)
