"""Host-side data preprocessors.

Waveform: reference funasr/datasets/audio_datasets/preprocessor.py:1
``SpeechPreprocessSpeedPerturb`` — random speed perturbation by resampling
(factors like 0.9/1.0/1.1) applied on the host before batching.

Text: reference funasr/datasets/audio_datasets/preprocessor.py:39
``TextPreprocessSegDict`` (text cleaning before tokenization) and
funasr/datasets/llm_datasets/preprocessor.py:19
``TextPreprocessRemovePunctuation`` (strip zh+en punctuation from LLM
training targets).
"""

from __future__ import annotations

import re
import string
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


# zh punctuation set of the reference (llm_datasets/preprocessor.py:28)
_CN_PUNCT = "。？！，、；：“”‘’（）《》【】…—～·"
_PUNCT_RE = re.compile("[{}]".format(re.escape(string.punctuation + _CN_PUNCT)))
# text_cleaner option of the reference espnet TextCleaner: the only mode the
# recipes use is whitespace collapse + case fold for English char targets
_WS_RE = re.compile(r"\s+")


@tables.register("preprocessor_classes", "TextPreprocessRemovePunctuation")
class TextPreprocessRemovePunctuation:
    """Strip zh+en punctuation (reference llm_datasets/preprocessor.py:20)."""

    def __init__(self, **kwargs):
        pass

    def __call__(self, text: str, **kwargs) -> str:
        return _PUNCT_RE.sub("", text)


@tables.register("preprocessor_classes", "TextPreprocessSegDict")
class TextPreprocessSegDict:
    """Clean text before seg_dict tokenization (reference
    audio_datasets/preprocessor.py:40: it only applies TextCleaner; the
    seg_dict segmentation itself lives in the tokenizer, as here in
    CharTokenizer)."""

    def __init__(self, seg_dict: str = None, text_cleaner=None,
                 split_with_space: bool = False, **kwargs):
        self.split_with_space = split_with_space

    def __call__(self, text: str, **kwargs) -> str:
        return _WS_RE.sub(" ", text).strip()
