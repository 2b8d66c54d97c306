import funasr_tpu.models.emotion2vec.model  # noqa: F401

from funasr_tpu.models.emotion2vec.model import Emotion2vec  # noqa: F401
