import funasr_tpu.tokenizer.char_tokenizer  # noqa: F401
import funasr_tpu.tokenizer.sentencepiece_tokenizer  # noqa: F401

from funasr_tpu.tokenizer.char_tokenizer import CharTokenizer  # noqa: F401
