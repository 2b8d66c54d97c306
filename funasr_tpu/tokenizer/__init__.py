import funasr_tpu.tokenizer.char_tokenizer  # noqa: F401
import funasr_tpu.tokenizer.sentencepiece_tokenizer  # noqa: F401
import funasr_tpu.tokenizer.word_tokenizer  # noqa: F401
import funasr_tpu.tokenizer.hf_tokenizer  # noqa: F401
import funasr_tpu.tokenizer.phoneme_tokenizer  # noqa: F401
import funasr_tpu.tokenizer.sensevoice_tokenizer  # noqa: F401

from funasr_tpu.tokenizer.char_tokenizer import CharTokenizer  # noqa: F401
from funasr_tpu.tokenizer.word_tokenizer import WordTokenizer  # noqa: F401
