"""Hugging Face tokenizer wrapper (reference
funasr/tokenizer/hugging_face_tokenizer.py): adapts a local
``transformers`` tokenizer directory to the funasr_tpu tokenizer contract.
Also covers the Whisper tokenizer (reference whisper_tokenizer.py) — pass
a local WhisperTokenizer directory.
"""

from __future__ import annotations

from typing import List

from funasr_tpu.registry import tables


@tables.register("tokenizer_classes", "HuggingfaceTokenizer")
@tables.register("tokenizer_classes", "WhisperTokenizer")
class HuggingfaceTokenizer:
    def __init__(self, model_path: str, **kwargs):
        from transformers import AutoTokenizer

        self.tok = AutoTokenizer.from_pretrained(model_path, **kwargs)

    def get_vocab_size(self) -> int:
        return len(self.tok)

    def text2tokens(self, text: str) -> List[str]:
        return self.tok.tokenize(text)

    def tokens2text(self, tokens: List[str]) -> str:
        return self.tok.convert_tokens_to_string(tokens)

    def tokens2ids(self, tokens: List[str]) -> List[int]:
        return self.tok.convert_tokens_to_ids(tokens)

    def ids2tokens(self, ids: List[int]) -> List[str]:
        return self.tok.convert_ids_to_tokens(ids)

    def encode(self, text: str) -> List[int]:
        return self.tok.encode(text, add_special_tokens=False)

    def decode(self, ids: List[int]) -> str:
        return self.tok.decode(ids, skip_special_tokens=True)
