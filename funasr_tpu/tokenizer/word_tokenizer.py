"""Whitespace word tokenizer (reference funasr/tokenizer/word_tokenizer.py
``WordTokenizer``): splits on whitespace, maps through a token list with an
<unk> fallback."""

from __future__ import annotations

from typing import Dict, List, Optional, Union

from funasr_tpu.registry import tables
from funasr_tpu.tokenizer.char_tokenizer import load_token_list


@tables.register("tokenizer_classes", "WordTokenizer")
class WordTokenizer:
    def __init__(self, token_list: Union[str, List[str], None] = None,
                 unk_symbol: str = "<unk>", **kwargs):
        if isinstance(token_list, str):
            token_list = load_token_list(token_list)
        self.token_list: List[str] = list(token_list or [])
        self.t2i: Dict[str, int] = {t: i for i, t in enumerate(self.token_list)}
        self.unk_symbol = unk_symbol
        self.unk_id = self.t2i.get(unk_symbol, 0)

    def get_vocab_size(self) -> int:
        return len(self.token_list)

    def text2tokens(self, text: str) -> List[str]:
        return text.split()

    def tokens2text(self, tokens: List[str]) -> str:
        return " ".join(tokens)

    def tokens2ids(self, tokens: List[str]) -> List[int]:
        return [self.t2i.get(t, self.unk_id) for t in tokens]

    def ids2tokens(self, ids: List[int]) -> List[str]:
        return [self.token_list[i] if 0 <= i < len(self.token_list)
                else self.unk_symbol for i in ids]

    def encode(self, text: str) -> List[int]:
        return self.tokens2ids(self.text2tokens(text))

    def decode(self, ids: List[int]) -> str:
        return self.tokens2text(self.ids2tokens(ids))
