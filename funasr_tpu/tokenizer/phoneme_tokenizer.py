"""Phoneme tokenizer (reference funasr/tokenizer/phoneme_tokenizer.py):
maps text through a word->phoneme lexicon; OOV words fall back to
letter-by-letter or <unk>."""

from __future__ import annotations

from typing import Dict, List, Optional, Union

from funasr_tpu.registry import tables
from funasr_tpu.tokenizer.char_tokenizer import load_token_list


def load_lexicon(path: str) -> Dict[str, List[str]]:
    """Kaldi-style lexicon: `word ph1 ph2 ...` per line."""
    lex: Dict[str, List[str]] = {}
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split()
            if len(parts) >= 2 and parts[0] not in lex:
                lex[parts[0]] = parts[1:]
    return lex


@tables.register("tokenizer_classes", "PhonemeTokenizer")
class PhonemeTokenizer:
    def __init__(self, token_list: Union[str, List[str], None] = None,
                 lexicon: Union[str, Dict[str, List[str]], None] = None,
                 unk_symbol: str = "<unk>", **kwargs):
        if isinstance(token_list, str):
            token_list = load_token_list(token_list)
        self.token_list: List[str] = list(token_list or [])
        self.t2i = {t: i for i, t in enumerate(self.token_list)}
        self.lexicon = (load_lexicon(lexicon) if isinstance(lexicon, str)
                        else dict(lexicon or {}))
        self.unk_symbol = unk_symbol
        self.unk_id = self.t2i.get(unk_symbol, 0)

    def get_vocab_size(self) -> int:
        return len(self.token_list)

    def text2tokens(self, text: str) -> List[str]:
        out: List[str] = []
        for w in text.split():
            if w in self.lexicon:
                out.extend(self.lexicon[w])
            elif all(ch in self.t2i for ch in w):
                out.extend(w)  # letter fallback
            else:
                out.append(self.unk_symbol)
        return out

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
