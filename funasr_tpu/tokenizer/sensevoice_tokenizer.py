"""SenseVoice tokenizer builder (reference
funasr/tokenizer/whisper_tokenizer.py:25 ``SenseVoiceTokenizer``).

The reference builds a whisper-style tiktoken BPE from ``vocab_path`` (the
multilingual rich-tag vocabulary); the shipped SenseVoiceSmall hub model
instead uses a SentencePiece bpe model.  This builder accepts either: a
``.model``/``.bpe.model`` path goes to SentencepiecesTokenizer, anything
else is loaded as a tiktoken ranks file with whisper-style special tokens
appended (<|startoftranscript|>, language tags, task/emotion/event tags,
<|endoftext|>).
"""

from __future__ import annotations

import base64
from typing import Iterable, List

from funasr_tpu.registry import tables

# rich-tag specials of SenseVoice (reference sense_voice/model.py:856-879
# prompt tokens + rich_transcription_postprocess tag set)
SPECIAL_TOKENS = (
    ["<|endoftext|>", "<|startoftranscript|>"]
    + [f"<|{lang}|>" for lang in
       ("zh", "en", "yue", "ja", "ko", "nospeech", "auto")]
    + ["<|ASR|>", "<|AED|>", "<|SER|>", "<|transcribe|>", "<|translate|>",
       "<|HAPPY|>", "<|SAD|>", "<|ANGRY|>", "<|NEUTRAL|>", "<|FEARFUL|>",
       "<|DISGUSTED|>", "<|SURPRISED|>", "<|EMO_UNKNOWN|>",
       "<|Speech|>", "<|BGM|>", "<|Applause|>", "<|Laughter|>", "<|Cry|>",
       "<|Sneeze|>", "<|Breath|>", "<|Cough|>", "<|Event_UNK|>",
       "<|withitn|>", "<|woitn|>", "<|nospeech|>"]
)


class TiktokenTokenizer:
    """Whisper-style BPE over a tiktoken ranks file."""

    def __init__(self, vocab_path: str, **kwargs):
        import tiktoken

        ranks = {}
        with open(vocab_path, "rb") as f:
            for line in f:
                if not line.strip():
                    continue
                tok, rank = line.split()
                ranks[base64.b64decode(tok)] = int(rank)
        n = len(ranks)
        specials = {t: n + i for i, t in enumerate(SPECIAL_TOKENS)}
        self._enc = tiktoken.Encoding(
            name="sensevoice",
            explicit_n_vocab=n + len(specials),
            pat_str=(r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+"""
                     r"""| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""),
            mergeable_ranks=ranks,
            special_tokens=specials,
        )

    def get_vocab_size(self) -> int:
        return self._enc.n_vocab

    def encode(self, text: str, allowed_special="all") -> List[int]:
        return self._enc.encode(text, allowed_special=allowed_special)

    def decode(self, ids: Iterable[int]) -> str:
        return self._enc.decode(list(map(int, ids)))

    def ids2tokens(self, ids: Iterable[int]) -> List[str]:
        return [self._enc.decode([int(i)]) for i in ids]


@tables.register("tokenizer_classes", "SenseVoiceTokenizer")
def SenseVoiceTokenizer(vocab_path: str = None, bpemodel: str = None,
                        **kwargs):
    path = vocab_path or bpemodel
    if path is None:
        raise ValueError("SenseVoiceTokenizer needs vocab_path or bpemodel")
    if path.endswith(".model"):
        from funasr_tpu.tokenizer.sentencepiece_tokenizer import (
            SentencepiecesTokenizer,
        )

        return SentencepiecesTokenizer(bpemodel=path, **kwargs)
    return TiktokenTokenizer(path, **kwargs)
