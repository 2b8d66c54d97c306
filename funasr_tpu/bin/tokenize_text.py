"""funasr-tpu-tokenize-text: corpus tokenization / vocabulary building.

Reference: funasr/bin/tokenize_text.py — tokenize a text corpus (optionally
slicing kaldi-style "uttid text..." fields), either emitting the token
stream or building a frequency-sorted vocabulary with pinned special
symbols (``--add_symbol '<blank>:0' '<unk>:1' '<sos/eos>:-1'``), cutoff
filtering, and a size cap.
"""

from __future__ import annotations

import argparse
import sys
from collections import Counter
from pathlib import Path
from typing import List, Optional


def field2slice(field: Optional[str]):
    """1-based field spec -> slice: "2-" (from 2nd), "-3" (up to 3rd),
    "1-3", "2" (reference tokenize_text.py field2slice forms)."""
    if field is None:
        return None
    try:
        if field.endswith("-"):
            return slice(int(field[:-1]) - 1, None)
        if field.startswith("-"):
            return slice(None, int(field[1:]))
        if "-" in field:
            a, b = field.split("-", 1)
            return slice(int(a) - 1, int(b))
        i = int(field)
        return slice(i - 1, i)
    except ValueError:
        raise SystemExit(
            f"--field format: '2', '2-', '-3', or '1-3'; got {field!r}")


def build_simple_tokenizer(token_type: str, delimiter: Optional[str],
                           space_symbol: str, bpemodel: Optional[str]):
    if token_type == "char":
        from funasr_tpu.tokenizer.char_tokenizer import CharTokenizer

        tok = CharTokenizer(token_list=[], space_symbol=space_symbol)
        return tok.text2tokens
    if token_type == "word":
        return lambda line: [w for w in line.split(delimiter) if w]
    if token_type == "bpe":
        from funasr_tpu.tokenizer.sentencepiece_tokenizer import \
            SentencepiecesTokenizer

        tok = SentencepiecesTokenizer(bpemodel)
        return tok.text2tokens
    raise ValueError(f"unknown token_type {token_type!r}")


def tokenize(input: str, output: str, token_type: str = "char",
             field: Optional[str] = None, delimiter: Optional[str] = None,
             space_symbol: str = "<space>", bpemodel: Optional[str] = None,
             write_vocabulary: bool = False, vocabulary_size: int = 0,
             cutoff: int = 0, add_symbol: Optional[List[str]] = None):
    add_symbol = list(add_symbol or [])
    fin = sys.stdin if input == "-" else \
        Path(input).open("r", encoding="utf-8")
    if output == "-":
        fout = sys.stdout
    else:
        p = Path(output)
        p.parent.mkdir(parents=True, exist_ok=True)
        fout = p.open("w", encoding="utf-8")
    text2tokens = build_simple_tokenizer(token_type, delimiter,
                                         space_symbol, bpemodel)
    slic = field2slice(field)
    counter: Counter = Counter()
    for line in fin:
        line = line.rstrip("\n")
        if slic is not None:
            parts = line.split(delimiter)[slic]
            line = (" " if delimiter is None else delimiter).join(parts)
        tokens = text2tokens(line)
        if write_vocabulary:
            counter.update(tokens)
        else:
            fout.write(" ".join(tokens) + "\n")
    if not write_vocabulary:
        return

    def parse(sym_id):
        try:
            s, i = sym_id.rsplit(":", 1)
            return s.strip(), int(i)
        except ValueError:
            raise SystemExit(f"--add_symbol format '<blank>:0', got "
                             f"{sym_id!r}")

    pinned = [parse(s) for s in add_symbol]
    for s, _ in pinned:
        counter.pop(s, None)
    words = [w for w, c in sorted(counter.items(), key=lambda x: -x[1])
             if c > cutoff]
    if vocabulary_size > 0:
        if vocabulary_size < len(pinned):
            raise SystemExit(
                f"vocabulary_size too small: {vocabulary_size}")
        words = words[: vocabulary_size - len(pinned)]
    # insert pinned symbols at their (possibly negative) positions
    for s, i in pinned:
        if i < 0:
            i = len(words) + 1 + i
        words.insert(i, s)
    for w in words:
        fout.write(w + "\n")


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="tokenize a corpus / build a vocabulary "
                    "(reference funasr/bin/tokenize_text.py)")
    ap.add_argument("--input", "-i", required=True, help="'-' for stdin")
    ap.add_argument("--output", "-o", required=True, help="'-' for stdout")
    ap.add_argument("--token_type", "-t", default="char",
                    choices=["char", "word", "bpe"])
    ap.add_argument("--field", "-f", default=None,
                    help="1-based field slice, e.g. '2-' drops uttids")
    ap.add_argument("--delimiter", "-d", default=None)
    ap.add_argument("--space_symbol", default="<space>")
    ap.add_argument("--bpemodel", default=None)
    ap.add_argument("--write_vocabulary", action="store_true")
    ap.add_argument("--vocabulary_size", type=int, default=0)
    ap.add_argument("--cutoff", type=int, default=0)
    ap.add_argument("--add_symbol", action="append", default=[],
                    help="e.g. '<blank>:0' '<unk>:1' '<sos/eos>:-1'")
    args = ap.parse_args(argv)
    tokenize(args.input, args.output, token_type=args.token_type,
             field=args.field, delimiter=args.delimiter,
             space_symbol=args.space_symbol, bpemodel=args.bpemodel,
             write_vocabulary=args.write_vocabulary,
             vocabulary_size=args.vocabulary_size, cutoff=args.cutoff,
             add_symbol=args.add_symbol)


if __name__ == "__main__":
    main()
