"""CLI: ``funasr-tpu`` — batch inference (reference funasr/bin/inference.py:9).

Usage:
    funasr-tpu --model <dir|yaml> [--vad-model ...] [--punc-model ...]
               --input a.wav b.wav [--output-dir out/] [++key=value ...]

``++key=value`` overrides deep-merge into the main model config the way
hydra overrides do in the reference.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Any, Dict


def parse_overrides(tokens) -> Dict[str, Any]:
    import yaml

    out: Dict[str, Any] = {}
    for t in tokens:
        if not t.startswith("++") or "=" not in t:
            raise SystemExit(f"bad override {t!r}; expected ++key.path=value")
        k, v = t[2:].split("=", 1)
        node = out
        parts = k.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = yaml.safe_load(v)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(prog="funasr-tpu")
    ap.add_argument("--model", required=True)
    ap.add_argument("--vad-model", default=None)
    ap.add_argument("--punc-model", default=None)
    ap.add_argument("--input", nargs="+", required=True)
    ap.add_argument("--output-dir", default=None)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--batch-size-s", type=int, default=300)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)

    from funasr_tpu.auto.auto_model import AutoModel

    # args.model may be a dir/yaml OR a hub id/alias ("paraformer-zh"):
    # AutoModel._resolve_cfg handles all of them; ++overrides deep-merge
    am = AutoModel(
        model=args.model,
        model_conf=parse_overrides(args.overrides),
        vad_model=args.vad_model,
        punc_model=args.punc_model,
    )
    gen_kwargs = {}
    if am.vad_engine is not None:
        gen_kwargs["batch_size_s"] = args.batch_size_s
    results = am.generate(args.input, batch_size=args.batch_size, **gen_kwargs)

    if args.output_dir:
        os.makedirs(args.output_dir, exist_ok=True)
        with open(os.path.join(args.output_dir, "text"), "w", encoding="utf-8") as ft:
            for r in results:
                ft.write(f"{r['key']} {r['text']}\n")
        with open(os.path.join(args.output_dir, "results.jsonl"), "w",
                  encoding="utf-8") as fj:
            for r in results:
                fj.write(json.dumps(
                    {k: v for k, v in r.items() if k != "raw_tokens"},
                    ensure_ascii=False, default=str) + "\n")
    for r in results:
        print(json.dumps({"key": r["key"], "text": r["text"]},
                         ensure_ascii=False))
    return results


if __name__ == "__main__":
    main()
