"""sensevoice2jsonl: SenseVoice training manifests (reference
funasr/datasets/audio_datasets/sensevoice2jsonl.py) — wav.scp + text.txt
(+ optional per-utt language/emotion/event/textnorm files) -> jsonl with
the prompt fields SenseVoice training consumes.
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, Optional

from funasr_tpu.bin.scp2jsonl import _read_kv, _wav_num_samples


def sensevoice2jsonl(scp_file: str, text_file: str, out_file: str,
                     lid_file: Optional[str] = None,
                     emo_file: Optional[str] = None,
                     event_file: Optional[str] = None,
                     textnorm_file: Optional[str] = None) -> int:
    import os

    wavs = _read_kv(scp_file)
    texts = _read_kv(text_file)
    lids = _read_kv(lid_file) if lid_file else {}
    emos = _read_kv(emo_file) if emo_file else {}
    events = _read_kv(event_file) if event_file else {}
    tns = _read_kv(textnorm_file) if textnorm_file else {}
    n = 0
    with open(out_file, "w", encoding="utf-8") as f:
        for key, src in wavs.items():
            tgt = texts.get(key, "")
            n_samp = _wav_num_samples(src) if os.path.exists(src) else None
            rec: Dict = {
                "key": key, "source": src,
                "source_len": n_samp if n_samp else 1,
                "target": tgt,
                "target_len": (len(tgt.split()) if " " in tgt else len(tgt)),
                "text_language": lids.get(key, "<|zh|>"),
                "emo_target": emos.get(key, "<|NEUTRAL|>"),
                "event_target": events.get(key, "<|Speech|>"),
                "with_or_wo_itn": tns.get(key, "<|woitn|>"),
            }
            f.write(json.dumps(rec, ensure_ascii=False) + "\n")
            n += 1
    return n


def main(argv=None):  # CLI: funasr-tpu-sensevoice2jsonl
    ap = argparse.ArgumentParser(prog="funasr-tpu-sensevoice2jsonl")
    ap.add_argument("--scp_file_list", nargs="+", required=True,
                    help="wav.scp text.txt [lid emo event textnorm]")
    ap.add_argument("--jsonl_file_out", required=True)
    args = ap.parse_args(argv)
    files = args.scp_file_list + [None] * (6 - len(args.scp_file_list))
    n = sensevoice2jsonl(files[0], files[1], args.jsonl_file_out,
                         *files[2:6])
    print(f"wrote {n} records to {args.jsonl_file_out}")


if __name__ == "__main__":
    main()
