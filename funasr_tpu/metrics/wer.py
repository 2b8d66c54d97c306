"""WER/CER computation (reference funasr/metrics/wer.py:8 ``compute_wer``):
Levenshtein alignment per utterance + corpus aggregate."""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple


def edit_distance(ref: Sequence, hyp: Sequence) -> Dict[str, int]:
    """Levenshtein with op counts: returns {sub, ins, del, cor}."""
    n, m = len(ref), len(hyp)
    # dp[i][j] = (cost, sub, ins, del)
    prev = [(j, 0, j, 0) for j in range(m + 1)]
    for i in range(1, n + 1):
        cur = [(i, 0, 0, i)]
        for j in range(1, m + 1):
            if ref[i - 1] == hyp[j - 1]:
                cand = [(prev[j - 1][0], *prev[j - 1][1:])]
            else:
                cand = [(prev[j - 1][0] + 1, prev[j - 1][1] + 1,
                         prev[j - 1][2], prev[j - 1][3])]
            cand.append((cur[j - 1][0] + 1, cur[j - 1][1],
                         cur[j - 1][2] + 1, cur[j - 1][3]))  # insertion
            cand.append((prev[j][0] + 1, prev[j][1], prev[j][2],
                         prev[j][3] + 1))  # deletion
            cur.append(min(cand))
        prev = cur
    cost, sub, ins, dele = prev[m]
    return {"sub": sub, "ins": ins, "del": dele,
            "cor": n - sub - dele, "ref_len": n}


def compute_wer(
    refs: Dict[str, List[str]], hyps: Dict[str, List[str]]
) -> Dict[str, float]:
    """Corpus WER/CER over {key: token list} maps; missing hyps count as
    full deletions (reference behavior)."""
    total = {"sub": 0, "ins": 0, "del": 0, "cor": 0, "ref_len": 0}
    n_utt = 0
    for k, ref in refs.items():
        hyp = hyps.get(k, [])
        d = edit_distance(ref, hyp)
        for f in total:
            total[f] += d[f]
        n_utt += 1
    errors = total["sub"] + total["ins"] + total["del"]
    wer = errors / max(total["ref_len"], 1)
    return {"wer": wer, "n_utt": n_utt, **total}


def cer_from_text(ref_text: str, hyp_text: str) -> float:
    """Character error rate on whitespace-stripped text."""
    ref = [c for c in ref_text if not c.isspace()]
    hyp = [c for c in hyp_text if not c.isspace()]
    d = edit_distance(ref, hyp)
    return (d["sub"] + d["ins"] + d["del"]) / max(d["ref_len"], 1)


def main(argv=None):
    """CLI: ``python -m funasr_tpu.metrics.wer --ref ref --hyp hyp [--cer]``.

    ``ref``/``hyp`` are kaldi-style "key text" files or jsonl with
    {key, target|text} records (reference utils/compute_wer.py usage in
    examples/*/run.sh stage 5)."""
    import argparse
    import json

    ap = argparse.ArgumentParser(prog="funasr-tpu-wer")
    ap.add_argument("--ref", required=True)
    ap.add_argument("--hyp", required=True)
    ap.add_argument("--cer", action="store_true",
                    help="score characters (CJK) instead of words")
    args = ap.parse_args(argv)

    def read(path):
        out = {}
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                if path.endswith(".jsonl"):
                    rec = json.loads(line)
                    k = rec.get("key")
                    t = rec.get("target") or rec.get("text") or ""
                else:
                    parts = line.split(maxsplit=1)
                    k, t = parts[0], parts[1] if len(parts) == 2 else ""
                toks = ([c for c in t if not c.isspace()] if args.cer
                        else t.split())
                out[k] = toks
        return out

    stats = compute_wer(read(args.ref), read(args.hyp))
    name = "CER" if args.cer else "WER"
    print(f"{name}: {stats['wer'] * 100:.2f}%  "
          f"(N={stats['ref_len']} S={stats['sub']} D={stats['del']} "
          f"I={stats['ins']} utts={stats['n_utt']})")
    return stats


if __name__ == "__main__":
    main()
