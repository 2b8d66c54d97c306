"""CLI: compute dataset CMVN stats (reference
funasr/bin/compute_audio_cmvn.py): accumulate mean/var of LFR features over
a jsonl corpus and write a kaldi-style ``am.mvn``."""

from __future__ import annotations

import argparse

import numpy as np


def write_kaldi_mvn(path: str, means: np.ndarray, istd: np.ndarray):
    d = len(means)
    with open(path, "w", encoding="utf-8") as f:
        f.write(f"<Nnet>\n<Splice> {d} {d}\n[ 0 ]\n")
        f.write(f"<AddShift> {d} {d}\n")
        f.write("<LearnRateCoef> 0 [ " + " ".join(f"{m:.8f}" for m in means) + " ]\n")
        f.write(f"<Rescale> {d} {d}\n")
        f.write("<LearnRateCoef> 0 [ " + " ".join(f"{v:.8f}" for v in istd) + " ]\n")
        f.write("</Nnet>\n")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="funasr-tpu-cmvn")
    ap.add_argument("--train-jsonl", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--n-mels", type=int, default=80)
    ap.add_argument("--lfr-m", type=int, default=7)
    ap.add_argument("--lfr-n", type=int, default=6)
    ap.add_argument("--max-utts", type=int, default=0)
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from funasr_tpu.datasets.index_ds import IndexDSJsonl
    from funasr_tpu.ops import fbank as F
    from funasr_tpu.utils.audio import load_audio

    ids = IndexDSJsonl(args.train_jsonl)
    dim = args.n_mels * args.lfr_m
    total = np.zeros(dim)
    total_sq = np.zeros(dim)
    n = 0
    recs = ids.contents[: args.max_utts] if args.max_utts else ids.contents
    for rec in recs:
        wav = load_audio(rec["source"])
        feats, flens = F.fbank(jnp.asarray(wav[None]),
                               jnp.asarray([len(wav)]),
                               num_mel_bins=args.n_mels, dither=0.0)
        lfr, lfr_lens = F.apply_lfr(feats, flens, args.lfr_m, args.lfr_n)
        x = np.asarray(lfr[0, : int(lfr_lens[0])])
        total += x.sum(axis=0)
        total_sq += (x ** 2).sum(axis=0)
        n += x.shape[0]
    mean = total / max(n, 1)
    var = total_sq / max(n, 1) - mean ** 2
    istd = 1.0 / np.sqrt(np.maximum(var, 1e-8))
    # am.mvn stores negated means (applied as (x + means) * vars)
    write_kaldi_mvn(args.output, -mean, istd)
    print(f"wrote {args.output}: {n} frames, dim {dim}")


if __name__ == "__main__":
    main()
