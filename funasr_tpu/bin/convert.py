"""funasr-tpu-convert: torch checkpoint -> JAX .npz weights (the import
path replacing the reference's ONNX/TorchScript export,
funasr/bin/export.py — on TPU the serving runtime IS the framework, so
the artifact is a converted parameter tree).

Reads a ``model.pt`` / ``model.pb`` / ``*.bin`` torch state dict (CPU) and
writes ``model.npz`` containing either the name-mapped flax tree
(Paraformer family via funasr_tpu.convert.paraformer_from_torch) or the
raw torch-layout arrays (converted lazily at load by AutoModel).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    ap = argparse.ArgumentParser(prog="funasr-tpu-convert")
    ap.add_argument("--input", required=True,
                    help="torch checkpoint (.pt/.pb/.bin)")
    ap.add_argument("--output", default=None,
                    help="output .npz (default: alongside input)")
    ap.add_argument("--raw", action="store_true",
                    help="store raw torch-layout names (convert at load)")
    ap.add_argument("--arch", default="auto",
                    help="model family (auto fingerprints the state dict: "
                         "paraformer/bicif/seaco/contextual/uniasr/scama/"
                         "transducer/sense_voice/fsmn_vad/fsmn_kws/"
                         "ct_transformer/campplus/eres2net/mossformer/"
                         "emotion2vec/monotonic_aligner/conformer)")
    args = ap.parse_args(argv)

    import numpy as np
    import torch

    sd = torch.load(args.input, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    arrays = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
              for k, v in sd.items()}
    out = args.output or os.path.splitext(args.input)[0] + ".npz"

    if args.raw:
        np.savez(out, **arrays)
        print(f"wrote {len(arrays)} raw tensors to {out}")
        return

    from funasr_tpu.convert import convert_from_torch, detect_arch

    arch = args.arch if args.arch != "auto" else detect_arch(arrays)
    tree = convert_from_torch(arrays, arch=arch)
    print(f"arch: {arch}")

    flat = {}

    def walk(node, prefix=""):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        else:
            flat[prefix] = np.asarray(node)

    walk(tree)
    np.savez(out, **flat)
    print(f"wrote {len(flat)} mapped tensors to {out}")


if __name__ == "__main__":
    main()
