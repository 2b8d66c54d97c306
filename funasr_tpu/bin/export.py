"""CLI: ``funasr-tpu-export`` — export a model as a StableHLO servable
bundle (reference funasr/bin/export.py:10 ``funasr-export`` exports ONNX;
here the artifact is jax.export programs + model.npz + config.yaml, see
funasr_tpu/auto/export.py).

Usage:
    funasr-tpu-export --model <dir|yaml> --output-dir artifacts/ \
        [--batch-sizes 1,8] [--seconds 15,60] [++key=value ...]
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser(prog="funasr-tpu-export")
    ap.add_argument("--model", required=True)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--batch-sizes", default="1,8")
    ap.add_argument("--seconds", default="15")
    ap.add_argument("--platforms", default=None,
                    help="comma list, e.g. cpu,tpu (default: current)")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)

    from funasr_tpu.auto.auto_model import AutoModel
    from funasr_tpu.bin.inference import parse_overrides

    model_conf = parse_overrides(args.overrides)
    am = AutoModel(model=args.model, model_conf=model_conf or None)
    meta = am.export(
        args.output_dir,
        batch_sizes=[int(x) for x in args.batch_sizes.split(",")],
        seconds=[int(x) for x in args.seconds.split(",")],
        platforms=(args.platforms.split(",") if args.platforms else None),
    )
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
