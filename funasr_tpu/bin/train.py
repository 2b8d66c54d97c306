"""CLI: ``funasr-tpu-train`` (reference funasr/bin/train.py:40).

Wires config -> tokenizer/dataset/sampler -> model -> sharded train step ->
Trainer.  Data parallel by default over every visible device; tensor
parallel via ``--model-parallel N``.
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np


def iter_split_batches(sampler, n_items: int, data_split_num: int,
                       epoch: int, start_step: int = 0):
    """Yield ``(indices, pad_source_len, pad_target_len)`` batches; with
    ``data_split_num > 1`` the dataset index range is processed in N
    contiguous slices per epoch, re-batched to full batch shapes within
    each slice (reference dataloader_entry.py:83 memory-bounded loading —
    same semantics as datasets/dataloader.py ``Dataloader.build_iter``).

    ``start_step`` resumes mid-epoch by skipping that many EMITTED
    batches of the whole epoch (the split path replays the slice
    iteration deterministically and drops the already-consumed prefix)."""
    if data_split_num <= 1:
        sampler.set_epoch(epoch, start_step)
        for b in sampler:
            yield list(b.indices), b.pad_source_len, b.pad_target_len
        return
    emitted = 0

    def emit(items):
        nonlocal emitted
        emitted += 1
        if emitted <= start_step:
            return None
        idx = [i for i, _, _ in items]
        return (idx, max(s for _, s, _ in items),
                max(t for _, _, t in items))

    for split_i in range(data_split_num):
        sampler.set_epoch(epoch * data_split_num + split_i, 0)
        lo = n_items * split_i // data_split_num
        hi = n_items * (split_i + 1) // data_split_num
        pending = []  # (index, pad_source_len, pad_target_len) per item
        for b in sampler:
            idx = [i for i in b.indices if lo <= i < hi]
            if not idx:
                continue
            pending.extend((i, b.pad_source_len or 0,
                            b.pad_target_len or 0) for i in idx)
            target = len(b.indices)
            while len(pending) >= target:
                take, pending = pending[:target], pending[target:]
                out = emit(take)
                if out is not None:
                    yield out
        if pending:
            out = emit(pending)
            if out is not None:
                yield out


def main(argv=None):
    ap = argparse.ArgumentParser(prog="funasr-tpu-train")
    ap.add_argument("--config", required=True, help="model/train yaml")
    ap.add_argument("--train-jsonl", required=True)
    ap.add_argument("--valid-jsonl", default=None)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--model-parallel", type=int, default=1)
    ap.add_argument("--pipeline-parallel", type=int, default=0, metavar="N",
                    help="shard the encoder LAYER axis over the model "
                         "mesh axis with N GPipe microbatches "
                         "(parallel/pp.py; requires --model-parallel > 1 "
                         "and scanned layer count divisible by it)")
    ap.add_argument("--fsdp", action="store_true",
                    help="shard params over the data axis (ZeRO/FSDP "
                         "equivalent, reference bin/train.py:123-146)")
    ap.add_argument("--max-epoch", type=int, default=None)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp

    from funasr_tpu.bin.inference import parse_overrides
    from funasr_tpu.config import deep_update, load_config
    from funasr_tpu.datasets.dataset import AudioDataset
    from funasr_tpu.datasets.index_ds import IndexDSJsonl
    from funasr_tpu.datasets.samplers import DynamicBatchSampler
    from funasr_tpu.ops import fbank as F
    from funasr_tpu.parallel.mesh import batch_sharding, make_mesh, param_shardings
    from funasr_tpu.registry import tables
    from funasr_tpu.train.checkpoint import CheckpointManager
    from funasr_tpu.train.optim import build_optimizer
    from funasr_tpu.train.train_step import TrainState, make_train_step
    from funasr_tpu.train.trainer import Trainer
    from funasr_tpu.auto.auto_model import _build_frontend, _build_tokenizer

    cfg = load_config(args.config)
    deep_update(cfg, parse_overrides(args.overrides))
    train_conf = cfg.get("train_conf") or {}

    tokenizer = _build_tokenizer(cfg)
    frontend = _build_frontend(cfg)
    vocab = cfg.get("vocab_size") or tokenizer.get_vocab_size()
    input_size = cfg.get("input_size", frontend.n_mels * frontend.lfr_m)

    model_cls = tables.get("model_classes", cfg.get("model", "Paraformer"))
    model = model_cls(
        vocab_size=vocab, input_size=input_size,
        encoder_conf=cfg.get("encoder_conf"),
        decoder_conf=cfg.get("decoder_conf"),
        predictor_conf=cfg.get("predictor_conf"),
        **(cfg.get("model_conf") or {}),
    )

    ids = IndexDSJsonl(args.train_jsonl)
    ds = AudioDataset(ids, tokenizer=tokenizer, fs=frontend.fs)
    ds_conf = cfg.get("dataset_conf") or {}
    sampler = DynamicBatchSampler(
        ds.source_lens(), ds.target_lens(),
        batch_type=ds_conf.get("batch_type", "length"),
        batch_size=ds_conf.get("batch_size", 16000 * 60),
        buffer_size=ds_conf.get("buffer_size", 500),
        shuffle=ds_conf.get("shuffle", True),
    )

    # mesh + sharded state
    mesh = make_mesh(model=args.model_parallel)
    rng = jax.random.PRNGKey(cfg.get("seed", 0))

    # train-path dither (reference wav_frontend.py:131 applies
    # frontend_conf.dither when extracting training features); eval path
    # passes train=False for deterministic features
    dither = float(getattr(frontend, "dither", 0.0) or 0.0)
    _dither_step = [0]

    def featurize(batch, train=True):
        drng = None
        if dither and train:
            drng = jax.random.fold_in(jax.random.PRNGKey(
                cfg.get("seed", 0) + 1), _dither_step[0])
            _dither_step[0] += 1
        feats, flens = F.fbank(jnp.asarray(batch["speech"]),
                               jnp.asarray(batch["speech_lengths"]),
                               num_mel_bins=frontend.n_mels,
                               dither=dither if drng is not None else 0.0,
                               rng=drng)
        if frontend.lfr_m != 1 or frontend.lfr_n != 1:
            feats, flens = F.apply_lfr(feats, flens, frontend.lfr_m, frontend.lfr_n)
        feats = F.apply_cmvn(feats, frontend.cmvn)
        return dict(speech=feats, speech_lengths=flens,
                    text=jnp.asarray(batch["text"]),
                    text_lengths=jnp.asarray(batch["text_lengths"]))

    first = next(iter(sampler))
    b0 = featurize(ds.collate([ds[i] for i in first.indices],
                              first.pad_source_len, first.pad_target_len),
                   train=False)
    params = model.init({"params": rng, "dropout": rng, "sampler": rng},
                        b0["speech"], b0["speech_lengths"],
                        b0["text"], b0["text_lengths"])
    params = jax.device_put(
        params, param_shardings(params, mesh, fsdp=args.fsdp))

    tx, _ = build_optimizer(
        cfg.get("optim", "adam"), cfg.get("optim_conf"),
        cfg.get("scheduler", "warmuplr"), cfg.get("scheduler_conf"),
        grad_clip=train_conf.get("grad_clip", 5.0),
    )
    from funasr_tpu.parallel.mesh import init_sharded_opt_state
    opt_state = init_sharded_opt_state(tx, params, mesh)
    state = TrainState(params, opt_state, jnp.zeros((), jnp.int32))
    if args.pipeline_parallel > 0:
        # route the scanned encoder stack through the GPipe schedule
        # inside the unmodified train step (dp x pp; parallel/pp.py).
        # Trace-time flag: the jit must happen inside the context, and
        # the context must stay enabled for the step's lifetime.
        from funasr_tpu.parallel import pp

        if args.model_parallel <= 1:
            raise SystemExit("--pipeline-parallel requires "
                             "--model-parallel > 1 (the layer axis "
                             "shards over the model mesh axis)")
        n_rest = int((cfg.get("encoder_conf") or {})
                     .get("num_blocks", 6)) - 1
        if n_rest % args.model_parallel:
            raise SystemExit(
                f"--pipeline-parallel: encoder scanned layers ({n_rest}) "
                f"must divide by --model-parallel ({args.model_parallel})")
        pp.enable(mesh, axis="model", n_micro=args.pipeline_parallel,
                  batch_axis="data")
    train_step = jax.jit(make_train_step(
        model, tx, accum_grad=train_conf.get("accum_grad", 1)))

    def eval_step(params, batch):
        loss, stats = model.apply(
            params, batch["speech"], batch["speech_lengths"],
            batch["text"], batch["text_lengths"], deterministic=True)
        return {"loss": loss, "acc": stats.get("acc", jnp.zeros(()))}

    ckpt = CheckpointManager(
        os.path.join(args.output_dir, "ckpt"),
        keep_nbest=train_conf.get("keep_nbest_models", 10),
    )
    trainer = Trainer(
        train_step, eval_step, ckpt,
        max_epoch=args.max_epoch or train_conf.get("max_epoch", 100),
        validate_interval=train_conf.get("validate_interval", 5000),
        save_checkpoint_interval=train_conf.get("save_checkpoint_interval", 5000),
        log_interval=train_conf.get("log_interval", 50),
    )
    state = trainer.resume(state)

    bsh = batch_sharding(mesh)
    dp = mesh.shape["data"]

    # dataset_conf.data_split_num: split each epoch's dataset into N
    # slices loaded/batched in turn (reference dataloader_entry.py:83
    # memory-bounded loading; datasets/dataloader.py implements the
    # slice re-batching)
    data_split_num = max(1, int(ds_conf.get("data_split_num", 1)))

    def build_iter(epoch, start_step):
        for idx, psrc, ptgt in iter_split_batches(
                sampler, len(ds), data_split_num, epoch, start_step):
            # data-parallel sharding needs batch % dp == 0 (and % n_micro
            # under --pipeline-parallel, else the pp branch would silently
            # fall back to the sequential scan); pad by repeating (same
            # weighting effect as DistributedSampler's sample padding)
            quantum = dp * max(args.pipeline_parallel, 1)
            idx = list(idx)
            while len(idx) % quantum:
                idx.append(idx[-1])
            batch = featurize(ds.collate([ds[i] for i in idx], psrc, ptgt))
            yield jax.device_put(batch, bsh)

    valid_iter = None
    if args.valid_jsonl:
        vids = IndexDSJsonl(args.valid_jsonl)
        vds = AudioDataset(vids, tokenizer=tokenizer, fs=frontend.fs)
        vsampler = DynamicBatchSampler(
            vds.source_lens(), vds.target_lens(),
            batch_type="example", batch_size=8, shuffle=False)

        def valid_iter():
            for b in vsampler:
                yield featurize(vds.collate(
                    [vds[i] for i in b.indices],
                    b.pad_source_len, b.pad_target_len), train=False)

    state = trainer.run(state, build_iter, valid_iter)
    if ckpt.latest_step() is not None:
        avg = ckpt.average_nbest(
            train_conf.get("avg_nbest_model", 10),
            params_of=lambda p: p["state"]["params"],
        )
        np.savez(os.path.join(args.output_dir, "model.avg.npz"),
                 **_flatten(avg))
    return state


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = np.asarray(v)
    return out


if __name__ == "__main__":
    main()
