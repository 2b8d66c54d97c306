"""Dataloader entry: dataset + bucketed sampler -> per-epoch batch iterator
(reference funasr/datasets/dataloader_entry.py:48 ``DataloaderMapStyle``,
``build_iter``:83).

The reference's ``data_split_num`` slices a giant jsonl list and rebuilds
the dataset per slice for large-scale training; here the split keeps the
index list resident and re-batches per slice.  ``build_iter(epoch,
start_step)`` matches the Trainer contract (mid-epoch resume re-enters the
sampler at ``start_step``).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

from funasr_tpu.registry import tables


@tables.register("dataloader_classes", "Dataloader")
class Dataloader:
    def __init__(self, dataset, sampler, collate_kwargs: Optional[Dict] = None,
                 featurize: Optional[Callable] = None,
                 data_split_num: int = 1):
        self.dataset = dataset
        self.sampler = sampler
        self.collate_kwargs = dict(collate_kwargs or {})
        self.featurize = featurize
        self.data_split_num = max(1, int(data_split_num))

    def __len__(self):
        return len(self.sampler) if hasattr(self.sampler, "__len__") else 0

    def build_iter(self, epoch: int, start_step: int = 0,
                   data_split_i: int = 0):
        """Yields collated (and optionally featurized) batches."""
        self.sampler.set_epoch(epoch, start_step)
        n = len(self.dataset)
        lo = n * data_split_i // self.data_split_num
        hi = n * (data_split_i + 1) // self.data_split_num
        # RE-BATCH within the slice (reference dataloader_entry.py:83
        # rebuilds the dataset per slice): filtering each full-dataset
        # batch down to the slice would yield mostly-fragment batches
        # padded to the full static shape (~data_split_num x wasted
        # compute per step)
        pending: list = []
        pending_src = 0
        pending_tgt = 0

        def emit(indices):
            kw = dict(self.collate_kwargs)
            if pending_src:
                kw.setdefault("pad_speech_len", pending_src)
            if pending_tgt:
                kw.setdefault("pad_text_len", pending_tgt)
            batch = self.dataset.collate(
                [self.dataset[i] for i in indices], **kw)
            if self.featurize is not None:
                batch = self.featurize(batch)
            return batch

        for b in self.sampler:
            idx = [i for i in b.indices
                   if self.data_split_num == 1 or lo <= i < hi]
            if not idx:
                continue
            target = len(b.indices)
            pending.extend(idx)
            pending_src = max(pending_src,
                              getattr(b, "pad_source_len", 0) or 0)
            pending_tgt = max(pending_tgt,
                              getattr(b, "pad_target_len", 0) or 0)
            while len(pending) >= target:
                take, pending = pending[:target], pending[target:]
                yield emit(take)
        if pending:
            yield emit(pending)
