"""Audio dataset + collator (reference
funasr/datasets/audio_datasets/datasets.py:10 ``AudioDataset``).

TPU split of responsibilities: the host dataset only loads waveforms and
tokenizes targets; fbank/LFR/CMVN run *on device inside the jitted step*
(they are fused XLA ops in funasr_tpu.ops.fbank), so the collator pads raw
waveforms to the sampler's quantized shape.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from funasr_tpu.registry import tables
from funasr_tpu.utils.audio import load_audio


@tables.register("dataset_classes", "AudioDataset")
class AudioDataset:
    def __init__(
        self,
        index_ds,
        tokenizer=None,
        fs: int = 16000,
        data_type: str = "sound",
        **kwargs,
    ):
        self.index_ds = index_ds
        self.tokenizer = tokenizer
        self.fs = fs
        self.data_type = data_type

    def __len__(self):
        return len(self.index_ds)

    def source_lens(self) -> List[int]:
        return [rec["source_len"] for rec in self.index_ds.contents]

    def target_lens(self) -> List[int]:
        return [rec["target_len"] for rec in self.index_ds.contents]

    def __getitem__(self, i: int) -> Dict[str, Any]:
        rec = self.index_ds[i]
        wav = load_audio(rec["source"], fs=self.fs)
        item = {"key": rec["key"], "speech": wav, "speech_length": len(wav)}
        if self.tokenizer is not None and rec.get("target"):
            ids = self.tokenizer.encode(rec["target"])
            item["text"] = np.asarray(ids, np.int32)
            item["text_length"] = len(ids)
        return item

    def collate(
        self,
        items: List[Dict[str, Any]],
        pad_speech_len: Optional[int] = None,
        pad_text_len: Optional[int] = None,
        ignore_id: int = -1,
    ) -> Dict[str, np.ndarray]:
        """Pad a list of items to (quantized) batch shapes."""
        B = len(items)
        true_s = max(it["speech_length"] for it in items)
        s_len = pad_speech_len or true_s
        if s_len < true_s:
            raise ValueError(
                f"pad_speech_len={s_len} is below the longest item "
                f"({true_s} samples) — the sampler's length grid must cover "
                "the dataset max (silent truncation would corrupt training)")
        speech = np.zeros((B, s_len), np.float32)
        speech_lengths = np.zeros((B,), np.int32)
        for b, it in enumerate(items):
            n = min(it["speech_length"], s_len)
            speech[b, :n] = it["speech"][:n]
            speech_lengths[b] = n
        batch = {
            "speech": speech,
            "speech_lengths": speech_lengths,
            "keys": [it["key"] for it in items],
        }
        if "text" in items[0]:
            true_t = max(it["text_length"] for it in items)
            t_len = pad_text_len or true_t
            if t_len < true_t:
                raise ValueError(
                    f"pad_text_len={t_len} is below the longest target "
                    f"({true_t} tokens) — widen the sampler's target grid")
            text = np.full((B, t_len), ignore_id, np.int32)
            text_lengths = np.zeros((B,), np.int32)
            for b, it in enumerate(items):
                n = min(it["text_length"], t_len)
                text[b, :n] = it["text"][:n]
                text_lengths[b] = n
            batch["text"] = text
            batch["text_lengths"] = text_lengths
        return batch


@tables.register("dataset_classes", "SenseVoiceCTCDataset")
class SenseVoiceCTCDataset(AudioDataset):
    """SenseVoice CTC training dataset (reference
    funasr/datasets/sense_voice_datasets/datasets.py:235
    ``SenseVoiceCTCDataset``): the target is ``[lid, emo, event, itn,
    text]`` token ids — the rich-tag prefix tokens come from the jsonl
    fields ``text_language`` / ``emo_target`` / ``event_target`` /
    ``with_or_wo_itn`` (defaults <|zh|> <|NEUTRAL|> <|Speech|> <|woitn|>,
    datasets.py:328-331), produced by the sensevoice2jsonl CLI."""

    def __getitem__(self, i: int) -> Dict[str, Any]:
        rec = self.index_ds[i]
        wav = load_audio(rec["source"], fs=self.fs)
        item = {"key": rec["key"], "speech": wav, "speech_length": len(wav)}
        if self.tokenizer is not None and rec.get("target"):
            prefix = (rec.get("text_language", "<|zh|>")
                      + rec.get("emo_target", "<|NEUTRAL|>")
                      + rec.get("event_target", "<|Speech|>")
                      + rec.get("with_or_wo_itn", "<|woitn|>"))
            ids = (self.tokenizer.encode(prefix)
                   + self.tokenizer.encode(rec["target"]))
            item["text"] = np.asarray(ids, np.int32)
            item["text_length"] = len(ids)
        return item


@tables.register("dataset_classes", "SenseVoiceDataset")
class SenseVoiceDataset(AudioDataset):
    """SenseVoice AR (whisper-style) training dataset (reference
    funasr/datasets/sense_voice_datasets/datasets.py:11 ``SenseVoiceDataset``):
    the prompt ``[sos, task, text_language]`` (defaults
    <|startoftranscript|><|ASR|><|zh|>, datasets.py:104-115) is prepended and
    ``eos`` appended; ``prompt_length`` counts the prompt tokens so the loss
    can skip them (reference target_mask over prompt_ids_len)."""

    def __init__(self, index_ds, tokenizer=None, fs: int = 16000,
                 data_type: str = "sound", sos: str = "<|startoftranscript|>",
                 eos: str = "<|endoftext|>", **kwargs):
        super().__init__(index_ds, tokenizer, fs, data_type, **kwargs)
        self.sos = sos
        self.eos = eos

    def __getitem__(self, i: int) -> Dict[str, Any]:
        rec = self.index_ds[i]
        wav = load_audio(rec["source"], fs=self.fs)
        item = {"key": rec["key"], "speech": wav, "speech_length": len(wav)}
        if self.tokenizer is not None and rec.get("target"):
            task = rec.get("prompt", "<|ASR|>")
            lang = rec.get("text_language", "<|zh|>")
            prompt_ids = self.tokenizer.encode(f"{self.sos}{task}{lang}")
            ids = (prompt_ids + self.tokenizer.encode(rec["target"])
                   + self.tokenizer.encode(self.eos))
            item["text"] = np.asarray(ids, np.int32)
            item["text_length"] = len(ids)
            item["prompt_length"] = len(prompt_ids)
        return item

    def collate(self, items, pad_speech_len=None, pad_text_len=None,
                ignore_id: int = -1):
        batch = super().collate(items, pad_speech_len, pad_text_len,
                                ignore_id)
        if "prompt_length" in items[0]:
            batch["prompt_lengths"] = np.asarray(
                [it["prompt_length"] for it in items], np.int32)
        return batch


@tables.register("dataset_classes", "KwsMTDataset")
class KwsMTDataset(AudioDataset):
    """Multi-task KWS dataset (reference
    funasr/datasets/kws_datasets/datasets.py:10 ``KwsMTDataset``): the same
    target is tokenized by TWO tokenizers — keyword vocabulary (``text``)
    and full ASR vocabulary (``text2``) — feeding FsmnKWSMT's dual CTC
    heads (kws_datasets/datasets.py:82-96)."""

    def __init__(self, index_ds, tokenizer=None, tokenizer2=None,
                 fs: int = 16000, data_type: str = "sound", **kwargs):
        super().__init__(index_ds, tokenizer, fs, data_type, **kwargs)
        self.tokenizer2 = tokenizer2

    def __getitem__(self, i: int) -> Dict[str, Any]:
        item = super().__getitem__(i)
        rec = self.index_ds[i]
        if self.tokenizer2 is not None and rec.get("target"):
            ids2 = self.tokenizer2.encode(rec["target"])
            item["text2"] = np.asarray(ids2, np.int32)
            item["text2_length"] = len(ids2)
        return item

    def collate(self, items, pad_speech_len=None, pad_text_len=None,
                ignore_id: int = -1, pad_text2_len=None):
        batch = super().collate(items, pad_speech_len, pad_text_len,
                                ignore_id)
        if "text2" in items[0]:
            B = len(items)
            t_len = pad_text2_len or max(it["text2_length"] for it in items)
            text2 = np.full((B, t_len), ignore_id, np.int32)
            text2_lengths = np.zeros((B,), np.int32)
            for b, it in enumerate(items):
                n = min(it["text2_length"], t_len)
                text2[b, :n] = it["text2"][:n]
                text2_lengths[b] = n
            batch["text2"] = text2
            batch["text2_lengths"] = text2_lengths
        return batch


@tables.register("dataset_classes", "AudioDatasetHotword")
class AudioDatasetHotword(AudioDataset):
    """Hotword-training dataset (reference datasets.py:122
    ``AudioDatasetHotword``): each item additionally samples a random
    span of the target as the hotword, or the no-bias marker.

    Collation pads hotwords into an (H, Lh) grid whose last row is the
    all-blank no-bias entry, plus per-token seaco labels (hotword tokens
    where covered, ``no_bias_id`` elsewhere) for SeACo training.
    """

    def __init__(self, *args, hotword_min_length: int = 2,
                 hotword_max_length: int = 8, sample_rate: float = 0.75,
                 no_bias_id: int = 0, seed: int = 0, **kwargs):
        super().__init__(*args, **kwargs)
        self.hw_min = hotword_min_length
        self.hw_max = hotword_max_length
        self.sample_rate = sample_rate
        self.no_bias_id = no_bias_id
        self.rng = np.random.default_rng(seed)

    def __getitem__(self, i: int) -> Dict[str, Any]:
        item = super().__getitem__(i)
        ids = item.get("text")
        if ids is not None and len(ids) >= self.hw_min \
                and self.rng.random() < self.sample_rate:
            L = int(self.rng.integers(
                self.hw_min, min(self.hw_max, len(ids)) + 1))
            start = int(self.rng.integers(0, len(ids) - L + 1))
            item["hotword"] = ids[start: start + L]
            item["hotword_span"] = (start, start + L)
        return item

    def collate(self, items, pad_speech_len=None, pad_text_len=None,
                ignore_id: int = -1):
        batch = super().collate(items, pad_speech_len, pad_text_len,
                                ignore_id)
        hotwords = [it["hotword"] for it in items if "hotword" in it]
        H = len(hotwords) + 1  # + no-bias row
        Lh = max([len(h) for h in hotwords], default=1)
        hw = np.zeros((H, Lh), np.int32)
        hw_lens = np.ones((H,), np.int32)
        for r, h in enumerate(hotwords):
            hw[r, : len(h)] = h
            hw_lens[r] = len(h)
        batch["hotword_pad"] = hw
        batch["hotword_lengths"] = hw_lens
        # seaco labels over text grid (+1 col for the appended eos)
        if "text" in batch:
            U = batch["text"].shape[1]
            labels = np.full((len(items), U), self.no_bias_id, np.int32)
            labels[batch["text"] == ignore_id] = ignore_id
            for b, it in enumerate(items):
                if "hotword_span" in it:
                    s, e = it["hotword_span"]
                    e = min(e, U)
                    labels[b, s:e] = batch["text"][b, s:e]
            batch["seaco_label_pad"] = labels
        return batch
