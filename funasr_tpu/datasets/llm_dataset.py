"""Chat-format datasets for audio-LLM training (reference
funasr/datasets/llm_datasets{,_qwen,_vicuna}/ and openai_datasets/ — jsonl
records whose target is a chat exchange; the audio slot sits inside the
user turn).

Record shape::

    {"key": ..., "source": "a.wav",
     "messages": [{"role": "system", "content": "..."},
                  {"role": "user", "content": "<audio>转写这段话"},
                  {"role": "assistant", "content": "今天天气不错"}]}

Templates render the non-assistant turns into the *prompt* token ids and
the (final) assistant turn into the *target* ids: LLM-ASR trains CE on the
target conditioned on [audio prefix; prompt].  ``template``: "qwen" uses
the <|im_start|>/<|im_end|> markup; "openai" plain ``role: content``
lines; "vicuna" the USER/ASSISTANT convention.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from funasr_tpu.datasets.dataset import AudioDataset
from funasr_tpu.registry import tables

AUDIO_TOKEN = "<audio>"


def render_prompt(messages: List[Dict[str, str]], template: str = "qwen"
                  ) -> str:
    """Render all turns before the final assistant reply."""
    parts: List[str] = []
    for m in messages:
        if m["role"] == "assistant":
            continue
        c = m["content"].replace(AUDIO_TOKEN, "")
        if template == "qwen":
            parts.append(f"<|im_start|>{m['role']}\n{c}<|im_end|>")
        elif template == "vicuna":
            tag = "USER" if m["role"] == "user" else "SYSTEM"
            parts.append(f"{tag}: {c}")
        else:  # openai
            parts.append(f"{m['role']}: {c}")
    if template == "qwen":
        parts.append("<|im_start|>assistant\n")
    elif template == "vicuna":
        parts.append("ASSISTANT:")
    else:
        parts.append("assistant:")
    return "\n".join(parts)


def assistant_reply(messages: List[Dict[str, str]]) -> str:
    for m in reversed(messages):
        if m["role"] == "assistant":
            return m["content"]
    return ""


@tables.register("dataset_classes", "LLMDataset")
@tables.register("dataset_classes", "OpenAIDataset")
class LLMDataset(AudioDataset):
    def __init__(self, index_ds, tokenizer=None, fs: int = 16000,
                 template: str = "qwen", **kwargs):
        super().__init__(index_ds, tokenizer, fs, **kwargs)
        self.template = template

    def __getitem__(self, i: int) -> Dict[str, Any]:
        rec = self.index_ds[i]
        from funasr_tpu.utils.audio import load_audio

        wav = load_audio(rec["source"], fs=self.fs)
        messages = rec.get("messages")
        if messages is None:  # plain target -> single-turn transcription
            messages = [
                {"role": "user", "content": f"{AUDIO_TOKEN}转写这段音频"},
                {"role": "assistant", "content": rec.get("target", "")},
            ]
        prompt = render_prompt(messages, self.template)
        reply = assistant_reply(messages)
        item: Dict[str, Any] = {
            "key": rec["key"], "speech": wav, "speech_length": len(wav),
        }
        if self.tokenizer is not None:
            p_ids = self.tokenizer.encode(prompt)
            t_ids = self.tokenizer.encode(reply)
            item["prompt"] = np.asarray(p_ids, np.int32)
            item["prompt_length"] = len(p_ids)
            item["text"] = np.asarray(t_ids, np.int32)
            item["text_length"] = len(t_ids)
        return item

    def collate(self, items, pad_speech_len=None, pad_text_len=None,
                ignore_id: int = -1):
        batch = super().collate(items, pad_speech_len, pad_text_len,
                                ignore_id)
        if "prompt" in items[0]:
            P = max(it["prompt_length"] for it in items)
            prompt = np.zeros((len(items), P), np.int32)
            plens = np.zeros((len(items),), np.int32)
            for b, it in enumerate(items):
                prompt[b, : it["prompt_length"]] = it["prompt"]
                plens[b] = it["prompt_length"]
            batch["prompt"] = prompt
            batch["prompt_lengths"] = plens
        return batch


@tables.register("dataset_classes", "OpenAIDatasetMultiTurn")
class OpenAIDatasetMultiTurn(LLMDataset):
    """Multi-turn chat dataset (reference
    funasr/datasets/openai_datasets/datasets.py:232): the full conversation
    becomes one token stream; CE labels cover every *assistant* span and
    are ``ignore_id`` elsewhere, so the LLM trains on all its replies
    conditioned on the audio prefix.

    Items carry ``input_ids``/``labels`` instead of prompt/text; collation
    pads both to the batch max (up to ``max_token_length``, reference
    datasets.py:287) and reuses the waveform padding of AudioDataset.
    """

    def __init__(self, index_ds, tokenizer=None, fs: int = 16000,
                 template: str = "qwen", multiturn_num_max: int = 5,
                 max_token_length: int = 1500, **kwargs):
        super().__init__(index_ds, tokenizer, fs, template, **kwargs)
        self.multiturn_num_max = multiturn_num_max
        self.max_token_length = max_token_length

    def __getitem__(self, i: int) -> Dict[str, Any]:
        rec = self.index_ds[i]
        from funasr_tpu.utils.audio import load_audio

        wav = load_audio(rec["source"], fs=self.fs)
        messages = rec.get("messages") or [
            {"role": "user", "content": f"{AUDIO_TOKEN}转写这段音频"},
            {"role": "assistant", "content": rec.get("target", "")},
        ]
        item: Dict[str, Any] = {
            "key": rec["key"], "speech": wav, "speech_length": len(wav),
        }
        if self.tokenizer is None:
            return item
        input_ids: List[int] = []
        labels: List[int] = []
        turns = 0
        for m in messages:
            if turns >= self.multiturn_num_max or \
                    len(input_ids) > self.max_token_length:
                break
            c = m["content"].replace(AUDIO_TOKEN, "")
            if m["role"] == "assistant":
                head = self.tokenizer.encode("<|im_start|>assistant\n")
                body = self.tokenizer.encode(c + "<|im_end|>")
                input_ids += head + body
                labels += [-1] * len(head) + body
                turns += 1
            else:
                ids = self.tokenizer.encode(
                    f"<|im_start|>{m['role']}\n{c}<|im_end|>\n")
                input_ids += ids
                labels += [-1] * len(ids)
        item["input_ids"] = np.asarray(input_ids, np.int32)
        item["labels"] = np.asarray(labels, np.int32)
        item["input_length"] = len(input_ids)
        return item

    def collate(self, items, pad_speech_len=None, pad_text_len=None,
                ignore_id: int = -1):
        batch = AudioDataset.collate(self, items, pad_speech_len, None,
                                     ignore_id)
        if "input_ids" in items[0]:
            true_L = max(it["input_length"] for it in items)
            L = pad_text_len or true_L
            if L < true_L:
                raise ValueError(
                    f"pad_text_len={L} is below the longest conversation "
                    f"({true_L} tokens) — widen the sampler's target grid "
                    "(silent truncation would drop supervision spans)")
            ids = np.zeros((len(items), L), np.int32)
            lab = np.full((len(items), L), ignore_id, np.int32)
            lens = np.zeros((len(items),), np.int32)
            for b, it in enumerate(items):
                n = min(it["input_length"], L)
                ids[b, :n] = it["input_ids"][:n]
                lab[b, :n] = it["labels"][:n]
                lens[b] = n
            batch["input_ids"] = ids
            batch["labels"] = lab
            batch["input_lengths"] = lens
        return batch
