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
