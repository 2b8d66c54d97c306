"""Host-side chat assembly for LLMASR2/3/4 (reference llm_asr/model.py:574
``data_template`` + :595/:1090 ``data_load_speech``).

Turns a list of chat messages (``[{"role": ..., "content": ...}]``) whose
user content may embed audio via ``<|startofspeech|>!<path-or-array>
<|endofspeech|>`` into the tensors the chat models consume:

- ``input_ids`` — the ChatML-rendered token sequence with each speech span
  replaced by ``fake_token_len`` placeholder tokens,
- ``labels_ids`` — -100 everywhere except assistant-answer tokens,
- ``fbank_beg`` / ``fake_token_len`` — (n_turns,) span positions/lengths,
- the list of audio arrays (to be featurized and stacked by the caller).

The adaptor's downsample rate decides how many LLM positions one clip
occupies: ``fake_token_len = ceil(frames / adaptor_k)``.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Sequence, Tuple

import numpy as np

_SPEECH_RE = re.compile(r"(<\|startofspeech\|>.*?<\|endofspeech\|>)",
                        re.DOTALL)

CHATML_SYSTEM = "<|im_start|>system\n{}<|im_end|>\n"
CHATML_USER = "<|im_start|>user\n{}<|im_end|>\n<|im_start|>assistant\n"


def split_turns(messages: Sequence[Dict[str, str]]) -> Dict[str, List[str]]:
    """reference data_template: bucket messages by role; system prompt is
    broadcast over user turns."""
    system, user, assistant = [], [], []
    for m in messages:
        {"system": system, "user": user,
         "assistant": assistant}[m["role"]].append(m["content"])
    if not system:
        system = [""]
    system = system * len(user)
    return {"system": system, "user": user, "assistant": assistant}


def build_chat_inputs(
    messages: Sequence[Dict[str, str]],
    tokenizer,
    placeholder_id: int = 0,
    frames_per_clip=None,  # callable path_or_array -> encoder frames
    adaptor_k: int = 1,
) -> Dict[str, Any]:
    """Render a (possibly multi-turn) conversation to LLMASR2/4 tensors.

    ``tokenizer`` needs ``tokens2ids``/``encode``-style ``(str) -> ids``;
    any object with ``.encode`` or ``.tokens2ids`` works.
    ``frames_per_clip(spec)`` maps the audio spec inside the placeholder
    (string path after ``!`` or an array) to its encoder frame count.
    """
    enc = (tokenizer.encode if hasattr(tokenizer, "encode")
           else lambda s: tokenizer.tokens2ids(list(s)))
    conts = split_turns(messages)
    ids: List[int] = []
    labels: List[int] = []
    fbank_beg: List[int] = []
    fake_lens: List[int] = []
    audios: List[Any] = []

    for sys_p, user_p, ans in zip(conts["system"], conts["user"],
                                  conts["assistant"]):
        src = CHATML_SYSTEM.format(sys_p) if not ids else ""
        src += CHATML_USER.format(user_p)
        for part in _SPEECH_RE.split(src):
            if part.startswith("<|startofspeech|>"):
                spec = part[len("<|startofspeech|>"):
                            -len("<|endofspeech|>")]
                if spec.startswith("!"):
                    spec = spec[1:]
                n_frames = (frames_per_clip(spec)
                            if frames_per_clip is not None else 1)
                fake = max(1, -(-int(n_frames) // max(adaptor_k, 1)))
                fbank_beg.append(len(ids))
                fake_lens.append(fake)
                audios.append(spec)
                ids.extend([placeholder_id] * fake)
                labels.extend([-100] * fake)
            elif part:
                t = list(enc(part))
                ids.extend(t)
                labels.extend([-100] * len(t))
        a = list(enc(ans + "<|im_end|>")) if ans else []
        ids.extend(a)
        labels.extend(a)  # answers supervise the LM

    return {
        "input_ids": np.asarray(ids, np.int32)[None, :],
        "labels_ids": np.asarray(labels, np.int32)[None, :],
        "attention_mask": np.ones((1, len(ids)), np.int32),
        "fbank_beg": np.asarray(fbank_beg, np.int32)[None, :],
        "fake_token_len": np.asarray(fake_lens, np.int32)[None, :],
        "audios": audios,
    }
