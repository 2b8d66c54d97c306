#!/usr/bin/env bash
# Audio-LLM ASR (reference llm_asr/demo.py): encoder + adaptor + causal
# LLM.  LLMASR2/3/4 chat-splice wirings since r4
# (models/llm_asr/chat.py assembles <|startofspeech|> conversations).
python - <<'PY'
from funasr_tpu.models.llm_asr.chat import build_chat_inputs

msgs = [
    {"role": "system", "content": "transcribe the speech"},
    {"role": "user",
     "content": "<|startofspeech|>!asr_example_zh.wav<|endofspeech|>"},
    {"role": "assistant", "content": ""},
]
print("chat tensors:", {k: getattr(v, "shape", v)
                        for k, v in build_chat_inputs(
                            msgs, type("T", (), {"encode": staticmethod(
                                lambda s: [3] * len(s))})(),
                            frames_per_clip=lambda p: 100,
                            adaptor_k=4).items()})
PY
