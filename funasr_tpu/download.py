"""Model hub resolution (reference
funasr/download/download_model_from_hub.py:8 ``download_model``).

A model name like ``iic/speech_paraformer-large...`` resolves to a local
snapshot directory via ModelScope (default) or HuggingFace hub, then
``config.load_config`` reads its config.yaml/configuration.json layout.
This is deliberately a thin wrapper (SURVEY §7 "What NOT to rebuild"):
the hub SDKs do the caching/auth; absent SDKs or network produce a clear
error instead of an import crash.
"""

from __future__ import annotations

import os
from typing import Optional


def is_hub_id(name: str) -> bool:
    """Heuristic of the reference (download_model:8): not an existing path
    and shaped like ``org/name`` (or a known alias)."""
    if os.path.exists(name):
        return False
    return "/" in name or name in HUB_ALIASES


# reference auto_model.py name aliases (tables in download/name_maps_from_hub)
HUB_ALIASES = {
    "paraformer-zh": "iic/speech_paraformer-large_asr_nat-zh-cn-16k-common-vocab8404-pytorch",
    "paraformer-zh-streaming": "iic/speech_paraformer-large_asr_nat-zh-cn-16k-common-vocab8404-online",
    "paraformer-en": "iic/speech_paraformer-large-vad-punc_asr_nat-en-16k-common-vocab10020",
    "conformer-en": "iic/speech_conformer_asr-en-16k-vocab4199-pytorch",
    "ct-punc": "iic/punc_ct-transformer_cn-en-common-vocab471067-large",
    "ct-punc-c": "iic/punc_ct-transformer_zh-cn-common-vocab272727-pytorch",
    "fsmn-vad": "iic/speech_fsmn_vad_zh-cn-16k-common-pytorch",
    "fa-zh": "iic/speech_timestamp_prediction-v1-16k-offline",
    "cam++": "iic/speech_campplus_sv_zh-cn_16k-common",
    "sensevoice": "iic/SenseVoiceSmall",
    "SenseVoiceSmall": "iic/SenseVoiceSmall",
    "whisper-large-v3": "iic/Whisper-large-v3",
    "emotion2vec_plus_large": "iic/emotion2vec_plus_large",
}


def download_model(
    model: str,
    hub: str = "ms",
    revision: Optional[str] = None,
    cache_dir: Optional[str] = None,
) -> str:
    """Resolve a hub model id to a local directory; returns the path."""
    model = HUB_ALIASES.get(model, model)
    if os.path.isdir(model):
        return model
    if hub == "hf":
        try:
            from huggingface_hub import snapshot_download
        except ImportError as e:
            raise RuntimeError(
                f"model {model!r} looks like a hub id but huggingface_hub "
                "is not installed; pass a local model directory instead"
            ) from e
        return snapshot_download(model, revision=revision,
                                 cache_dir=cache_dir)
    try:
        from modelscope.hub.snapshot_download import snapshot_download
    except ImportError as e:
        raise RuntimeError(
            f"model {model!r} looks like a ModelScope id but modelscope is "
            "not installed; pass a local model directory, or hub='hf'"
        ) from e
    return snapshot_download(model, revision=revision,
                             cache_dir=cache_dir)
