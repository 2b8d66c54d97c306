"""Reference registry-name compatibility.

The reference registers many *names* that map onto a smaller set of
implementations here — size-parameterized Whisper entries
(whisper/model.py:20-40 registers "Whisper-tiny" ... "Whisper-large-v3"),
Qwen-Audio hub aliases (qwen_audio/model.py), distributed-sampler flavors
(datasets/audio_datasets/samplers.py:14-38 registry), dataloader entries
(datasets/dataloader_entry.py) and frontend names.  Registering those names
here means a reference ``config.yaml`` resolves unchanged.

Pure aliases only: every entry maps a reference name onto the funasr_tpu
class covering that behavior (sometimes via a partial that pins a config
field, e.g. the Whisper size).
"""

from __future__ import annotations

from funasr_tpu.registry import tables


def _alias(table: str, name: str, target_table: str, target: str, **pinned):
    cls = tables.get(target_table, target)
    if not pinned:
        tables.table(table).register(name, cls)
        return

    def factory(**conf):
        merged = dict(pinned)
        merged.update(conf)
        return cls(**merged)

    factory.__name__ = f"{target}[{name}]"
    tables.table(table).register(name, factory)


def install():
    # ---- Whisper checkpoint sizes (reference whisper/model.py:20-40)
    for size in ("tiny", "tiny.en", "base", "base.en", "small", "small.en",
                 "medium", "medium.en", "large-v1", "large-v2", "large-v3",
                 "large-v3-turbo"):
        _alias("model_classes", f"Whisper-{size}",
               "model_classes", "WhisperWrap", size=size)
    _alias("model_classes", "WhisperWarp", "model_classes", "WhisperWrap")
    _alias("model_classes", "OpenAIWhisperModel",
           "model_classes", "WhisperWrap")
    _alias("model_classes", "OpenAIWhisperLIDModel",
           "model_classes", "WhisperLID")

    # ---- Qwen-Audio hub aliases (reference qwen_audio/model.py)
    for name in ("Qwen-Audio", "Qwen/Qwen-Audio", "Qwen/QwenAudio",
                 "QwenAudioWarp", "QwenAudioChat", "Qwen-Audio-Chat",
                 "Qwen/Qwen-Audio-Chat", "Qwen/QwenAudioChat",
                 "QwenAudioChatWarp"):
        _alias("model_classes", name, "model_classes", "QwenAudio")

    # ---- LLM-ASR stack variants (reference llm_asr/model.py:27,348,829,
    # 847 differ only in which HF LLM/adaptor they instantiate; here the
    # LLM body and adaptor are config choices on one implementation)
    for name in ("LLMASR2", "LLMASR3", "LLMASR4"):
        _alias("model_classes", name, "model_classes", "LLMASR")

    # ---- distributed batch samplers (reference samplers.py:14-38): the
    # rank-sharded example/token-budget/buffer-sort behaviors are all
    # options of the bucketed sampler here
    _alias("batch_sampler_classes", "CustomDistributedBatchSampler",
           "batch_sampler_classes", "BatchSampler", batch_type="example")
    _alias("batch_sampler_classes", "CustomDistributedBufferBatchSampler",
           "batch_sampler_classes", "BatchSampler", batch_type="example")
    _alias("batch_sampler_classes", "CustomDistributedDynamicBatchSampler",
           "batch_sampler_classes", "DynamicBatchSampler")
    _alias("batch_sampler_classes",
           "CustomDistributedBufferDynamicBatchSampler",
           "batch_sampler_classes", "DynamicBatchSampler")
    _alias("batch_sampler_classes", "RankFullLocalShuffleBatchSampler",
           "batch_sampler_classes", "BatchSampler", batch_type="example")
    _alias("batch_sampler_classes", "RankFullLocalShuffleDynamicBatchSampler",
           "batch_sampler_classes", "DynamicBatchSampler")

    # ---- dataloaders (reference dataloader_entry.py)
    _alias("dataloader_classes", "DataloaderMapStyle",
           "dataloader_classes", "Dataloader")
    _alias("dataloader_classes", "DataloaderIterable",
           "dataloader_classes", "Dataloader")

    # ---- index datasets
    _alias("index_ds_classes", "IndexDSJsonlRankSplit",
           "index_ds_classes", "IndexDSJsonl")
    _alias("index_ds_classes", "OpenAIIndexDSJsonl",
           "index_ds_classes", "IndexDSJsonl")

    # ---- predictors: V1 CifPredictor shares the V2 integrate-and-fire
    # (reference cif_predictor.py:17 vs :173 — same alpha head and fire
    # rule; V2 adds the smooth/noise knobs, default-off)
    _alias("predictor_classes", "CifPredictor",
           "predictor_classes", "CifPredictorV2")

    # ---- frontends (reference frontend names in hub config.yaml)
    from funasr_tpu.auto.auto_model import FrontendConfig
    from funasr_tpu.frontends.streaming import StreamingFrontend

    ft = tables.table("frontend_classes")
    if "WavFrontend" not in ft:
        ft.register("WavFrontend", FrontendConfig)
        ft.register("wav_frontend", FrontendConfig)
        ft.register("WavFrontendOnline", StreamingFrontend)
    _alias("frontend_classes", "EspnetFrontend",
           "frontend_classes", "DefaultFrontend")


install()
