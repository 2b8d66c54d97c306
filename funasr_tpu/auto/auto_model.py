"""AutoModel: the user-facing pipeline API (reference
funasr/auto/auto_model.py:111).

Builds up to four models from configs (main ASR + VAD + punctuation +
speaker) and exposes ``generate()``:

- plain batched inference when no VAD model is attached (auto_model.py:308),
- the long-audio pipeline otherwise (auto_model.py:378
  ``inference_with_vad``): VAD segmentation -> merge short segments -> sort
  segments by length -> greedy second-budget batching (``batch_size_s``) ->
  batched ASR -> restore order, stitch text and offset timestamps ->
  punctuation -> sentence_info.

Model resolution: ``model`` may be a model directory (config.yaml +
model.npz), a YAML path, or a config dict.  Weights load from ``init_param``
(.npz of flax leaves or torch-layout names run through funasr_tpu.convert);
absent weights mean random init (testing).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp

from funasr_tpu.auto.engines import (
    FrontendConfig,
    ParaformerEngine,
    PuncEngine,
    SenseVoiceEngine,
    VadEngine,
)
from funasr_tpu.config import load_config
from funasr_tpu.ops.fbank import load_cmvn_file
from funasr_tpu.registry import tables
from funasr_tpu.utils.audio import load_audio
from funasr_tpu.utils.timestamp_tools import timestamp_sentence
from funasr_tpu.utils.vad_utils import merge_vad, slice_audio_by_segments


def _resolve_cfg(model: Union[str, Dict, None], conf: Optional[Dict]) -> Dict:
    if isinstance(model, dict):
        cfg = dict(model)
    elif isinstance(model, str) and (os.path.isdir(model) or os.path.isfile(model)):
        cfg = load_config(model)
    elif isinstance(model, str):
        from funasr_tpu.download import download_model, is_hub_id

        if is_hub_id(model):  # hub id / alias -> local snapshot dir
            cfg = load_config(
                download_model(model, hub=(conf or {}).get("hub", "ms")))
        else:
            cfg = {"model": model}
    else:
        cfg = {}
    if conf:
        from funasr_tpu.config import deep_update

        deep_update(cfg, conf)  # ++key.path=value merges, not replaces
    return cfg


def _load_params(cfg: Dict) -> Optional[Dict]:
    path = cfg.get("init_param")
    if not path and cfg.get("model_path"):
        cand = os.path.join(cfg["model_path"], "model.npz")
        path = cand if os.path.exists(cand) else None
    if not path:
        return None
    data = dict(np.load(path, allow_pickle=False))
    if any("." in k for k in data):  # torch-layout names
        from funasr_tpu.convert import convert_from_torch

        return convert_from_torch(data, arch=cfg.get("arch", "auto"))
    # flat flax tree with '/'-joined keys
    tree: Dict[str, Any] = {}
    for k, v in data.items():
        node = tree
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def _build_tokenizer(cfg: Dict):
    name = cfg.get("tokenizer", "CharTokenizer")
    conf = dict(cfg.get("tokenizer_conf") or {})
    if "token_list" in cfg and "token_list" not in conf:
        conf["token_list"] = cfg["token_list"]
    return tables.get("tokenizer_classes", name)(**conf)


def _build_frontend(cfg: Dict) -> FrontendConfig:
    conf = dict(cfg.get("frontend_conf") or {})
    cmvn = None
    cmvn_file = conf.pop("cmvn_file", None) or cfg.get("cmvn_file")
    if cmvn_file and os.path.exists(cmvn_file):
        cmvn = load_cmvn_file(cmvn_file)
    return FrontendConfig(cmvn=cmvn, **conf)


class AutoModel:
    def __init__(
        self,
        model: Union[str, Dict, None] = None,
        model_conf: Optional[Dict] = None,
        vad_model: Union[str, Dict, None] = None,
        vad_conf: Optional[Dict] = None,
        punc_model: Union[str, Dict, None] = None,
        punc_conf: Optional[Dict] = None,
        spk_model: Union[str, Dict, None] = None,
        spk_conf: Optional[Dict] = None,
        seed: int = 0,
        quantize: bool = False,
        data_parallel: bool = False,
        sequence_parallel: int = 0,
        tensor_parallel: int = 0,
        device_mesh=None,
        **kwargs,
    ):
        self.kwargs = kwargs
        self.rng = jax.random.PRNGKey(seed)
        # int8 dynamic quantization on the MXU (reference funasr_onnx
        # `quantize=True` loads the onnxruntime dynamic-quant int8 model,
        # runtime/docs/benchmark_onnx_cpp.md:69-81).  Per-model: generate()
        # scopes the trace-time switch (ops/quant.py) so two AutoModels
        # with different `quantize` in one process don't leak into each
        # other's engine traces.  quantize=False follows the process
        # default (quant.enable), it does not force-disable it.
        self._quantize = bool(quantize)
        # data-parallel serving (SURVEY §7.13): shard the decode batch over
        # every visible device (or a caller-provided mesh with a "data"
        # axis).  Single-device meshes are a no-op.
        self.mesh = device_mesh
        if data_parallel and (int(tensor_parallel or 0) > 1
                              or int(sequence_parallel or 0) > 1):
            # tp/sp build their mesh over jax.devices()[:N] while the dp
            # mesh spans ALL devices; combining them would place params
            # and the dp-sharded batch on different device sets and fail
            # deep inside jit — surface it as a config error instead.
            raise ValueError(
                "data_parallel=True cannot be combined with "
                "tensor_parallel/sequence_parallel; pick one layout "
                "(or pass an explicit device_mesh)")
        if data_parallel and self.mesh is None and len(jax.devices()) > 1:
            from funasr_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh(model=1)
        # sequence-parallel serving: one utterance's FRAME axis sharded
        # over N chips (ring attention + halo FSMN + sharded CIF/decoder,
        # parallel/sp_*.py) — the long-audio path when a single chip's
        # HBM can't hold the encoder state.  Paraformer-family greedy only.
        self._sp = int(sequence_parallel or 0)
        self._tp = int(tensor_parallel or 0)
        self.engine = None
        self.vad_engine = None
        self.punc_engine = None
        self.spk_engine = None
        self.main_cfg: Dict = {}
        if model is not None:
            self.main_cfg = _resolve_cfg(model, model_conf)
            self.engine = self._build_main(self.main_cfg)
            if self._tp > 1 and hasattr(self.engine, "params"):
                # tensor-parallel serving (SURVEY §2.5 TPU plan: big
                # encoders sharded over ICI): params are laid out over a
                # (1, N) model-axis mesh and GSPMD splits every matmul;
                # batch stays replicated, results are bit-compatible.
                from funasr_tpu.parallel.mesh import (make_mesh,
                                                      param_shardings)

                if len(jax.devices()) < self._tp:
                    raise ValueError(
                        f"tensor_parallel={self._tp} needs that many "
                        f"devices, have {len(jax.devices())}")
                tp_mesh = make_mesh(data=1, model=self._tp,
                                    devices=jax.devices()[:self._tp])
                self.engine.params = jax.device_put(
                    self.engine.params,
                    param_shardings(self.engine.params, tp_mesh))
        if vad_model is not None:
            self.vad_engine = self._build_vad(_resolve_cfg(vad_model, vad_conf))
        if punc_model is not None:
            self.punc_engine = self._build_punc(_resolve_cfg(punc_model, punc_conf))
        if spk_model is not None:
            self.spk_engine = self._build_spk(_resolve_cfg(spk_model, spk_conf))

    # ------------------------------------------------------------- builders
    def _build_main(self, cfg: Dict):
        name = cfg.get("model", "Paraformer")
        if name in ("CTTransformer", "CTTransformerStreaming"):
            # punctuation as the MAIN model: reference
            # AutoModel(model="ct-punc").generate(input=<text>)
            # (funasr/auto/auto_model.py builds the punc model like any
            # other main model; inference takes text)
            return self._build_punc(cfg)
        cls = tables.get("model_classes", name)
        tokenizer = _build_tokenizer(cfg)
        frontend = _build_frontend(cfg)
        vocab = cfg.get("vocab_size") or tokenizer.get_vocab_size()
        input_size = cfg.get("input_size", frontend.n_mels * frontend.lfr_m)
        common = dict(
            vocab_size=vocab, input_size=input_size,
            encoder_conf=cfg.get("encoder_conf"),
        )
        # serving compute dtype from config ("dtype: bfloat16" — the
        # reference's fp16/bf16 cast at auto_model.py:284-287; params stay
        # fp32, fp32 layernorm/softmax inside the models)
        if cfg.get("dtype") in ("bfloat16", "bf16"):
            common["dtype"] = jnp.bfloat16
        elif cfg.get("dtype") in ("float32", "fp32", None):
            pass
        else:
            raise ValueError(f"unsupported dtype {cfg.get('dtype')!r}")
        if name in ("BiCifParaformer", "SeacoParaformer",
                    "ContextualParaformer"):
            from funasr_tpu.auto.engines import BiCifEngine, HotwordEngine

            kw = dict(
                decoder_conf=cfg.get("decoder_conf"),
                predictor_conf=cfg.get("predictor_conf"),
            )
            if cfg.get("decoder"):  # keep the class default otherwise
                kw["decoder_name"] = cfg["decoder"]
            if cfg.get("encoder"):
                kw["encoder_name"] = cfg["encoder"]
            module = cls(**kw, **common, **(cfg.get("model_conf") or {}))
            params = _load_params(cfg)
            if params is None:
                T = 32
                if name == "BiCifParaformer":
                    params = module.init(
                        {"params": self.rng},
                        jnp.zeros((1, T, input_size)), jnp.array([T]),
                        max_tokens=8, method=module.timestamps,
                    )
                else:  # hotword heads need the bias branch initialized
                    hw = jnp.asarray(
                        [[getattr(module, "no_bias_id", 1)]], jnp.int32)
                    params = module.init(
                        {"params": self.rng},
                        jnp.zeros((1, T, input_size)), jnp.array([T]),
                        hw, jnp.array([1]), max_tokens=8,
                        method=module.decode_with_hotwords,
                    )
            if name == "BiCifParaformer":
                return BiCifEngine(module, params, frontend, tokenizer,
                                   blank_id=module.blank_id, mesh=self.mesh)
            return HotwordEngine(module, params, frontend, tokenizer,
                                 blank_id=module.blank_id, mesh=self.mesh,
                                 seaco=(name == "SeacoParaformer"))
        if name == "SCAMA":
            # AR chunk-aware model since r4 (real FsmnDecoderSCAMAOpt):
            # serve through the beam engine, init via the training call
            from funasr_tpu.auto.engines import HybridEngine

            module = cls(
                decoder_conf=cfg.get("decoder_conf"),
                predictor_conf=cfg.get("predictor_conf"),
                encoder_name=cfg.get("encoder"),
                **common, **(cfg.get("model_conf") or {}),
            )
            params = _load_params(cfg)
            if params is None:
                T = 32
                params = module.init(
                    {"params": self.rng, "dropout": self.rng},
                    jnp.zeros((1, T, input_size)), jnp.array([T]),
                    jnp.zeros((1, 4), jnp.int32), jnp.array([4]),
                    deterministic=True,
                )
            dec_cfg = cfg.get("decoding_conf") or {}
            return HybridEngine(module, params, frontend, tokenizer,
                                beam=dec_cfg.get("beam_size", 5),
                                maxlen=dec_cfg.get("maxlenratio_tokens", 96),
                                decoding_ctc_weight=dec_cfg.get(
                                    "decoding_ctc_weight", 0.0))
        if name in ("Paraformer", "EParaformer"):
            # same NAR contract (SCAMA/EParaformer subclass Paraformer);
            # EParaformer's PIF predictor has no cif peaks -> timestamps
            # come from the BiCif family instead
            module = cls(
                encoder_name=cfg.get("encoder"),
                decoder_name=cfg.get("decoder"),
                decoder_conf=cfg.get("decoder_conf"),
                predictor_conf=cfg.get("predictor_conf"),
                **common, **(cfg.get("model_conf") or {}),
            )
            params = _load_params(cfg)
            if params is None:
                T = 32
                params = module.init(
                    {"params": self.rng},
                    jnp.zeros((1, T, input_size)), jnp.array([T]),
                    max_tokens=8, method=module.greedy_decode,
                )
            sp_conf = None
            if self._sp > 1 and name == "Paraformer":
                sp_conf = dict(
                    n=self._sp,
                    enc_conf=dict(cfg.get("encoder_conf") or {}),
                    dec_conf=dict(cfg.get("decoder_conf") or {}),
                    pred_conf=dict(cfg.get("predictor_conf") or {}),
                )
            return ParaformerEngine(module, params, frontend, tokenizer,
                                    blank_id=module.blank_id,
                                    mesh=self.mesh, sp_conf=sp_conf)
        if name == "SenseVoiceSmall":
            module = cls(**common, **(cfg.get("model_conf") or {}))
            params = _load_params(cfg)
            if params is None:
                T = 32
                params = module.init(
                    {"params": self.rng},
                    jnp.zeros((1, T, input_size)), jnp.array([T]),
                    jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
                    method=module.greedy_decode,
                )
            return SenseVoiceEngine(module, params, frontend, tokenizer,
                                    mesh=self.mesh)
        if name in ("Conformer", "Transformer", "SANM", "Branchformer",
                    "EBranchformer"):
            from funasr_tpu.auto.engines import HybridEngine

            kw = {}
            if name in ("Conformer", "Transformer", "SANM") \
                    and cfg.get("encoder"):
                kw["encoder_name"] = cfg["encoder"]
            module = cls(
                decoder=cfg.get("decoder", "TransformerDecoder"),
                decoder_conf=cfg.get("decoder_conf"),
                **common, **(cfg.get("model_conf") or {}), **kw,
            )
            params = _load_params(cfg)
            if params is None:
                T = 32
                params = module.init(
                    {"params": self.rng, "dropout": self.rng},
                    jnp.zeros((1, T, input_size)), jnp.array([T]),
                    jnp.zeros((1, 4), jnp.int32), jnp.array([4]),
                    deterministic=True,
                )
            dec_cfg = cfg.get("decoding_conf") or {}
            return HybridEngine(module, params, frontend, tokenizer,
                                beam=dec_cfg.get("beam_size", 10),
                                maxlen=dec_cfg.get("maxlenratio_tokens", 96),
                                decoding_ctc_weight=dec_cfg.get(
                                    "decoding_ctc_weight", 0.3))
        if name in ("Transducer", "BAT", "RWKVBAT"):
            from funasr_tpu.auto.engines import TransducerEngine

            module = cls(
                decoder_conf=cfg.get("decoder_conf"),
                joint_conf=cfg.get("joint_conf"),
                **common, **(cfg.get("model_conf") or {}),
            )
            params = _load_params(cfg)
            if params is None:
                T = 32
                params = module.init(
                    {"params": self.rng, "dropout": self.rng},
                    jnp.zeros((1, T, input_size)), jnp.array([T]),
                    jnp.zeros((1, 4), jnp.int32), jnp.array([4]),
                    deterministic=True,
                )
            return TransducerEngine(module, params, frontend, tokenizer)
        if name == "Emotion2vec":
            model = cls(**(cfg.get("model_conf") or {}))
            params = _load_params(cfg)
            if params is not None:
                model.params = params
            else:
                model.init_params(self.rng)

            class SerEngine:
                def __init__(self, model):
                    self.model = model

                def transcribe(self, wavs, **kw):
                    res = self.model.generate(
                        wavs, extract_embedding=kw.get("extract_embedding",
                                                       False))
                    for r in res:
                        best = int(np.argmax(r["scores"]))
                        r["text"] = r["labels"][best]
                    return res

            return SerEngine(model)
        if name in ("Whisper", "WhisperWrap", "WhisperLID"):
            from funasr_tpu.auto.engines import WhisperEngine

            module = cls(size=cfg.get("size", "tiny"),
                         model_path=cfg.get("model_path_hf"),
                         config_overrides=cfg.get("config_overrides", {}))
            tok = None
            if cfg.get("tokenizer") or cfg.get("tokenizer_conf"):
                tok = _build_tokenizer(cfg)
            return WhisperEngine(module, tok,
                                 max_tokens=cfg.get("max_tokens", 64))
        if name == "FsmnVADStreaming":
            # standalone VAD as the main model (reference supports
            # AutoModel(model="fsmn-vad").generate -> segment lists)
            return self._build_vad(cfg)
        raise KeyError(f"no engine for model class {name!r}")

    def _build_vad(self, cfg: Dict):
        cls = tables.get("model_classes", cfg.get("model", "FsmnVADStreaming"))
        model = cls(
            encoder=cfg.get("encoder", "FSMN"),
            encoder_conf=cfg.get("encoder_conf"),
            **(cfg.get("model_conf") or {}),
        )
        frontend = _build_frontend(cfg)
        params = _load_params(cfg)
        if params is not None:
            model.params = params
        else:
            model.init_params(self.rng, frontend.n_mels * frontend.lfr_m)
        return VadEngine(model, frontend)

    def _build_punc(self, cfg: Dict):
        tokenizer = _build_tokenizer(cfg)
        cls = tables.get("model_classes", cfg.get("model", "CTTransformer"))
        model = cls(
            vocab_size=cfg.get("vocab_size") or tokenizer.get_vocab_size(),
            punc_list=cfg.get("punc_list", ("<unk>", "_", "，", "。", "？", "、")),
            embed_unit=cfg.get("embed_unit", 256),
            att_unit=cfg.get("att_unit", 256),
            encoder_conf=cfg.get("encoder_conf"),
            # serving (quantize=True) runs the punc encoder in bf16
            # compute (fp32 layernorm/softmax per house convention);
            # int8 row-quant stays off for these tiny matmuls — measured
            # pure loss (CLAUDE.md punc note), but bf16 halves the HBM
            # traffic of the fp path at no dispatch cost
            dtype=cfg.get("dtype",
                          "bfloat16" if self._quantize else "float32"),
        )
        params = _load_params(cfg)
        if params is not None:
            model.params = params
        else:
            model.init_params(self.rng)
        return PuncEngine(model, tokenizer)

    def _build_spk(self, cfg: Dict):
        from funasr_tpu.auto.engines import SpkEngine

        cls = tables.get("model_classes", cfg.get("model", "CAMPPlus"))
        model = cls(**(cfg.get("model_conf") or {}))
        variables = _load_params(cfg)
        if variables is None:
            n_mels = getattr(model, "feat_dim", 80)
            variables = model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 150, n_mels)))
        return SpkEngine(model, variables,
                         n_mels=getattr(model, "feat_dim", 80))

    # ------------------------------------------------------------ generate
    def generate(self, input, fs: int = 16000, key: Optional[List[str]] = None,
                 batch_size: int = 16, output_dir: Optional[str] = None,
                 **kwargs):
        if self._quantize:
            from funasr_tpu.ops import quant

            if not quant.enabled():
                with quant.quantized(True):
                    return self.generate(input, fs=fs, key=key,
                                         batch_size=batch_size,
                                         output_dir=output_dir, **kwargs)
        # fs describes RAW inputs (ndarray / pcm bytes), reference
        # load_utils.py:48 audio_fs semantics; every waveform is resampled
        # to the frontend's rate, which is what all downstream frame math
        # (25ms/10ms windows, VAD ms timeline) assumes.
        if hasattr(self.engine, "punctuate"):
            # text-in/text-out main model (ct-punc): input is a transcript
            # or a list of transcripts, reference auto_model.py punc path
            texts = [input] if isinstance(input, str) else list(input)
            keys = key or [f"punc{i}" for i in range(len(texts))]
            results = []
            for k, t in zip(keys, texts):
                out = self.engine.punctuate(t, **kwargs)
                res = {"key": k}
                res.update(out if isinstance(out, dict) else {"text": out})
                results.append(res)
            if output_dir:
                self._write_results(results, output_dir)
            return results
        target_fs = 16000
        for eng in (self.engine, self.vad_engine):
            fe = getattr(eng, "frontend", None)
            if fe is not None:
                target_fs = fe.fs
                break
        wavs, keys = self._prepare_inputs(input, target_fs, key, audio_fs=fs)
        fs = target_fs
        if self.engine is None and self.vad_engine is not None:
            # vad_model given without a main model: behave like standalone
            # VAD (segment lists), instead of crashing on engine=None
            results = self.vad_engine.transcribe(wavs)
            for r, k in zip(results, keys):
                r["key"] = k
            if output_dir:
                self._write_results(results, output_dir)
            return results
        if self.vad_engine is not None and self.engine is not None:
            results = [
                self._inference_with_vad(w, k, fs=fs, **kwargs)
                for w, k in zip(wavs, keys)
            ]
        else:
            use_itn = kwargs.pop("use_itn", False)
            itn_lang = kwargs.pop("language", "zh")
            # SenseVoice handles text-norm natively via its prompt token
            if getattr(self.engine, "handles_itn", False):
                kwargs["use_itn"] = use_itn
                use_itn = False
            results = []
            for i in range(0, len(wavs), batch_size):
                chunk = wavs[i : i + batch_size]
                res = self.engine.transcribe(chunk, **kwargs)
                for j, r in enumerate(res):
                    r["key"] = keys[i + j]
                    if use_itn and r.get("text"):
                        from funasr_tpu.text.itn import inverse_normalize

                        r["text"] = inverse_normalize(r["text"], itn_lang)
                    results.append(r)
        if output_dir:
            self._write_results(results, output_dir)
        return results

    # ------------------------------------------------------------- export
    def warmup(self, batch_sizes=(1,), seconds=(15,), fs: int = 16000):
        """Pre-compile the decode programs for a bucket grid.

        A cold jit of the flagship offline program takes minutes (and even
        a persistent-cache load takes seconds) — unacceptable mid-session.
        The reference's C++ server pays its model-load cost entirely at
        startup (funasr-wss-server.cpp loads and initializes all ONNX
        sessions before accepting connections); this is the TPU analogue:
        compile every engine's program for the bucket grid so live traffic
        only ever hits warm programs.

        Each engine warms DIRECTLY (not through ``generate``): with a
        vad_model attached, silence produces zero segments and the VAD
        pipeline would return before ever touching the ASR program.
        """
        import numpy as np

        for b in batch_sizes:
            for s in seconds:
                wavs = [np.zeros(int(s * fs), np.float32)] * int(b)
                if self.engine is not None and hasattr(self.engine,
                                                       "transcribe"):
                    self.engine.transcribe(wavs)
                if self.vad_engine is not None:
                    self.vad_engine.transcribe(wavs)
        if self.punc_engine is not None:
            self.punc_engine.punctuate("warmup")
        if self.spk_engine is not None and hasattr(self.spk_engine,
                                                   "embed"):
            try:
                self.spk_engine.embed(
                    [np.zeros(int(seconds[0] * fs), np.float32)])
            except Exception:  # noqa: BLE001 — warmup is best-effort
                pass

    def export(self, output_dir: str, batch_sizes=(1, 8), seconds=(15,),
               platforms=None) -> Dict:
        """Export the main engine as a StableHLO servable bundle (reference
        auto_model.py:675 ``export`` produces ONNX; here the artifact is an
        AOT-compiled jax.export program per (batch, seconds) bucket plus
        model.npz + config.yaml — see funasr_tpu/auto/export.py)."""
        from funasr_tpu.auto.export import export_engine

        if self.engine is None or not hasattr(self.engine, "decode_fn"):
            raise ValueError("export needs a main model with an export "
                             "surface (Paraformer/SenseVoice/Hybrid/"
                             "Transducer engines)")
        cfg = {k: v for k, v in self.main_cfg.items()
               if isinstance(v, (str, int, float, bool, list, dict))}
        return export_engine(self.engine, output_dir,
                             batch_sizes=batch_sizes, seconds=seconds,
                             platforms=platforms, config=cfg)

    @staticmethod
    def _write_results(results: List[Dict], output_dir: str):
        """Kaldi-style output dir (reference auto_model.py writes through
        DatadirWriter: 1best_recog/{text,token,timestamp})."""
        from funasr_tpu.utils.datadir_writer import DatadirWriter

        writer = DatadirWriter(output_dir)
        ibest = writer["1best_recog"]
        for r in results:
            k = r.get("key", "")
            ibest["text"][k] = r.get("text", "")
            if r.get("raw_tokens"):
                ibest["token"][k] = " ".join(map(str, r["raw_tokens"]))
            if r.get("timestamp"):
                ibest["timestamp"][k] = str(r["timestamp"])
        writer.close()

    def _prepare_inputs(self, input, fs, key, audio_fs=None):
        items = input if isinstance(input, (list, tuple)) else [input]
        # expand list files / URLs (reference load_utils.py:48
        # load_audio_text_image_video: wav/pcm/bytes/url/scp/jsonl)
        expanded, keys, tmp_files = [], [], []
        for i, x in enumerate(items):
            if isinstance(x, str) and x.endswith(".scp"):
                with open(x, encoding="utf-8") as f:
                    for line in f:
                        parts = line.strip().split(maxsplit=1)
                        if len(parts) == 2:
                            keys.append(parts[0])
                            expanded.append(parts[1])
                continue
            if isinstance(x, str) and x.endswith(".jsonl"):
                import json as _json

                with open(x, encoding="utf-8") as f:
                    for line in f:
                        if not line.strip():
                            continue
                        rec = _json.loads(line)
                        src = rec.get("source") or rec.get("wav")
                        if src is None:
                            raise ValueError(
                                f"jsonl record without 'source'/'wav': "
                                f"{line.strip()[:120]}")
                        keys.append(rec.get("key", f"utt_{len(keys)}"))
                        expanded.append(src)
                continue
            if isinstance(x, str) and x.startswith(("http://", "https://")):
                import tempfile
                import urllib.request

                suffix = os.path.splitext(x.split("?")[0])[1] or ".wav"
                tmp = tempfile.NamedTemporaryFile(suffix=suffix, delete=False)
                with urllib.request.urlopen(x) as r:
                    tmp.write(r.read())
                tmp.close()
                keys.append(os.path.splitext(os.path.basename(
                    x.split("?")[0]))[0])
                expanded.append(tmp.name)
                tmp_files.append(tmp.name)
                continue
            keys.append(
                os.path.splitext(os.path.basename(x))[0]
                if isinstance(x, str) else f"rand_key_{i}")
            expanded.append(x)
        try:
            wavs = [load_audio(x, fs=fs, audio_fs=audio_fs)
                    for x in expanded]
        finally:
            for t in tmp_files:   # downloaded URLs: no temp-file leak
                try:
                    os.unlink(t)
                except OSError:
                    pass
        if key is not None:
            if len(key) != len(expanded):
                raise ValueError(
                    f"got {len(key)} keys for {len(expanded)} inputs "
                    f"(scp/jsonl inputs expand; omit `key` to use theirs)")
            return wavs, key
        return wavs, keys

    # ----------------------------------------------- long audio pipeline
    def _inference_with_vad(
        self, wav: np.ndarray, key: str,
        batch_size_s: int = 300,
        merge_length_s: int = 15,
        with_timestamp: bool = True,
        fs: int = 16000,
        **kwargs,
    ) -> Dict[str, Any]:
        use_itn = kwargs.pop("use_itn", False)
        itn_lang = kwargs.pop("language", "zh")

        # shared frontend: fbank is computed ONCE over the whole recording
        # inside the VAD program and the ASR stage gathers per-segment
        # frames from that grid (bit-identical to fbank-of-slice — see
        # engines.FrontendConfig.raw_fbank).  Eligible when the main
        # engine decodes from fbank and both frontends share the mel
        # settings; hotword calls keep the waveform path (their program
        # signature carries the hotword grids).
        afe = getattr(self.engine, "frontend", None)
        vfe = self.vad_engine.frontend
        shared = (hasattr(self.engine, "transcribe_from_fbank_async")
                  and not os.environ.get(
                      "FUNASR_TPU_DISABLE_SHARED_FRONTEND")
                  and "hotword" not in kwargs
                  and afe is not None
                  and afe.fs == vfe.fs and afe.n_mels == vfe.n_mels
                  and afe.window == vfe.window
                  and afe.use_pallas == vfe.use_pallas)
        raw_fbank = total_frames = None
        if shared:
            segments, raw_fbank, total_frames = \
                self.vad_engine.segments_shared(wav)
        else:
            segments = self.vad_engine.segments(wav)
        segments = merge_vad(segments, merge_length_s * 1000)
        if not segments:
            return {"key": key, "text": ""}
        # raw audio clips are only needed off the shared path and for the
        # speaker branch (1.5 s sv chunks slice waveforms)
        clips = None
        if not shared or self.spk_engine is not None:
            clips = slice_audio_by_segments(wav, segments, fs)
        seg_len = [int((e - s) * (fs // 1000)) for s, e in segments]

        # sort by length desc, greedy batch under the seconds budget
        order = sorted(range(len(seg_len)), key=lambda i: -seg_len[i])
        budget = batch_size_s * fs
        batches: List[List[int]] = []
        cur: List[int] = []
        cur_max = 0
        for i in order:
            m = max(cur_max, seg_len[i])
            if cur and m * (len(cur) + 1) > budget:
                batches.append(cur)
                cur, cur_max = [], 0
                m = seg_len[i]
            cur.append(i)
            cur_max = m
        if cur:
            batches.append(cur)

        # speaker branch: sliding 1.5 s chunks per VAD segment -> embeddings
        # (reference auto_model.py:467-483); clustered after ASR below.
        spk_chunks: List[List] = []
        if self.spk_engine is not None:
            from funasr_tpu.models.campplus.cluster import sv_chunk

            for (start_ms, end_ms), clip in zip(segments, clips):
                spk_chunks.extend(
                    sv_chunk([start_ms / 1000.0, end_ms / 1000.0, clip],
                             fs=fs))

        # dispatch EVERY batch's device program before fetching any result:
        # jax's async dispatch queues them back-to-back, so the host-side
        # detokenize/timestamp assembly of batch k overlaps the device
        # compute of batch k+1 (the r3 pipeline serialized them —
        # BENCH_PIPELINE asr_host ran on top of asr_device wall time)
        seg_results: Dict[int, Dict] = {}
        pending = []
        for batch in batches:
            args = dict(
                with_timestamp=with_timestamp,
                vad_offsets=[segments[i][0] for i in batch]
                if with_timestamp else None,
                **kwargs,
            )
            if shared:
                pending.append((batch, self.engine.transcribe_from_fbank_async(
                    raw_fbank, [segments[i] for i in batch],
                    total_frames=total_frames,
                    **args)))
                continue
            clips_b = [clips[i] for i in batch]
            afn = getattr(self.engine, "transcribe_async", None)
            if afn is not None:
                pending.append((batch, afn(clips_b, **args)))
            else:
                pending.append(
                    (batch, (lambda c=clips_b, a=args:
                             self.engine.transcribe(c, **a))))
        for batch, finalize in pending:
            for i, r in zip(batch, finalize()):
                seg_results[i] = r

        texts, all_ts, all_tokens = [], [], []
        for i in range(len(segments)):
            r = seg_results.get(i, {})
            if r.get("text"):
                texts.append(r["text"])
            all_ts.extend(r.get("timestamp", []))
            all_tokens.extend(r.get("raw_tokens", []))
        from funasr_tpu.utils.postprocess import join_segment_texts

        text = join_segment_texts(texts)

        result: Dict[str, Any] = {"key": key, "text": text}
        if with_timestamp:
            result["timestamp"] = all_ts

        do_itn = use_itn or self.kwargs.get("use_itn")
        punc_mode = kwargs.get("punc_mode", "segment")
        seg_punc = (self.punc_engine is not None and text
                    and punc_mode == "segment")
        if do_itn and not seg_punc:
            # the segment-punc branch ITNs per segment itself; a joined
            # pass here would be immediately overwritten (wasted work)
            from funasr_tpu.text.itn import inverse_normalize

            text = inverse_normalize(text, itn_lang)
            result["text"] = text

        # punc_mode "segment" (default): each VAD segment is its own punc
        # context — window wi of every segment scored in ONE batched device
        # call per round (CTTransformerModel.inference_batch), matching the
        # reference ONLINE servers' per-sentence-segment punctuation
        # (runtime/websocket/websocket-server-2pass.cpp punc_cache per
        # segment).  "joint" reproduces the reference OFFLINE python path
        # exactly: one sequential window chain over the whole joined text
        # (funasr/auto/auto_model.py:540).  The two differ only where a
        # sentence straddles a VAD silence boundary — pass
        # generate(punc_mode="joint") for reference-offline-exact output
        # (documented in docs/USAGE.md "Long-audio pipeline").
        punc_out = None
        if seg_punc:
            seg_texts = texts
            if do_itn:
                from funasr_tpu.text.itn import inverse_normalize

                seg_texts = [inverse_normalize(t, itn_lang) for t in texts]
            outs = self.punc_engine.model.inference_batch(
                seg_texts, self.punc_engine.tokenizer)
            punc_out = {
                "text": join_segment_texts([o["text"] for o in outs]),
                "punc_array": np.concatenate(
                    [o["punc_array"] for o in outs])
                if outs else np.zeros((0,), np.int64),
            }
            result["text"] = punc_out["text"]
        elif self.punc_engine is not None and text:
            punc_out = self.punc_engine.punctuate(text)
            result["text"] = punc_out["text"]
        if punc_out is not None:
            if with_timestamp:
                punc_array = punc_out["punc_array"]
                if len(all_tokens) != len(punc_array):
                    # The reference always emits sentence_info on this path
                    # (funasr/auto/auto_model.py:551-633) — never drop it
                    # silently.  Best-effort align to the common prefix.
                    import logging

                    logging.warning(
                        "punc/token length mismatch (%d tokens vs %d punc "
                        "labels) for key=%s; sentence_info aligned to the "
                        "common prefix", len(all_tokens), len(punc_array), key,
                    )
                    n = min(len(all_tokens), len(punc_array))
                    if n and punc_array[n - 1] <= 1:
                        punc_array = list(punc_array[:n])
                        punc_array[n - 1] = 2  # force a sentence close (。)
                    else:
                        punc_array = punc_array[:n]
                    all_tokens_a, all_ts_a = all_tokens[:n], all_ts[:n]
                else:
                    all_tokens_a, all_ts_a = all_tokens, all_ts
                result["sentence_info"] = timestamp_sentence(
                    punc_array, all_ts_a, all_tokens_a,
                    punc_list=self.punc_engine.model.punc_list,
                )

        if self.spk_engine is not None and spk_chunks:
            from funasr_tpu.models.campplus.cluster import (
                ClusterBackend,
                distribute_spk,
            )

            emb = self.spk_engine.embed([c[2] for c in spk_chunks])
            labels = ClusterBackend()(
                emb, oracle_num=kwargs.get("preset_spk_num"))
            sd_segments = [
                [int(c[0] * 1000), int(c[1] * 1000), int(l)]
                for c, l in zip(spk_chunks, labels)
            ]
            result["spk_info"] = sd_segments
            if "sentence_info" in result:
                result["sentence_info"] = distribute_spk(
                    result["sentence_info"], sd_segments)
        return result
