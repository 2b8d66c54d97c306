"""Import helper for the *reference* torch implementation at
/root/reference (read-only), used for logit-level parity tests.

The reference package drags in deps absent from this image (omegaconf,
hydra, kaldiio, torchaudio, ...); `load_reference()` registers minimal
package-aware stubs and imports the requested funasr module.  Behavior
only — nothing from the reference is executed at import beyond class
definitions.
"""

from __future__ import annotations

import sys
import types

REF_PATH = "/root/reference"


def _stub(name, **attrs):
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        # a real ModuleSpec: importlib.util.find_spec() on a stubbed name
        # (e.g. transformers probing librosa) raises ValueError when
        # __spec__ is None, poisoning later tests in the same process
        import importlib.machinery

        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    # register as attribute of parent package
    if "." in name:
        parent, child = name.rsplit(".", 1)
        if parent in sys.modules:
            setattr(sys.modules[parent], child, mod)
    return mod


class _AttrConf:
    """Minimal OmegaConf-like recursive attr/get container (enough for the
    reference emotion2vec cfg access patterns)."""

    def __init__(self, d):
        self._d = {k: _AttrConf(v) if isinstance(v, dict) else v
                   for k, v in d.items()}

    def __getattr__(self, k):
        if k.startswith("_"):
            raise AttributeError(k)
        try:
            return self._d[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def get(self, k, default=None):
        return self._d.get(k, default)

    def __contains__(self, k):
        return k in self._d


class _OmegaConfStub:
    @staticmethod
    def create(obj=None):
        return _AttrConf(dict(obj or {}))


def install_stubs():
    om = sys.modules.get("omegaconf")
    if om is None or not hasattr(om, "MISSING"):
        _stub("omegaconf", DictConfig=dict, ListConfig=list,
              OmegaConf=_OmegaConfStub, MISSING="???", II=lambda s: s)
    _stub("kaldiio")
    ta = _stub("torchaudio")
    ta.__path__ = []  # mark as package
    comp = _stub("torchaudio.compliance")
    comp.__path__ = []
    _stub("torchaudio.compliance.kaldi", fbank=None)
    _stub("librosa")
    _stub("soundfile")
    _stub("tqdm", tqdm=lambda x=None, **k: x)
    hy = _stub("hydra", main=lambda **k: (lambda f: f))
    hy.__path__ = []
    _stub("hydra.utils")
    core = _stub("hydra.core")
    core.__path__ = []
    _stub("hydra.core.config_store", ConfigStore=type(
        "ConfigStore", (), {"instance": classmethod(lambda c: c())}))
    _stub("requests")
    _stub("oss2")
    # legacy modelscope-era base classes the sond/sa_asr models import but
    # this reference tree no longer ships — minimal torch Module stand-ins
    import torch as _torch

    class _AbsModule(_torch.nn.Module):
        pass

    _stub("funasr.models.decoder.abs_decoder", AbsDecoder=_AbsModule)
    d = sys.modules["funasr.models.decoder.abs_decoder"]
    _stub("funasr.models.decoder", abs_decoder=d)
    _stub("funasr.models.encoder.abs_encoder", AbsEncoder=_AbsModule)
    e = sys.modules["funasr.models.encoder.abs_encoder"]
    _stub("funasr.models.encoder", abs_encoder=e)
    _stub("funasr.frontends.abs_frontend", AbsFrontend=_AbsModule)
    _stub("funasr.models.specaug.abs_specaug", AbsSpecAug=_AbsModule)
    _stub("funasr.models.specaug.abs_profileaug", AbsProfileAug=_AbsModule)
    _stub("funasr.layers.abs_normalize", AbsNormalize=_AbsModule)
    _stub("funasr.layers", abs_normalize=sys.modules[
        "funasr.layers.abs_normalize"])
    _stub("funasr.models.base_model", FunASRModel=_AbsModule)
    _stub("funasr.utils.hinter", hint_once=lambda *a, **k: None)


def load_reference(module: str):
    """Import e.g. 'funasr.models.sanm.encoder' from /root/reference."""
    install_stubs()
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    import importlib

    # legacy import paths some reference files use for modules that live
    # elsewhere in this tree (sond's pooling package)
    # `from funasr.models.ctc import CTC` (the package re-exports nothing
    # in this tree; the class lives in funasr.models.ctc.ctc)
    try:
        import funasr.models.ctc as _ctc_pkg  # noqa

        if not hasattr(_ctc_pkg, "CTC"):
            from funasr.models.ctc.ctc import CTC as _CTC

            _ctc_pkg.CTC = _CTC
    except Exception:
        pass
    if "funasr.models.encoder.encoder_layer_mfcca" not in sys.modules:
        try:  # legacy path for the mfcca layer module
            real = importlib.import_module(
                "funasr.models.mfcca.encoder_layer_mfcca")
            sys.modules["funasr.models.encoder.encoder_layer_mfcca"] = real
            if "funasr.models.encoder" in sys.modules:
                sys.modules["funasr.models.encoder"].encoder_layer_mfcca \
                    = real
        except Exception:
            pass
    if "funasr.models.pooling.statistic_pooling" not in sys.modules:
        try:
            real = importlib.import_module(
                "funasr.models.sond.pooling.statistic_pooling")
            _stub("funasr.models.pooling", statistic_pooling=real)
            sys.modules["funasr.models.pooling.statistic_pooling"] = real
        except Exception:
            pass
    return importlib.import_module(module)
