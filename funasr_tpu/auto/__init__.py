from funasr_tpu.auto.auto_model import AutoModel  # noqa: F401


def AutoFrontend(model=None, **kwargs):
    """Standalone frontend builder (reference funasr/auto/auto_frontend.py):
    resolves a model config and returns its FrontendConfig."""
    from funasr_tpu.auto.auto_model import _build_frontend, _resolve_cfg

    cfg = _resolve_cfg(model, kwargs or None)
    return _build_frontend(cfg)


def AutoTokenizer(model=None, **kwargs):
    """Standalone tokenizer builder (reference funasr/auto tokenizer
    helper)."""
    from funasr_tpu.auto.auto_model import _build_tokenizer, _resolve_cfg

    cfg = _resolve_cfg(model, None)
    cfg.update(kwargs)
    return _build_tokenizer(cfg)
