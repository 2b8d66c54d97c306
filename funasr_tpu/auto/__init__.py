from funasr_tpu.auto.auto_model import AutoModel  # noqa: F401
