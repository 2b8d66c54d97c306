from funasr_tpu.text.itn import inverse_normalize  # noqa: F401
