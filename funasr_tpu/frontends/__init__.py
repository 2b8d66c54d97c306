from funasr_tpu.frontends.streaming import StreamingFrontend  # noqa: F401
