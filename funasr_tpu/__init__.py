"""funasr_tpu — a TPU-native speech framework (JAX/XLA/Pallas/pjit).

A from-scratch re-design of the capabilities of FunASR (reference:
NiniAndy/FunASR) for TPU hardware:

- compute path: JAX + XLA + Pallas kernels, bf16 on the MXU, static shapes,
  device-resident decode loops (``lax.scan``/``lax.while_loop``),
- scaling: ``jax.sharding.Mesh`` + pjit/shard_map over ICI (data/model axes),
- runtime: Python orchestration over jitted device programs; native (C++)
  components where the hot path is host-side (audio decode / resample).

Public API mirrors the reference's user surface:

    from funasr_tpu import AutoModel
    model = AutoModel(model="paraformer", ...)
    result = model.generate(input="audio.wav")
"""

__version__ = "0.1.0"

from funasr_tpu.registry import tables  # noqa: F401


def __getattr__(name):
    # Lazy import of the heavyweight user API so `import funasr_tpu` stays fast.
    if name == "AutoModel":
        from funasr_tpu.auto.auto_model import AutoModel

        return AutoModel
    raise AttributeError(f"module 'funasr_tpu' has no attribute {name!r}")
