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

import os as _os


def _honor_jax_platforms_env() -> None:
    """Re-apply the ``JAX_PLATFORMS`` env var through jax.config.

    Environments that preload jax via sitecustomize (e.g. a PJRT plugin
    registering itself with ``jax.config.update("jax_platforms", ...)``)
    clobber the standard env-var selection, so ``JAX_PLATFORMS=cpu
    funasr-tpu-train ...`` would silently run on the accelerator.  If the
    env var's primary platform disagrees with the current config, restore
    the env var's choice — a no-op in plain environments (config unset ->
    jax already follows the env)."""
    want = _os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    have = jax.config.jax_platforms
    if have and have.split(",")[0] != want.split(",")[0]:
        try:
            jax.config.update("jax_platforms", want)
        except RuntimeError:
            pass  # backend already initialized; too late to switch


_honor_jax_platforms_env()


def _default_compilation_cache() -> None:
    """Turn on jax's persistent compilation cache by default.

    A cold flagship-program compile is minutes; the persistent cache cuts
    a process restart to seconds (the reference's ONNX runtime gets this
    for free — sessions deserialize precompiled graphs).  Respects an
    explicit user setting: the standard JAX env var wins, and
    FUNASR_TPU_NO_COMP_CACHE=1 opts out entirely.
    """
    if _os.environ.get("FUNASR_TPU_NO_COMP_CACHE") == "1":
        return
    if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # user already chose a location
    import jax

    if jax.config.jax_compilation_cache_dir:
        return  # configured programmatically (e.g. by bench scripts)
    platforms = (jax.config.jax_platforms
                 or _os.environ.get("JAX_PLATFORMS") or "")
    if platforms.split(",")[0] != "tpu" and "axon" not in platforms:
        # only enable for explicitly-selected accelerator platforms:
        # XLA:CPU AOT cache entries pin host machine features and can
        # SIGILL across feature-detection differences, and an unset
        # platform string may auto-select CPU — CPU compiles are cheap
        # anyway, so default off unless we know we're on the accelerator
        return
    cache = _os.path.join(
        _os.environ.get("XDG_CACHE_HOME")
        or _os.path.join(_os.path.expanduser("~"), ".cache"),
        "funasr_tpu", "jax_cache")
    try:
        _os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except (OSError, RuntimeError):
        pass  # read-only home or locked config: run without the cache


_default_compilation_cache()

from funasr_tpu.registry import tables  # noqa: F401


def __getattr__(name):
    # Lazy import of the heavyweight user API so `import funasr_tpu` stays fast.
    if name == "AutoModel":
        from funasr_tpu.auto.auto_model import AutoModel

        return AutoModel
    raise AttributeError(f"module 'funasr_tpu' has no attribute {name!r}")
