"""conan_tpu — a TPU-native (JAX/XLA/Pallas) chunkwise streaming voice-conversion
framework with the capabilities of the PyTorch reference "Conan" (ASRU 2025).

Built from scratch for TPU: static-shape compiled chunk steps, explicit streaming
state carried as pytrees, SPMD data parallelism over a `jax.sharding.Mesh`, and
Pallas kernels for the DSP hot paths.

Layer map (mirrors reference SURVEY.md §1, re-designed TPU-first):
  config       conan_tpu.config        typed frozen hparams, YAML inheritance
  ops          conan_tpu.ops           causal conv / stft / attention primitives
  nn           conan_tpu.nn            conv blocks, wavenet, transformer pieces
  models       conan_tpu.models        vocoder / emformer / conan acoustic model
  audio        conan_tpu.audio         mel frontends, pitch utils
  data         conan_tpu.data          indexed record store, batching, binarizer
  train        conan_tpu.train         trainer, tasks, optimizers, checkpointing
  parallel     conan_tpu.parallel      mesh + sharding helpers (DP over ICI/DCN)
  infer        conan_tpu.infer         streaming VC engine (compiled chunk step)
"""

__version__ = "0.1.0"


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: first TPU compiles cost ~15-500 s
    through the remote-compile tunnel; cached re-compiles take ~1 s across
    processes. Opt out with CONAN_TPU_NO_COMP_CACHE=1."""
    import os

    if os.environ.get("CONAN_TPU_NO_COMP_CACHE"):
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("CONAN_TPU_COMP_CACHE",
                                         os.path.expanduser("~/.cache/jax_comp_cache")))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()
