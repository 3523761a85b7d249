from conan_tpu.models.vocoder.hifigan import HifiGanConfig, HifiGanGenerator  # noqa: F401
