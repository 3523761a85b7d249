from conan_tpu.infer.streaming import StreamingVoiceConversion  # noqa: F401
