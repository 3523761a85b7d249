from conan_tpu.audio.mel import MelConfig, wav2mel_gan, wav2mel_librosa  # noqa: F401
