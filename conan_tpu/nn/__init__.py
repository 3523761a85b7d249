from conan_tpu.nn import inits  # noqa: F401
