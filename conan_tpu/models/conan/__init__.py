from conan_tpu.models.conan.model import Conan, ConanConfig  # noqa: F401
