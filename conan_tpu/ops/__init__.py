from conan_tpu.ops.conv import (  # noqa: F401
    causal_conv1d,
    causal_conv1d_step,
    causal_conv1d_state,
    conv1d,
    conv2d,
    conv_transpose1d,
    pixel_shuffle_1d,
    spectral_norm_weight,
    weight_norm_weight,
    weight_norm_init,
)
