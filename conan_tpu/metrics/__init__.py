from conan_tpu.metrics.eval_metrics import (  # noqa: F401
    accelerated_dtw,
    diagonal_focus_rate,
    focus_rate,
    laplace_var,
    mel_ssim_metric,
    phone_coverage_rate,
    pitch_dtw_distance,
)
