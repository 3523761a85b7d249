"""F0 normalization / quantization utilities.

JAX ports of `/root/reference/utils/audio/pitch/utils.py` (log-norm, coarse
bins) — in-place masked assignments become `jnp.where`. ``norm_interp_f0`` is
an offline numpy helper (used at binarization time, reference
`tasks/tts/dataset_utils.py`), kept in numpy.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

Array = jax.Array

F0_BIN = 256
F0_MAX = 900.0
F0_MIN = 50.0


def f0_to_coarse(f0_denorm: Array, f0_bin: int = F0_BIN, f0_max: float = F0_MAX,
                 f0_min: float = F0_MIN) -> Array:
    """Hz → [1, f0_bin-1] integer bins (reference `pitch/utils.py:17-28`)."""
    f0_mel_min = 1127 * np.log(1 + f0_min / 700)
    f0_mel_max = 1127 * np.log(1 + f0_max / 700)
    f0_mel = 1127 * jnp.log(1 + f0_denorm / 700)
    scaled = (f0_mel - f0_mel_min) * (f0_bin - 2) / (f0_mel_max - f0_mel_min) + 1
    f0_mel = jnp.where(f0_mel > 0, scaled, f0_mel)
    f0_mel = jnp.clip(f0_mel, 1, f0_bin - 1)
    return jnp.floor(f0_mel + 0.5).astype(jnp.int32)


def coarse_to_f0(f0_coarse: Array, f0_bin: int = F0_BIN, f0_max: float = F0_MAX,
                 f0_min: float = F0_MIN) -> Array:
    f0_mel_min = 1127 * np.log(1 + f0_min / 700)
    f0_mel_max = 1127 * np.log(1 + f0_max / 700)
    f0 = f0_mel_min + (f0_coarse - 1) * (f0_mel_max - f0_mel_min) / (f0_bin - 2)
    f0 = (jnp.exp(f0 / 1127) - 1) * 700
    return jnp.where(f0_coarse == 1, 0.0, f0)


def norm_f0(f0: Array, uv: Array | None) -> Array:
    """log2-normalize, zero unvoiced (reference `pitch/utils.py:42-51`)."""
    f0 = jnp.log2(f0 + 1e-8)
    if uv is not None:
        f0 = jnp.where(uv > 0, 0.0, f0)
    return f0


def denorm_f0(f0: Array, uv: Array | None, *, pitch_padding: Array | None = None,
              f0_min: float = 50.0, f0_max: float = 900.0) -> Array:
    """2**f0 then clamp, zero unvoiced/padded (reference `pitch/utils.py:73-84`)."""
    f0 = jnp.exp2(f0)
    f0 = jnp.clip(f0, f0_min, f0_max)
    if uv is not None:
        f0 = jnp.where(uv > 0, 0.0, f0)
    if pitch_padding is not None:
        f0 = jnp.where(pitch_padding, 0.0, f0)
    return f0


def norm_interp_f0_np(f0: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Offline: log-norm + linear interpolation through unvoiced gaps
    (reference `pitch/utils.py:54-70`). Returns (f0_normed, uv)."""
    uv = f0 == 0
    f0 = np.log2(f0 + 1e-8)
    f0[uv] = 0
    if uv.sum() == len(f0):
        f0[uv] = 0
    elif uv.sum() > 0:
        f0[uv] = np.interp(np.where(uv)[0], np.where(~uv)[0], f0[~uv])
    return f0.astype(np.float32), uv.astype(np.float32)
