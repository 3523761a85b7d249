"""Training losses.

JAX equivalents of the reference's loss zoo, numerics-matched:
  mel L1/MSE/SSIM      `/root/reference/tasks/tts/speech_base.py:223-253`,
                       `/root/reference/utils/metrics/ssim.py`
  multi-res STFT       `/root/reference/modules/vocoder/hifigan/stft_loss.py`
  multi-res GAN mel    `hifigan_causal.py:533-545` + `mel_utils.py:99-120`
  LSGAN / feature      `hifigan_causal.py:494-531`
  distillation CE      `/root/reference/tasks/Emformer/Emformer.py:15-46`
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from conan_tpu.audio.mel import MelConfig, wav2mel_gan

Array = jax.Array

# Pinned at import: jit caches are not keyed on env vars, so a mid-process
# flip could silently keep the old traced path (ADVICE r2).
_USE_PALLAS_MEL = os.environ.get("CONAN_TPU_PALLAS_MEL") == "1"


def weights_nonzero_speech(target: Array) -> Array:
    """[B,T,M] → mask broadcast over mel bins where the frame isn't all-zero
    (speech_base.py: weights_nonzero_speech)."""
    dim = target.shape[-1]
    return (jnp.abs(target).sum(-1, keepdims=True) > 0).astype(target.dtype) * jnp.ones((1, 1, dim), target.dtype)


def mel_l1(pred: Array, target: Array) -> Array:
    w = weights_nonzero_speech(target)
    return jnp.sum(jnp.abs(pred - target) * w) / jnp.maximum(jnp.sum(w), 1.0)


def mel_mse(pred: Array, target: Array) -> Array:
    w = weights_nonzero_speech(target)
    return jnp.sum(jnp.square(pred - target) * w) / jnp.maximum(jnp.sum(w), 1.0)


@functools.lru_cache(maxsize=None)
def _ssim_gauss1d(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _blur1d(x: Array, g: np.ndarray, axis: int) -> Array:
    """Zero-padded 'same' 1-D correlation along ``axis`` as K shifted adds.

    The gaussian is separable (outer(g, g)), so the 2-D SSIM window is two of
    these.  A single-channel 11×11 `lax.conv` lowers pathologically on TPU
    (C_in=1 + spatial window — the same landmine as the old conv-DFT STFT);
    static shifted slices + adds are exact and fuse to elementwise code."""
    k = len(g)
    pad = k // 2
    widths = [(0, 0)] * x.ndim
    widths[axis] = (pad, pad)
    xp = jnp.pad(x, widths)
    out = None
    for i in range(k):
        sl = lax.slice_in_dim(xp, i, i + x.shape[axis], axis=axis)
        term = sl * float(g[i])
        out = term if out is None else out + term
    return out


def ssim(img1: Array, img2: Array, window_size: int = 11) -> Array:
    """SSIM map mean over (C,H,W) per batch element; img [B,1,H,W]
    (utils/metrics/ssim.py:24-45, size_average=False)."""
    g = _ssim_gauss1d(window_size)

    def f(x):
        return _blur1d(_blur1d(x, g, 2), g, 3)

    mu1, mu2 = f(img1), f(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = f(img1 * img1) - mu1_sq
    s2 = f(img2 * img2) - mu2_sq
    s12 = f(img1 * img2) - mu12
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu12 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return m.mean(axis=(1, 2, 3))  # [B] — mean over C then spatial = same


def mel_ssim(pred: Array, target: Array, bias: float = 6.0) -> Array:
    """speech_base.py:244-253: 1-SSIM on biased mels, frame-weighted."""
    w = weights_nonzero_speech(target)
    p = pred[:, None] + bias    # [B,1,T,M]
    t = target[:, None] + bias
    loss = 1.0 - ssim(p, t)     # [B]
    return jnp.sum(loss[:, None, None] * w) / jnp.maximum(jnp.sum(w), 1.0)


MEL_LOSSES = {"l1": mel_l1, "mse": mel_mse, "l2": mel_mse, "ssim": mel_ssim}


def parse_mel_losses(spec: str) -> dict[str, float]:
    """"l1:0.5|ssim:0.5" → {name: weight} (tasks/tts/tts_utils.py:20-33)."""
    out = {}
    for part in spec.split("|"):
        if ":" in part:
            name, w = part.split(":")
            out[name] = float(w)
        else:
            out[part] = 1.0
    return out


def add_mel_losses(pred: Array, target: Array, spec: str, losses: dict) -> None:
    for name, lam in parse_mel_losses(spec).items():
        losses[name] = MEL_LOSSES[name](pred, target) * lam


# ---------------------------------------------------------------------------
# STFT losses (vocoder)
# ---------------------------------------------------------------------------

def _stft_mag_clamped(x: Array, n_fft: int, hop: int, win: int) -> Array:
    """sqrt(clamp(re²+im², 1e-7)) — the clamp must sit UNDER the sqrt so the
    backward pass is finite at silent bins (stft_loss.py:31)."""
    from conan_tpu.ops.stft import stft_realimag

    ri = stft_realimag(x, n_fft=n_fft, hop=hop, win_length=win, center=True,
                       pad_mode="reflect")
    n_bins = n_fft // 2 + 1
    re, im = ri[..., :n_bins], ri[..., n_bins:]
    return jnp.sqrt(jnp.maximum(re * re + im * im, 1e-7))


def stft_loss_single(x: Array, y: Array, n_fft: int, hop: int, win: int):
    """(spectral convergence, log-magnitude L1) for pred x / target y [B,T]
    (stft_loss.py:34-99; torch.stft center=True reflect-pad default)."""
    xm = _stft_mag_clamped(x, n_fft, hop, win)
    ym = _stft_mag_clamped(y, n_fft, hop, win)
    sc = jnp.linalg.norm(ym - xm) / jnp.linalg.norm(ym)
    mag = jnp.mean(jnp.abs(jnp.log(ym) - jnp.log(xm)))
    return sc, mag


def multi_res_stft_loss(x: Array, y: Array,
                        fft_sizes=(512, 1024, 2048), hop_sizes=(160, 320, 640),
                        win_lengths=(512, 1024, 2048)):
    sc_total, mag_total = 0.0, 0.0
    for f, h, w in zip(fft_sizes, hop_sizes, win_lengths):
        sc, mag = stft_loss_single(x, y, f, h, w)
        sc_total += sc
        mag_total += mag
    n = len(fft_sizes)
    return sc_total / n, mag_total / n


def multi_res_gan_mel_loss(y: Array, y_hat: Array, sample_rate: int = 16000,
                           mel_bins: int = 320, fft_sizes=(512, 1024, 2048),
                           hop_sizes=(160, 160, 160), win_lengths=(512, 1024, 2048),
                           lambda_mel: float = 5.0) -> Array:
    """320-bin multi-resolution mel L1 (hifigan_causal.py mel_loss:533-545).

    On TPU the transform can run the fused Pallas forward with an analytic
    custom VJP (ops.pallas_stft.logmel_diff) — opt in with
    CONAN_TPU_PALLAS_MEL=1 (read ONCE at import into _USE_PALLAS_MEL; flipping
    it mid-process would not retrace already-jitted steps, so it is pinned).
    Default is the XLA framed-matmul path: since stft_realimag became a
    gather+matmul with an overlap-add VJP it times the same as the Pallas
    kernel inside the GAN step, and the fused kernel's [n_fft, 2·bins] basis
    at n_fft=2048 sits at the 16 MB scoped-VMEM edge — ablation programs
    around it OOM'd at compile (tools/DECOMPOSE.json notes)."""
    import jax as _jax

    use_pallas = _USE_PALLAS_MEL and _jax.default_backend() == "tpu"
    if use_pallas:
        from conan_tpu.ops.pallas_stft import pallas_wav2mel_gan_diff
    loss = 0.0
    for f, h, w in zip(fft_sizes, hop_sizes, win_lengths):
        cfg = MelConfig(sample_rate=sample_rate, n_fft=f, hop=h, win_length=w,
                        n_mels=mel_bins, fmin=0.0, fmax=sample_rate / 2)
        if use_pallas:
            ym = pallas_wav2mel_gan_diff(y, cfg)
            yhm = pallas_wav2mel_gan_diff(y_hat, cfg)
        else:
            ym = wav2mel_gan(y, cfg)
            yhm = wav2mel_gan(y_hat, cfg)
        loss += jnp.mean(jnp.abs(yhm - ym)) * lambda_mel
    return loss


# ---------------------------------------------------------------------------
# GAN losses (LSGAN, hifigan_causal.py:494-531)
# ---------------------------------------------------------------------------

def discriminator_loss(real_outs: list[Array], fake_outs: list[Array]):
    r = sum(jnp.mean(jnp.square(1.0 - d)) for d in real_outs) / len(real_outs)
    f = sum(jnp.mean(jnp.square(d)) for d in fake_outs) / len(fake_outs)
    return r, f


def generator_loss(fake_outs: list[Array]) -> Array:
    return sum(jnp.mean(jnp.square(1.0 - d)) for d in fake_outs) / len(fake_outs)


def cond_discriminator_loss(outs: list[Array]) -> Array:
    """Mismatched-conditioning negatives: every output is 'fake'
    (hifigan_causal.py:510-516)."""
    return sum(jnp.mean(jnp.square(d)) for d in outs) / len(outs)


def feature_loss(fmap_r: list, fmap_g: list) -> Array:
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss += jnp.mean(jnp.abs(rl - gl))
    return loss * 2.0


# ---------------------------------------------------------------------------
# Distillation CE (Emformer)
# ---------------------------------------------------------------------------

def distillation_loss(logits: Array, codes: Array, mask: Array,
                      temperature: float = 1.0) -> Array:
    """Masked mean CE over valid positions (Emformer.py:15-46)."""
    logp = jax.nn.log_softmax(logits / temperature, axis=-1)
    nll = -jnp.take_along_axis(logp, jnp.maximum(codes, 0)[..., None], axis=-1)[..., 0]
    m = mask.astype(logits.dtype)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def distillation_accuracy(logits: Array, codes: Array, mask: Array) -> Array:
    pred = jnp.argmax(logits, axis=-1)
    m = mask.astype(jnp.float32)
    return jnp.sum((pred == codes) * m) / jnp.maximum(jnp.sum(m), 1.0)


def masked_bce_with_logits(logits: Array, targets: Array, mask: Array,
                           lam: float = 1.0) -> Array:
    """uv loss (tasks/Conan/Conan.py:128-140)."""
    per = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0) * lam
