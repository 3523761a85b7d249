"""RMVPE pitch extractor — TPU-native port.

JAX reimplementation of `/root/reference/modules/pe/rmvpe/` (DeepUnet +
BiGRU E2E0 over a 128-bin htk log-mel; local-average cents decode; glitch
removal; curve resampling to the target hop). Used offline to precompute
``*_f0.npy`` files (reference `utils/extract_f0_rmvpe.py:21-342`).

Design notes:
  * inference-only here → BatchNorm uses stored running stats (functional);
  * the bidirectional GRU runs as two `lax.scan`s (time-major);
  * ``params_from_torch`` maps the published rmvpe checkpoint
    (``ckpt['model']`` state_dict) 1:1, including the vestigial TimbreFilter
    weights (created but unused in the reference forward, deepunet.py:149-172);
  * mel frontend = htk filterbank + centered STFT (win 1024, hop 160).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from conan_tpu import ops
from conan_tpu.ops.stft import mel_filterbank_np, stft_magnitude

Array = jax.Array

SAMPLE_RATE = 16000
N_CLASS = 360
N_MELS = 128
MEL_FMIN = 30
MEL_FMAX = 8000
WINDOW_LENGTH = 1024
CONST = 1997.3794084376191


def mel_spectrogram(audio: Array, hop_length: int = 160, clamp: float = 1e-5) -> Array:
    """[B, T] → [B, 128, frames] log-mel (spec.py MelSpectrogram, htk basis)."""
    basis = jnp.asarray(mel_filterbank_np(SAMPLE_RATE, WINDOW_LENGTH, N_MELS,
                                          MEL_FMIN, MEL_FMAX, htk=True))
    pad_left = WINDOW_LENGTH // 2
    pad_right = (WINDOW_LENGTH + 1) // 2
    audio = jnp.pad(audio, ((0, 0), (pad_left, pad_right)))
    mag = stft_magnitude(audio, n_fft=WINDOW_LENGTH, hop=hop_length,
                         center=False)  # [B, F, bins]
    mel = jnp.einsum("mf,btf->bmt", basis, mag, precision=lax.Precision.HIGHEST)
    return jnp.log(jnp.clip(mel, min=clamp))


# ---------------------------------------------------------------------------
# building blocks (channels-last NHWC; H=time, W=mel)
# ---------------------------------------------------------------------------

def _bn(x: Array, p: dict, eps: float = 1e-5) -> Array:
    """Eval-mode BatchNorm2d with running stats over the channel axis."""
    return ((x - p["mean"]) * lax.rsqrt(p["var"] + eps)) * p["scale"] + p["bias"]


def _conv_block_res(x: Array, p: dict) -> Array:
    h = ops.conv2d(x, p["c1"]["w"], None, padding=((1, 1), (1, 1)))
    h = jax.nn.relu(_bn(h, p["bn1"]))
    h = ops.conv2d(h, p["c2"]["w"], None, padding=((1, 1), (1, 1)))
    h = jax.nn.relu(_bn(h, p["bn2"]))
    if "shortcut" in p:
        return h + ops.conv2d(x, p["shortcut"]["w"], p["shortcut"]["b"])
    return h + x


def _avg_pool2d(x: Array, k: tuple[int, int]) -> Array:
    return lax.reduce_window(x, 0.0, lax.add, (1, k[0], k[1], 1),
                             (1, k[0], k[1], 1), "VALID") / (k[0] * k[1])


def _gru_cell(x_t: Array, h: Array, w_ih: Array, w_hh: Array, b_ih: Array,
              b_hh: Array) -> Array:
    """torch GRU cell semantics: gates ordered (r, z, n)."""
    gi = x_t @ w_ih.T + b_ih
    gh = h @ w_hh.T + b_hh
    H = h.shape[-1]
    r = jax.nn.sigmoid(gi[..., :H] + gh[..., :H])
    z = jax.nn.sigmoid(gi[..., H:2 * H] + gh[..., H:2 * H])
    n = jnp.tanh(gi[..., 2 * H:] + r * gh[..., 2 * H:])
    return (1.0 - z) * n + z * h


def _bigru(x: Array, p: dict, hidden: int = 256) -> Array:
    """[B, T, F] → [B, T, 2*hidden] (seq.py BiGRU, 1 layer)."""
    B = x.shape[0]
    h0 = jnp.zeros((B, hidden))

    def fwd(h, x_t):
        h = _gru_cell(x_t, h, p["w_ih"], p["w_hh"], p["b_ih"], p["b_hh"])
        return h, h

    def bwd(h, x_t):
        h = _gru_cell(x_t, h, p["w_ih_r"], p["w_hh_r"], p["b_ih_r"], p["b_hh_r"])
        return h, h

    xs = jnp.swapaxes(x, 0, 1)  # [T, B, F]
    _, hf = lax.scan(fwd, h0, xs)
    _, hb = lax.scan(bwd, h0, xs[::-1])
    out = jnp.concatenate([hf, hb[::-1]], axis=-1)
    return jnp.swapaxes(out, 0, 1)


@dataclasses.dataclass(frozen=True)
class RMVPEConfig:
    n_blocks: int = 4
    n_gru: int = 1
    kernel_size: tuple[int, int] = (2, 2)
    en_de_layers: int = 5
    inter_layers: int = 4
    in_channels: int = 1
    en_out_channels: int = 16


class E2E0:
    """DeepUnet0 + conv head + BiGRU + linear + sigmoid (model.py:8-32)."""

    def __init__(self, cfg: RMVPEConfig = RMVPEConfig()):
        self.cfg = cfg

    def apply(self, params: dict, mel: Array) -> Array:
        """mel [B, 128, T] → salience [B, T, 360]."""
        cfg = self.cfg
        x = jnp.swapaxes(mel, 1, 2)[..., None]  # [B, T, 128, 1] NHWC
        x = _bn(x, params["enc_bn"])
        concat = []
        for i in range(cfg.en_de_layers):
            lp = params[f"enc{i}"]
            for j in range(cfg.n_blocks):
                x = _conv_block_res(x, lp[f"b{j}"])
            concat.append(x)
            x = _avg_pool2d(x, cfg.kernel_size)
        for i in range(cfg.inter_layers):
            lp = params[f"inter{i}"]
            for j in range(cfg.n_blocks):
                x = _conv_block_res(x, lp[f"b{j}"])
        for i in range(cfg.en_de_layers):
            lp = params[f"dec{i}"]
            # ConvTranspose2d k3 s2 p1 op1 (deepunet.py:66-77), no bias —
            # expressed as an lhs-dilated conv with the flipped kernel
            # (exact torch semantics; see ops.conv_transpose1d)
            w = lp["up"]["w"]  # [in, out, kh, kw]
            w = jnp.flip(w, axis=(-1, -2))
            w = jnp.transpose(w, (2, 3, 0, 1))  # HWIO
            x = lax.conv_general_dilated(
                x, w, window_strides=(1, 1), padding=[(1, 2), (1, 2)],
                lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=lax.Precision.HIGHEST)
            x = jax.nn.relu(_bn(x, lp["up_bn"]))
            x = jnp.concatenate([x, concat[-1 - i]], axis=-1)
            for j in range(cfg.n_blocks):
                x = _conv_block_res(x, lp[f"b{j}"])
        x = ops.conv2d(x, params["cnn"]["w"], params["cnn"]["b"],
                       padding=((1, 1), (1, 1)))  # [B, T, 128, 3]
        B, T = x.shape[:2]
        # torch: .transpose(1,2).flatten(-2) on [B, 3, T, 128] → [B, T, 3*128]
        x = jnp.swapaxes(x, 2, 3).reshape(B, T, 3 * N_MELS)
        x = _bigru(x, params["gru"])
        x = x @ params["fc"]["w"].T + params["fc"]["b"]
        return jax.nn.sigmoid(x)

    # ------------------------------------------------------------- torch map
    def params_from_torch(self, sd: dict) -> dict:
        cfg = self.cfg

        def g(n):
            return jnp.asarray(np.asarray(sd[n]))

        def bn(prefix):
            return {"scale": g(f"{prefix}.weight"), "bias": g(f"{prefix}.bias"),
                    "mean": g(f"{prefix}.running_mean"), "var": g(f"{prefix}.running_var")}

        def cbr(prefix):
            p = {"c1": {"w": g(f"{prefix}.conv.0.weight")}, "bn1": bn(f"{prefix}.conv.1"),
                 "c2": {"w": g(f"{prefix}.conv.3.weight")}, "bn2": bn(f"{prefix}.conv.4")}
            if f"{prefix}.shortcut.weight" in sd:
                p["shortcut"] = {"w": g(f"{prefix}.shortcut.weight"),
                                 "b": g(f"{prefix}.shortcut.bias")}
            return p

        p: dict = {"enc_bn": bn("unet.encoder.bn")}
        for i in range(cfg.en_de_layers):
            p[f"enc{i}"] = {f"b{j}": cbr(f"unet.encoder.layers.{i}.conv.{j}")
                            for j in range(cfg.n_blocks)}
        for i in range(cfg.inter_layers):
            p[f"inter{i}"] = {f"b{j}": cbr(f"unet.intermediate.layers.{i}.conv.{j}")
                              for j in range(cfg.n_blocks)}
        for i in range(cfg.en_de_layers):
            base = f"unet.decoder.layers.{i}"
            p[f"dec{i}"] = {"up": {"w": g(f"{base}.conv1.0.weight")},
                            "up_bn": bn(f"{base}.conv1.1"),
                            **{f"b{j}": cbr(f"{base}.conv2.{j}")
                               for j in range(cfg.n_blocks)}}
        p["cnn"] = {"w": g("cnn.weight"), "b": g("cnn.bias")}
        p["gru"] = {"w_ih": g("fc.0.gru.weight_ih_l0"), "w_hh": g("fc.0.gru.weight_hh_l0"),
                    "b_ih": g("fc.0.gru.bias_ih_l0"), "b_hh": g("fc.0.gru.bias_hh_l0"),
                    "w_ih_r": g("fc.0.gru.weight_ih_l0_reverse"),
                    "w_hh_r": g("fc.0.gru.weight_hh_l0_reverse"),
                    "b_ih_r": g("fc.0.gru.bias_ih_l0_reverse"),
                    "b_hh_r": g("fc.0.gru.bias_hh_l0_reverse")}
        p["fc"] = {"w": g("fc.1.weight"), "b": g("fc.1.bias")}
        return p


# ---------------------------------------------------------------------------
# decode + postprocess (utils.py / inference.py)
# ---------------------------------------------------------------------------

def to_local_average_f0(hidden: np.ndarray, center: np.ndarray | None = None,
                        thred: float = 0.03) -> np.ndarray:
    """[B, T, 360] salience → [B, T] f0 Hz (utils.py:8-24).  ``center``
    [B, T, 1] overrides the argmax path (used by the Viterbi decoder)."""
    idx = np.arange(N_CLASS)[None, None, :]
    idx_cents = idx * 20 + CONST
    if center is None:
        center = np.argmax(hidden, axis=2, keepdims=True)
    start = np.clip(center - 4, 0, None)
    end = np.clip(center + 5, None, N_CLASS)
    mask = (idx >= start) & (idx < end)
    weights = hidden * mask
    product_sum = np.sum(weights * idx_cents, axis=2)
    weight_sum = np.sum(weights, axis=2)
    cents = product_sum / (weight_sum + (weight_sum == 0))
    f0 = 10 * 2 ** (cents / 1200)
    uv = hidden.max(axis=2) < thred
    return f0 * ~uv


def _viterbi(prob: np.ndarray, transition: np.ndarray) -> np.ndarray:
    """librosa.sequence.viterbi semantics: prob [S, T] observation
    likelihoods (columns need not be normalized), transition [S, S]
    row-stochastic, uniform initial distribution; returns the max-likelihood
    state path [T]."""
    S, T = prob.shape
    tiny = np.finfo(np.float64).tiny
    log_p = np.log(prob.astype(np.float64) + tiny)
    log_t = np.log(transition.astype(np.float64) + tiny)
    value = np.empty((T, S))
    ptr = np.empty((T, S), np.int64)
    value[0] = log_p[:, 0] + np.log(1.0 / S)
    for t in range(1, T):
        trans = value[t - 1][:, None] + log_t  # [S_prev, S]
        ptr[t] = np.argmax(trans, axis=0)
        value[t] = log_p[:, t] + trans[ptr[t], np.arange(S)]
    path = np.empty(T, np.int64)
    path[-1] = int(np.argmax(value[-1]))
    for t in range(T - 2, -1, -1):
        path[t] = ptr[t + 1][path[t + 1]]
    return path


def to_viterbi_f0(hidden: np.ndarray, thred: float = 0.03) -> np.ndarray:
    """[B, T, 360] salience → [B, T] f0 Hz via Viterbi smoothing of the bin
    path (utils.py:27-44: banded triangular transition of half-width 30,
    librosa.sequence.viterbi — reimplemented above since librosa is absent),
    then the same local-average cents refinement around the decoded path."""
    xx, yy = np.meshgrid(range(N_CLASS), range(N_CLASS))
    transition = np.maximum(30 - np.abs(xx - yy), 0).astype(np.float64)
    transition = transition / transition.sum(axis=1, keepdims=True)
    centers = []
    for b in range(hidden.shape[0]):
        prob = hidden[b].T  # [S, T]
        prob = prob / np.maximum(prob.sum(axis=0), 1e-20)
        centers.append(_viterbi(prob, transition))
    center = np.stack(centers)[:, :, None]
    return to_local_average_f0(hidden, center=center, thred=thred)


def postprocess_f0(f0: np.ndarray, fmin: float = 50, fmax: float = 1000,
                   min_gap: int = 2) -> np.ndarray:
    """Range clip + glitch removal (inference.py:46-59)."""
    f0 = f0.copy()
    f0[f0 < fmin] = 0
    f0[f0 > fmax] = 0
    for idx in range(f0.shape[0] - min_gap - 1):
        if (f0[idx] == 0 and f0[idx + min_gap + 1] == 0
                and np.sum(f0[idx: idx + min_gap + 2]) > 0):
            f0[idx: idx + min_gap + 2] = 0
    return f0


def resample_align_curve(points: np.ndarray, original_timestep: float,
                         target_timestep: float, align_length: int) -> np.ndarray:
    """(utils/audio/pitch_utils.py:92-104)."""
    t_max = (len(points) - 1) * original_timestep
    curve = np.interp(np.arange(0, t_max, target_timestep),
                      original_timestep * np.arange(len(points)),
                      points).astype(points.dtype)
    d = align_length - len(curve)
    if d < 0:
        curve = curve[:align_length]
    elif d > 0:
        curve = np.concatenate([curve, np.full(d, curve[-1])])
    return curve


class RMVPE:
    """End-to-end extractor (inference.py:16-156, minus CUDA/resample paths —
    inputs are 16 kHz here like the Conan data prep)."""

    def __init__(self, params: dict, hop_length: int = 160,
                 cfg: RMVPEConfig = RMVPEConfig()):
        self.model = E2E0(cfg)
        self.params = params
        self.hop_length = hop_length
        # params are an explicit jit argument (CLAUDE.md: closing over the
        # pytree would bake the DeepUnet+BiGRU weights in as constants)
        self._infer = jax.jit(self._infer_impl)

    @classmethod
    def from_torch_checkpoint(cls, path: str, hop_length: int = 160) -> "RMVPE":
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = {k: v.numpy() for k, v in ckpt["model"].items()}
        model = E2E0()
        return cls(model.params_from_torch(sd), hop_length)

    def _infer_impl(self, params: dict, audio: Array) -> Array:
        mel = mel_spectrogram(audio, self.hop_length)
        n = mel.shape[-1]
        pad = 32 * ((n - 1) // 32 + 1) - n
        mel = jnp.pad(mel, ((0, 0), (0, 0), (0, pad)))
        hidden = self.model.apply(params, mel)
        return hidden[:, :n]

    def infer_from_audio(self, audio: np.ndarray, thred: float = 0.03,
                         use_viterbi: bool = False) -> np.ndarray:
        if audio.ndim == 1:
            audio = audio[None]
        hidden = np.asarray(self._infer(self.params,
                                        jnp.asarray(audio.astype(np.float32))))
        decode = to_viterbi_f0 if use_viterbi else to_local_average_f0
        return decode(hidden, thred=thred)[0]

    def get_pitch(self, waveform: np.ndarray, sample_rate: int, hop_size: int,
                  length: int, fmin: float = 50, fmax: float = 1000,
                  use_viterbi: bool = False):
        assert sample_rate == SAMPLE_RATE, "resample offline first"
        f0 = postprocess_f0(self.infer_from_audio(waveform, use_viterbi=use_viterbi),
                            fmin, fmax)
        uv = f0 == 0
        ts = hop_size / sample_rate
        f0_res = resample_align_curve(f0, 0.01, ts, length)
        uv_res = resample_align_curve(uv.astype(np.float32), 0.01, ts, length) > 0.5
        f0_res[uv_res] = 0
        return f0_res, uv_res
