"""Adaptive style encoder: prosody VQ (EMA) + style-to-content aligner.

TPU redesign of `/root/reference/modules/Conan/prosody_util.py`:

  * ``VQEmbeddingEMA`` (prosody_util.py:17-94): codebook/EMA buffers live in an
    explicit functional state pytree updated by the train step (psum-able
    across a data-parallel mesh via ``axis_name``); kmeans2 data-dependent
    init stays a host-side one-time call, like the reference.
  * ``ProsodyAligner`` (prosody_util.py:96-171): 2× cross-attention layers with
    scheduled hard-diagonal forcing and guided-attention loss — the forcing
    branch is traced alongside and selected with `jnp.where`, so ONE jitted
    train step serves all schedule phases (SURVEY.md §7 design delta).
  * ``LocalStyleAdaptor`` (prosody_util.py:173-200): WaveNet over the reference
    mel → group frames by 4 (segment mean) → ConvBlocks → VQ.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from conan_tpu.ops.precision import get_precision as _prec

from conan_tpu.nn import inits
from conan_tpu.nn.blocks import (ConvBlocks, MultiheadAttention, WaveNet, dropout,
                                 init_layer_norm, init_linear, layer_norm, linear)
from conan_tpu.nn.module import Params

Array = jax.Array


# ---------------------------------------------------------------------------
# EMA vector quantizer
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class VQConfig:
    n_embeddings: int = 512
    dim: int = 256
    commitment_cost: float = 0.25
    decay: float = 0.999
    epsilon: float = 1e-5


class VQEmbeddingEMA:
    def __init__(self, cfg: VQConfig):
        self.cfg = cfg

    def init_state(self, key) -> Params:
        bound = 1.0 / 512
        emb = inits.uniform(key, (self.cfg.n_embeddings, self.cfg.dim), -bound, bound)
        return {
            "embedding": emb,
            "ema_count": jnp.zeros((self.cfg.n_embeddings,)),
            "ema_weight": emb,
            "initialized": jnp.zeros((), jnp.float32),
        }

    def kmeans_init_host(self, state: Params, x_flat: np.ndarray, seed: int = 0) -> Params:
        """Host-side data-dependent init (prosody_util.py:56-65): kmeans2 over
        the first batch, then bootstrap EMA buffers from hard assignments."""
        from scipy.cluster.vq import kmeans2

        rng = np.random.default_rng(seed)
        x = np.asarray(x_flat, np.float64)
        x = x[rng.permutation(len(x))]
        centers, _ = kmeans2(x, self.cfg.n_embeddings, minit="points", seed=seed)
        emb = jnp.asarray(centers.astype(np.float32))
        d = (np.sum(centers ** 2, 1)[None, :] + np.sum(x ** 2, 1)[:, None]
             - 2.0 * x @ centers.T)
        idx = d.argmin(1)
        onehot = np.eye(self.cfg.n_embeddings)[idx]
        return {
            "embedding": emb,
            "ema_count": jnp.asarray(onehot.sum(0).astype(np.float32)),
            "ema_weight": jnp.asarray((onehot.T @ x).astype(np.float32)),
            "initialized": jnp.ones((), jnp.float32),
        }

    def encode(self, state: Params, x: Array) -> tuple[Array, Array]:
        """x: [B, T, D] → (quantized [B, T, D], indices [B, T])."""
        emb = state["embedding"]
        d = (jnp.sum(emb ** 2, 1)[None, None, :]
             + jnp.sum(x ** 2, -1, keepdims=True)
             - 2.0 * jnp.einsum("btd,nd->btn", x, emb,
                                precision=_prec()))
        idx = jnp.argmin(d, axis=-1)
        return emb[idx], idx

    def forward(self, state: Params, x: Array, *, train: bool,
                axis_name: str | None = None):
        """Returns (quantized_st, commit_loss, indices, perplexity, new_state).

        EMA buffer updates are fully traced (gated on ``initialized``); under
        data parallelism the assignment statistics are psum'd over
        ``axis_name`` so every replica applies the identical codebook update.
        """
        cfg = self.cfg
        q, idx = self.encode(state, x)
        onehot = jax.nn.one_hot(idx.reshape(-1), cfg.n_embeddings)  # [BT, M]
        counts = jnp.sum(onehot, axis=0)
        dw = jnp.einsum("bm,bd->md", onehot, x.reshape(-1, x.shape[-1]),
                        precision=_prec())
        n_frames = jnp.asarray(float(idx.size))
        if axis_name is not None:
            counts = jax.lax.psum(counts, axis_name)
            dw = jax.lax.psum(dw, axis_name)
            n_frames = jax.lax.psum(n_frames, axis_name)
        new_state = state
        if train:
            ema_count = cfg.decay * state["ema_count"] + (1 - cfg.decay) * counts
            n = jnp.sum(ema_count)
            ema_count = (ema_count + cfg.epsilon) / (n + cfg.n_embeddings * cfg.epsilon) * n
            ema_weight = cfg.decay * state["ema_weight"] + (1 - cfg.decay) * dw
            embedding = ema_weight / ema_count[:, None]
            init = state["initialized"]
            new_state = {
                "embedding": jnp.where(init > 0, embedding, state["embedding"]),
                "ema_count": jnp.where(init > 0, ema_count, state["ema_count"]),
                "ema_weight": jnp.where(init > 0, ema_weight, state["ema_weight"]),
                "initialized": jnp.ones((), jnp.float32),
            }
        # commitment loss, masked by nonpadding frames (prosody_util.py:83-86)
        nonpad = (jnp.sum(jnp.abs(x), -1) > 0).astype(x.dtype)
        e_latent = jnp.mean(jnp.square(x - jax.lax.stop_gradient(q)), -1)
        e_latent = jnp.sum(e_latent * nonpad) / jnp.maximum(jnp.sum(nonpad), 1.0)
        loss = cfg.commitment_cost * e_latent
        quantized = x + jax.lax.stop_gradient(q - x)
        avg_probs = counts / jnp.maximum(n_frames, 1.0)
        ppl = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))
        return quantized, loss, idx, ppl, new_state


# ---------------------------------------------------------------------------
# Style-to-content aligner
# ---------------------------------------------------------------------------

def guided_attention_mask(ilen: int, rilen: Array, olen: int, rolen: Array,
                          sigma: float = 0.3) -> Array:
    """1 - exp(-((y/olen - x/ilen)^2)/(2σ²)) (prosody_util.py:163-171).
    rilen/rolen: [B] valid lengths → [B, ilen, olen]."""
    gx = jnp.arange(ilen)[None, :, None]
    gy = jnp.arange(olen)[None, None, :]
    ril = rilen[:, None, None]
    rol = rolen[:, None, None]
    return 1.0 - jnp.exp(-jnp.square(gy / rol - gx / ril) / (2 * sigma ** 2))


class ProsodyAligner:
    """N× cross-attention (content queries × prosody keys) with guided-attn
    loss and a hard banded-diagonal forcing mode (prosody_util.py:96-161)."""

    def __init__(self, num_layers: int = 2, hidden: int = 256, nhead: int = 2,
                 ffn_dim: int = 2048, dropout_p: float = 0.1, guided_sigma: float = 0.3):
        self.n = num_layers
        self.hidden = hidden
        self.mha = MultiheadAttention(hidden, nhead, dropout_p)
        self.ffn_dim = ffn_dim
        self.p = dropout_p
        self.sigma = guided_sigma

    def init(self, key) -> Params:
        keys = iter(jax.random.split(key, 4 * self.n))
        layers = []
        for _ in range(self.n):
            layers.append({
                "attn": self.mha.init(next(keys)),
                "lin1": init_linear(next(keys), self.ffn_dim, self.hidden),
                "lin2": init_linear(next(keys), self.hidden, self.ffn_dim),
                "norm1": init_layer_norm(self.hidden),
                "norm2": init_layer_norm(self.hidden),
            })
        return {"layers": layers}

    def _forcing_attn(self, Tq: int, Tk: int, batch: int) -> Array:
        """Hard banded diagonal (prosody_util.py:110-119), static shapes."""
        k = Tk / Tq
        i = jnp.arange(Tq, dtype=jnp.float32)
        lengths1 = jnp.ceil(i * k) + 1
        lengths2 = jnp.floor(i * k) - 1
        cols = jnp.arange(Tk, dtype=jnp.float32)[None, :]
        mask1 = (cols < lengths1[:, None]).astype(jnp.float32)
        mask2 = (cols < lengths2[:, None]).astype(jnp.float32)
        return jnp.broadcast_to((mask1 - mask2)[None], (batch, Tq, Tk))

    def apply(self, params: Params, src: Array, prosody: Array,
              src_key_padding_mask: Array | None, pros_key_padding_mask: Array | None,
              *, forcing: Array | bool, rng=None, train: bool = False):
        """src: [B, Tq, H] content; prosody: [B, Tk, H].
        ``forcing`` may be a traced bool — both branches are computed and
        selected, keeping one compiled train step across schedule phases.
        Returns (output [B, Tq, H], guided_loss, attn_list)."""
        B, Tq, H = src.shape
        Tk = prosody.shape[1]
        guided_loss = 0.0
        attn_list = []
        forcing_attn = self._forcing_attn(Tq, Tk, B)
        out = src
        for lp in params["layers"]:
            if rng is not None:
                rng, r1, r2, r3 = jax.random.split(rng, 4)
            else:
                r1 = r2 = r3 = None
            soft_out, soft_attn = self.mha.apply(lp["attn"], out, prosody, prosody,
                                                 pros_key_padding_mask, rng=r1, train=train)
            forced_out = jnp.einsum("bqk,bkh->bqh", forcing_attn, prosody,
                                    precision=_prec())
            is_forcing = jnp.asarray(forcing)
            src2 = jnp.where(is_forcing, forced_out, soft_out)
            attn = jnp.where(is_forcing, forcing_attn, soft_attn)
            attn_list.append(attn)
            out = out + dropout(src2, self.p, r2, train)
            out = layer_norm(out, lp["norm1"])
            h = linear(jax.nn.relu(linear(out, lp["lin1"])), lp["lin2"])
            out = out + dropout(h, self.p, r3, train)
            out = layer_norm(out, lp["norm2"])
            if src_key_padding_mask is not None and pros_key_padding_mask is not None:
                s_len = jnp.sum(1.0 - src_key_padding_mask.astype(jnp.float32), -1)
                e_len = jnp.sum(1.0 - pros_key_padding_mask.astype(jnp.float32), -1)
                w = guided_attention_mask(Tq, s_len, Tk, e_len, self.sigma)
                nonpad = ((~src_key_padding_mask)[:, :, None]
                          & (~pros_key_padding_mask)[:, None, :])
                g = jnp.sum(attn * w * nonpad) / jnp.maximum(jnp.sum(nonpad), 1)
                guided_loss = guided_loss + g
        return out, guided_loss, attn_list


# ---------------------------------------------------------------------------
# Local style adaptor (WaveNet → group-by-4 → ConvBlocks → VQ)
# ---------------------------------------------------------------------------

def group_by_segments(h: Array, group: int) -> Array:
    """Mean over consecutive groups of ``group`` frames with a ragged tail
    (reference group_hidden_by_segs with ids arange(T)//4+1,
    `utils/nn/seq_utils.py:307`, driver `Conan.py:224-230`): the last group
    averages over its actual count, like the reference's scatter-count mean."""
    B, T, D = h.shape
    n_groups = -(-T // group)
    pad = n_groups * group - T
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
    sums = h.reshape(B, n_groups, group, D).sum(axis=2)
    counts = np.full((n_groups,), group, np.float32)
    if pad:
        counts[-1] = group - pad
    return sums / jnp.asarray(counts)[None, :, None]


class LocalStyleAdaptor:
    def __init__(self, hidden: int = 256, n_vq: int = 512, vae_dropout: float = 0.0,
                 lambda_commit: float = 0.25):
        self.hidden = hidden
        self.wavenet = WaveNet(80, kernel_size=3, dilation_rate=1, n_layers=4)
        self.encoder = ConvBlocks(80, hidden, [1] * 5, 5, dropout=vae_dropout)
        self.vq = VQEmbeddingEMA(VQConfig(n_vq, hidden, commitment_cost=lambda_commit))

    def init(self, key) -> Params:
        k1, k2 = jax.random.split(key)
        return {"wavenet": self.wavenet.init(k1), "encoder": self.encoder.init(k2)}

    def init_vq_state(self, key) -> Params:
        return self.vq.init_state(key)

    def pre_vq(self, params: Params, ref_mels: Array, *, rng=None,
               train: bool = False) -> Array:
        """ref mel [B, T, 80] → prosody features [B, T//4, hidden] (no VQ)."""
        pad_mask = ref_mels[:, :, 0] == 0.0  # prosody_util.py:189 padding_idx=0
        nonpad = (~pad_mask)[..., None].astype(ref_mels.dtype)
        h = self.wavenet.apply(params["wavenet"], ref_mels, nonpad)
        h = group_by_segments(h, 4)
        return self.encoder.apply(params["encoder"], h, rng=rng, train=train)

    def apply(self, params: Params, vq_state: Params, ref_mels: Array, *,
              use_vq: Array | bool, train: bool = False, rng=None,
              axis_name: str | None = None):
        """Returns (prosody [B, T//4, H], vq_loss, ppl, new_vq_state).

        ``use_vq`` gates the quantization (vq_start schedule / infer); traced
        branch-free so one compiled step covers both phases."""
        prosody = self.pre_vq(params, ref_mels, rng=rng, train=train)
        q, vq_loss, _idx, ppl, new_state = self.vq.forward(
            vq_state, prosody, train=train, axis_name=axis_name)
        use = jnp.asarray(use_vq)
        out = jnp.where(use, q, prosody)
        vq_loss = jnp.where(use, vq_loss, 0.0)
        new_state = jax.tree.map(
            lambda new, old: jnp.where(use, new, old), new_state, vq_state)
        return out, vq_loss, ppl, new_state
