"""NN building blocks for the Conan acoustic model.

TPU-native (channels-last, functional, dropout via explicit rng) equivalents of
`/root/reference/modules/commons/{conv.py,wavenet.py,layers.py,
nar_tts_modules.py,transformer.py}`:

  ConvBlocks / CausalConvBlocks   conv.py:84-264
  WN / CausalWN (WaveNet)         wavenet.py:14-230
  PitchPredictor                  nar_tts_modules.py:105-147 (causal convs)
  SinusoidalPositionalEmbedding   transformer.py:13-72 (fairseq style)
  Embedding / Linear / LayerNorm  layers.py:44-60
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from conan_tpu.ops.precision import get_precision as _prec

from conan_tpu import ops
from conan_tpu.nn import inits
from conan_tpu.nn.module import Params, Stream

Array = jax.Array


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def layer_norm(x: Array, p: Params, eps: float = 1e-5) -> Array:
    """LN over the channel (last) axis — equals the reference LayerNorm(dim=1)
    on channels-first tensors (layers.py:5-24)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def init_layer_norm(dim: int) -> Params:
    return {"scale": inits.ones((dim,)), "bias": inits.zeros((dim,))}


def linear(x: Array, p: Params) -> Array:
    y = jnp.matmul(x, p["w"].T, precision=_prec())
    if "b" in p:
        y = y + p["b"]
    return y


def init_linear(key, out_dim: int, in_dim: int, *, init: str = "torch", bias: bool = True) -> Params:
    kw, kb = jax.random.split(key)
    if init == "torch":
        w = inits.kaiming_uniform(kw, (out_dim, in_dim))
    elif init == "xavier":  # reference layers.py Linear
        w = inits.xavier_uniform(kw, (out_dim, in_dim))
    else:
        raise ValueError(init)
    p = {"w": w}
    if bias:
        p["b"] = (inits.default_bias(kb, (out_dim,), (out_dim, in_dim))
                  if init == "torch" else inits.zeros((out_dim,)))
    return p


def embedding(ids: Array, p: Params) -> Array:
    return p["w"][ids]


def init_embedding(key, num: int, dim: int, padding_idx: int | None = None,
                   *, std: float | None = None) -> Params:
    """Reference Embedding (layers.py:44-52): N(0, dim^-0.5), pad row zeroed.
    torch nn.Embedding default (std=1) selected with std=1.0."""
    std = dim ** -0.5 if std is None else std
    w = inits.normal(key, (num, dim), std=std)
    if padding_idx is not None:
        w = w.at[padding_idx].set(0.0)
    return {"w": w}


def dropout(x: Array, rate: float, rng, train: bool) -> Array:
    if not train or rate == 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def gelu(x: Array) -> Array:
    # torch nn.GELU default = exact erf formulation
    return jax.nn.gelu(x, approximate=False)


ACTS = {"gelu": gelu, "relu": jax.nn.relu,
        "leakyrelu": lambda x: jax.nn.leaky_relu(x, 0.01),
        "swish": jax.nn.silu, None: lambda x: x}


def init_conv(key, out_ch: int, in_ch: int, k: int, *, init: str = "torch",
              bias: bool = True) -> Params:
    kw, kb = jax.random.split(key)
    shape = (out_ch, in_ch, k)
    if init == "torch":
        w = inits.kaiming_uniform(kw, shape)
    elif init == "xavier":  # reference init_weights_func (conv.py:18-21)
        w = inits.xavier_uniform(kw, shape)
    elif init == "kaiming_relu":
        w = inits.kaiming_normal(kw, shape, "relu")
    else:
        raise ValueError(init)
    p = {"w": w}
    if bias:
        p["b"] = inits.default_bias(kb, (out_ch,), shape)
    return p


def nonpadding_mask(x: Array) -> Array:
    """[B,T,C] → [B,T,1] float mask of frames with any nonzero channel
    (reference convention, conv.py:74)."""
    return (jnp.sum(jnp.abs(x), axis=-1, keepdims=True) > 0).astype(x.dtype)


# ---------------------------------------------------------------------------
# ConvBlocks / CausalConvBlocks (conv.py:49-264)
# ---------------------------------------------------------------------------

class ConvBlocks:
    """Stack of residual conv blocks + last norm + post-net conv.

    ``causal=True`` reproduces CausalConvBlocks (left-padded convs) and
    supports streaming via the Stream context; ``causal=False`` is the
    symmetric-padding variant used for the reference-utterance encoders
    (those see the whole reference up-front, so no streaming needed).
    """

    def __init__(self, hidden_size: int, out_dims: int, dilations, kernel_size: int,
                 *, norm_type: str = "ln", layers_in_block: int = 2, c_multiple: int = 2,
                 dropout: float = 0.0, ln_eps: float = 1e-5, num_layers: int | None = None,
                 post_net_kernel: int = 3, act_type: str = "gelu", causal: bool = False):
        if num_layers is not None:
            dilations = [1] * num_layers
        self.hidden = hidden_size
        self.out_dims = out_dims
        self.dilations = tuple(dilations)
        self.k = kernel_size
        self.norm_type = norm_type
        self.n = layers_in_block
        self.cm = c_multiple
        self.dropout = dropout
        self.ln_eps = ln_eps
        self.post_k = post_net_kernel
        self.act = ACTS[act_type]
        self.causal = causal
        assert norm_type in ("ln", "none"), "only ln/none norms are on the Conan path"

    def init(self, key) -> Params:
        H, cm = self.hidden, self.cm
        n_convs = len(self.dilations) * self.n * 2 + 1
        keys = iter(jax.random.split(key, n_convs + 8))
        blocks = []
        for _d in self.dilations:
            sub = []
            for _ in range(self.n):
                sub.append({
                    "norm": init_layer_norm(H) if self.norm_type == "ln" else {},
                    "conv1": init_conv(next(keys), cm * H, H, self.k, init="xavier"),
                    "conv2": init_conv(next(keys), H, cm * H, 1, init="xavier"),
                })
            blocks.append(sub)
        return {
            "blocks": blocks,
            "last_norm": init_layer_norm(H) if self.norm_type == "ln" else {},
            "post": init_conv(next(keys), self.out_dims, H, self.post_k, init="xavier"),
        }

    def _conv(self, s: Stream, path: str, x: Array, p: Params, dilation: int) -> Array:
        if self.causal:
            if s.streaming:
                y, carry = ops.causal_conv1d_step(x, s.state[path], p["w"], p["b"],
                                                  dilation=dilation)
                s.new_state[path] = carry
                return y
            return ops.causal_conv1d(x, p["w"], p["b"], dilation=dilation)
        k = p["w"].shape[-1]
        pad = (dilation * (k - 1)) // 2
        return ops.conv1d(x, p["w"], p["b"], dilation=dilation, padding=(pad, pad))

    def apply(self, params: Params, x: Array, nonpadding: Array | None = None,
              *, stream: Stream | None = None, rng=None, train: bool = False) -> Array:
        """x: [B, T, H] → [B, T, out_dims]."""
        s = stream or Stream(None)
        if nonpadding is None:
            if s.streaming:
                nonpadding = jnp.ones_like(x[..., :1])
            else:
                nonpadding = nonpadding_mask(x)
        for bi, (d, block) in enumerate(zip(self.dilations, params["blocks"])):
            for ni, sub in enumerate(block):
                h = layer_norm(x, sub["norm"], self.ln_eps) if self.norm_type == "ln" else x
                h = self._conv(s, f"b{bi}.{ni}.c1", h, sub["conv1"], d)
                h = h * (self.k ** -0.5)
                h = self.act(h)
                h = ops.conv1d(h, sub["conv2"]["w"], sub["conv2"]["b"])
                if self.dropout > 0 and train and rng is not None:
                    rng, sub_rng = jax.random.split(rng)
                    h = dropout(h, self.dropout, sub_rng, train)
                x = (x + h) * nonpadding
        if self.norm_type == "ln":
            x = layer_norm(x, params["last_norm"], self.ln_eps) * nonpadding
        x = self._conv(s, "post", x, params["post"], 1) * nonpadding
        return x

    def init_state(self, batch: int, dtype=jnp.float32) -> dict:
        assert self.causal
        st = {}
        for bi, d in enumerate(self.dilations):
            for ni in range(self.n):
                st[f"b{bi}.{ni}.c1"] = ops.causal_conv1d_state(batch, self.hidden, self.k, d, dtype)
        st["post"] = ops.causal_conv1d_state(batch, self.hidden, self.post_k, 1, dtype)
        return st


# ---------------------------------------------------------------------------
# WaveNet (wavenet.py WN / CausalWN)
# ---------------------------------------------------------------------------

class WaveNet:
    """Gated WaveNet stack; ``causal=True`` = CausalWN (left-padded weight-norm
    convs), else WN (symmetric padding)."""

    def __init__(self, hidden_size: int, kernel_size: int, dilation_rate: int,
                 n_layers: int, *, c_cond: int = 0, causal: bool = False):
        assert kernel_size % 2 == 1 and hidden_size % 2 == 0
        self.h = hidden_size
        self.k = kernel_size
        self.dr = dilation_rate
        self.n = n_layers
        self.c_cond = c_cond
        self.causal = causal

    def init(self, key) -> Params:
        keys = iter(jax.random.split(key, 2 * self.n + 2))
        p: Params = {"in": [], "res_skip": []}
        for i in range(self.n):
            w = init_conv(next(keys), 2 * self.h, self.h, self.k,
                          init="kaiming_relu" if self.causal else "torch")
            w.update(ops.weight_norm_init(w.pop("w")))
            p["in"].append(w)
            out_ch = 2 * self.h if i < self.n - 1 else self.h
            rs = init_conv(next(keys), out_ch, self.h, 1)
            rs.update(ops.weight_norm_init(rs.pop("w")))
            p["res_skip"].append(rs)
        if self.c_cond:
            c = init_conv(next(keys), 2 * self.h * self.n, self.c_cond, 1)
            c.update(ops.weight_norm_init(c.pop("w")))
            p["cond"] = c
        return p

    def apply(self, params: Params, x: Array, nonpadding: Array | None = None,
              cond: Array | None = None, *, stream: Stream | None = None,
              prefix: str = "wn") -> Array:
        """x: [B, T, H] → [B, T, H]."""
        s = stream or Stream(None)
        np_ = nonpadding if nonpadding is not None else 1.0
        output = jnp.zeros_like(x)
        cond_all = None
        if cond is not None:
            cond_all = ops.conv1d(cond, ops.weight_norm_weight(params["cond"]),
                                  params["cond"]["b"])
        for i in range(self.n):
            d = self.dr ** i
            p_in = params["in"][i]
            w = ops.weight_norm_weight(p_in)
            if self.causal:
                if s.streaming:
                    x_in, carry = ops.causal_conv1d_step(
                        x, s.state[f"{prefix}.{i}"], w, p_in["b"], dilation=d)
                    s.new_state[f"{prefix}.{i}"] = carry
                else:
                    x_in = ops.causal_conv1d(x, w, p_in["b"], dilation=d)
            else:
                pad = (self.k * d - d) // 2
                x_in = ops.conv1d(x, w, p_in["b"], dilation=d, padding=(pad, pad))
            if cond_all is not None:
                x_in = x_in + cond_all[..., i * 2 * self.h:(i + 1) * 2 * self.h]
            t_act = jnp.tanh(x_in[..., :self.h])
            s_act = jax.nn.sigmoid(x_in[..., self.h:])
            acts = t_act * s_act
            prs = params["res_skip"][i]
            res_skip = ops.conv1d(acts, ops.weight_norm_weight(prs), prs["b"])
            if i < self.n - 1:
                x = (x + res_skip[..., :self.h]) * np_
                output = output + res_skip[..., self.h:]
            else:
                output = output + res_skip
        return output * np_

    def init_state(self, batch: int, prefix: str = "wn", dtype=jnp.float32) -> dict:
        assert self.causal
        return {f"{prefix}.{i}": ops.causal_conv1d_state(batch, self.h, self.k,
                                                         self.dr ** i, dtype)
                for i in range(self.n)}


# ---------------------------------------------------------------------------
# PitchPredictor (nar_tts_modules.py:105-147)
# ---------------------------------------------------------------------------

class PitchPredictor:
    def __init__(self, idim: int, n_layers: int = 5, n_chans: int = 384, odim: int = 2,
                 kernel_size: int = 5, dropout_rate: float = 0.1):
        self.idim, self.n, self.ch = idim, n_layers, n_chans
        self.odim, self.k, self.p = odim, kernel_size, dropout_rate

    def init(self, key) -> Params:
        keys = iter(jax.random.split(key, self.n + 2))
        convs = []
        for i in range(self.n):
            cin = self.idim if i == 0 else self.ch
            # diff/net.py CausalConv1d: kaiming-normal init, NO weight norm
            convs.append(init_conv(next(keys), self.ch, cin, self.k, init="kaiming_relu"))
        return {
            "convs": convs,
            "ln": init_layer_norm(self.ch),
            "out": init_linear(next(keys), self.odim, self.ch),
        }

    def apply(self, params: Params, x: Array, *, stream: Stream | None = None,
              prefix: str = "pp", rng=None, train: bool = False) -> Array:
        """x: [B, T, H] → [B, T, odim]. Causal convs only (streaming-safe)."""
        s = stream or Stream(None)
        for i, c in enumerate(params["convs"]):
            if s.streaming:
                x, carry = ops.causal_conv1d_step(x, s.state[f"{prefix}.{i}"], c["w"], c["b"])
                s.new_state[f"{prefix}.{i}"] = carry
            else:
                x = ops.causal_conv1d(x, c["w"], c["b"])
            x = jax.nn.relu(x)
            if train and rng is not None and self.p > 0:
                rng, r = jax.random.split(rng)
                x = dropout(x, self.p, r, train)
        x = layer_norm(x, params["ln"])
        return linear(x, params["out"])

    def init_state(self, batch: int, prefix: str = "pp", dtype=jnp.float32) -> dict:
        st = {}
        for i in range(self.n):
            cin = self.idim if i == 0 else self.ch
            st[f"{prefix}.{i}"] = ops.causal_conv1d_state(batch, cin, self.k, 1, dtype)
        return st


# ---------------------------------------------------------------------------
# Sinusoidal positional embedding (fairseq-style, transformer.py:13-72)
# ---------------------------------------------------------------------------

def sinusoidal_positions_table(num: int, dim: int, padding_idx: int = 0) -> np.ndarray:
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    emb = np.exp(np.arange(half) * -emb)
    emb = np.arange(num)[:, None] * emb[None, :]
    table = np.concatenate([np.sin(emb), np.cos(emb)], axis=1)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((num, 1))], axis=1)
    table[padding_idx] = 0
    return table.astype(np.float32)


def positional_embedding(first_channel: Array, dim: int, padding_idx: int = 0,
                         max_positions: int = 4000) -> Array:
    """fairseq SinusoidalPositionalEmbedding.forward on a float "token" input:
    position = padding_idx + cumsum(x != padding_idx), pad rows zeroed."""
    mask = (first_channel != padding_idx).astype(jnp.int32)
    positions = jnp.cumsum(mask, axis=1) * mask + padding_idx
    table = jnp.asarray(sinusoidal_positions_table(max_positions, dim, padding_idx))
    return table[positions]


def timestep_embedding(t: Array, dim: int) -> Array:
    """Diffusion SinusoidalPosEmb (diff/net.py:93-103): t [B] → [B, dim]."""
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    emb = jnp.exp(jnp.arange(half) * -emb)
    emb = t[:, None].astype(jnp.float32) * emb[None, :]
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


# ---------------------------------------------------------------------------
# torch-style MultiheadAttention (used by the prosody aligner)
# ---------------------------------------------------------------------------

class MultiheadAttention:
    """nn.MultiheadAttention semantics (packed in-proj, averaged attn weights)."""

    def __init__(self, dim: int, num_heads: int, dropout: float = 0.1):
        assert dim % num_heads == 0
        self.dim, self.h, self.p = dim, num_heads, dropout

    def init(self, key) -> Params:
        k1, k2 = jax.random.split(key)
        return {
            "in_w": inits.xavier_uniform(k1, (3 * self.dim, self.dim)),
            "in_b": inits.zeros((3 * self.dim,)),
            "out": init_linear(k2, self.dim, self.dim, init="torch"),
        }

    def apply(self, params: Params, q: Array, k: Array, v: Array,
              key_padding_mask: Array | None = None, *, rng=None,
              train: bool = False) -> tuple[Array, Array]:
        """q: [B,Tq,D], k/v: [B,Tk,D]; key_padding_mask: [B,Tk] True=pad.
        Returns (out [B,Tq,D], attn averaged over heads [B,Tq,Tk])."""
        D, H = self.dim, self.h
        Dh = D // H
        W, b = params["in_w"], params["in_b"]
        qp = jnp.matmul(q, W[:D].T, precision=_prec()) + b[:D]
        kp = jnp.matmul(k, W[D:2 * D].T, precision=_prec()) + b[D:2 * D]
        vp = jnp.matmul(v, W[2 * D:].T, precision=_prec()) + b[2 * D:]
        B, Tq, _ = qp.shape
        Tk = kp.shape[1]
        qh = qp.reshape(B, Tq, H, Dh)
        kh = kp.reshape(B, Tk, H, Dh)
        vh = vp.reshape(B, Tk, H, Dh)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                            precision=_prec()) * (Dh ** -0.5)
        if key_padding_mask is not None:
            logits = jnp.where(key_padding_mask[:, None, None, :], -jnp.inf, logits)
        probs = jax.nn.softmax(logits, axis=-1)
        if train and rng is not None and self.p > 0:
            probs = dropout(probs, self.p, rng, train)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, vh,
                       precision=_prec()).reshape(B, Tq, D)
        return linear(o, params["out"]), probs.mean(axis=1)
