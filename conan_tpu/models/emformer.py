"""Emformer — chunked streaming transformer content extractor, from scratch.

The reference wraps ``torchaudio.models.Emformer`` (`/root/reference/modules/
Emformer/emformer.py:14-23`: input_dim=80, 8 heads, ffn 2048, 6 layers,
segment=chunk_size//20=4, left_context=50, right_context=2, memory bank
disabled) plus a Linear(80→100) logit head distilled from HuBERT.

This is a TPU-first reimplementation of those semantics, not a port:

  * offline forward = one dense masked attention over
    ``[hard-copied right-context blocks ∥ utterance]`` with a static banded
    block mask (pure iota comparisons, no dynamic shapes) — XLA maps the
    whole thing onto the MXU;
  * streaming ``step`` = one compiled function of (params, state, chunk) with
    a fixed-size left-context K/V cache [L] per layer plus a validity counter
    (masked attention over the invalid tail) — static shapes, compiled once;
  * streaming ≡ offline exactly, by construction (same per-position math),
    property-tested in tests/test_emformer.py.

Per-layer computation (matches torchaudio's EmformerLayer with
max_memory_size=0, dropout=0, relu):
    x   = [rc ∥ utt];  xn = LN_in(x)
    q   = Wq xn;  k,v = Wkv xn  (queries AND keys over [rc ∥ utt])
    att = softmax(q kᵀ / sqrt(Dh) + mask) v → Wout
    y   = att + x                    (residual from pre-LN input)
    y   = FFN_preLN(y) + y           (LN → Linear → relu → Linear)
    out = LN_out(y)
Segment s queries attend to: utterance[s·seg−L .. (s+1)·seg) ∥ rc block s.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax
import jax.numpy as jnp

from conan_tpu.ops.precision import get_precision as _prec

from conan_tpu.nn import inits
from conan_tpu.nn.module import Params, State

Array = jax.Array

NEG_INF = -1e8


@dataclasses.dataclass(frozen=True)
class EmformerConfig:
    input_dim: int = 80
    num_heads: int = 8
    ffn_dim: int = 2048
    num_layers: int = 6
    segment_length: int = 4
    left_context_length: int = 50
    right_context_length: int = 2
    output_dim: int = 100  # distillation head (HuBERT codebook size)

    @classmethod
    def from_hparams(cls, hp) -> "EmformerConfig":
        return cls(
            input_dim=hp.get("emformer_input_dim", 80),
            num_layers=hp["emformer_layers"],
            segment_length=hp["chunk_size"] // 20,
            right_context_length=hp["right_context"],
            output_dim=hp.get("emformer_output_dim", 100),
        )

    @property
    def head_dim(self) -> int:
        return self.input_dim // self.num_heads


def _layer_norm(x: Array, p: Params, eps: float = 1e-5) -> Array:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _linear(x: Array, p: Params) -> Array:
    # torch layout w:[out,in]; HIGHEST precision keeps streaming==offline at
    # allclose grade on the MXU (bf16 default drifts ~5e-3 between the two
    # attention shapes, enough to flip content-code argmaxes).
    return jnp.matmul(x, p["w"].T, precision=_prec()) + p["b"]


class Emformer:
    def __init__(self, cfg: EmformerConfig):
        self.cfg = cfg

    # ----------------------------------------------------------- params
    def _init_layer(self, key, gain: float) -> Params:
        D, F = self.cfg.input_dim, self.cfg.ffn_dim
        ks = jax.random.split(key, 6)

        def lin(k, o, i, g=1.0):
            return {"w": inits.xavier_uniform(k, (o, i), gain=g), "b": inits.zeros((o,))}

        def ln(d):
            return {"scale": inits.ones((d,)), "bias": inits.zeros((d,))}

        return {
            "q": lin(ks[0], D, D, gain),
            "kv": lin(ks[1], 2 * D, D, gain),
            "out": lin(ks[2], D, D, gain),
            "ln_in": ln(D),
            "ln_out": ln(D),
            "ffn_ln": ln(D),
            "ffn1": lin(ks[3], F, D),
            "ffn2": lin(ks[4], D, F),
        }

    def init(self, key) -> Params:
        keys = jax.random.split(key, self.cfg.num_layers + 1)
        layers = [
            self._init_layer(keys[i], gain=1.0 / math.sqrt(i + 1))
            for i in range(self.cfg.num_layers)
        ]
        return {"layers": layers}

    # ----------------------------------------------------------- offline
    def _offline_mask(self, n_segs: int) -> np.ndarray:
        """Static [n_q, n_k] additive mask for the hard-copy arrangement.

        Rows/cols ordered [rc blocks (n_segs*rc) ∥ utterance (n_segs*seg)].
        """
        cfg = self.cfg
        seg, rc, L = cfg.segment_length, cfg.right_context_length, cfg.left_context_length
        T = n_segs * seg
        nrc = n_segs * rc
        q_seg = np.concatenate([np.arange(nrc) // max(rc, 1), np.arange(T) // seg])
        k_is_rc = np.concatenate([np.ones(nrc, bool), np.zeros(T, bool)])
        k_seg = np.concatenate([np.arange(nrc) // max(rc, 1), np.arange(T) // seg])
        k_pos = np.concatenate([np.zeros(nrc), np.arange(T)])  # utt positions only
        qs = q_seg[:, None]
        allowed_rc = k_is_rc[None, :] & (k_seg[None, :] == qs)
        lo = qs * seg - L
        hi = (qs + 1) * seg
        allowed_utt = (~k_is_rc[None, :]) & (k_pos[None, :] >= lo) & (k_pos[None, :] < hi)
        return np.where(allowed_rc | allowed_utt, 0.0, NEG_INF).astype(np.float32)

    def _attention(self, p: Params, x: Array, kx: Array, bias: Array | None) -> Array:
        """Dense multi-head attention. x: queries source [B,Tq,D], kx: keys
        source [B,Tk,D], bias: additive [Tq,Tk] or [B,Tq,Tk] or None."""
        cfg = self.cfg
        B, Tq, D = x.shape
        Tk = kx.shape[1]
        H, Dh = cfg.num_heads, cfg.head_dim
        q = _linear(x, p["q"]).reshape(B, Tq, H, Dh)
        kv = _linear(kx, p["kv"])
        k = kv[..., :D].reshape(B, Tk, H, Dh)
        v = kv[..., D:].reshape(B, Tk, H, Dh)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, precision=_prec(),
                            preferred_element_type=jnp.float32)
        logits = logits * (Dh ** -0.5)
        if bias is not None:
            if bias.ndim == 2:
                bias = bias[None, None]
            else:
                bias = bias[:, None]
            logits = logits + bias
        probs = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                       precision=_prec()).reshape(B, Tq, D)
        return _linear(o, p["out"])

    def _banded_geometry(self, n_segs: int):
        """Static gather indices + validity for block-banded attention.

        Every query of segment s (its rc rows AND its utterance rows) attends
        to exactly the same W = rc + L + seg keys: segment-s rc block plus
        utterance window [s*seg - L, (s+1)*seg).  Returns
        (utt_idx [n_segs, L+seg], valid [n_segs, W]) with out-of-range window
        positions clamped to 0 and masked.
        """
        cfg = self.cfg
        seg, rc, L = (cfg.segment_length, cfg.right_context_length,
                      cfg.left_context_length)
        pos = (np.arange(n_segs)[:, None] * seg - L
               + np.arange(L + seg)[None, :])          # absolute utt positions
        valid_utt = pos >= 0
        utt_idx = np.clip(pos, 0, None)
        valid = np.concatenate(
            [np.ones((n_segs, rc), bool), valid_utt], axis=1)
        return utt_idx, valid, pos

    def _attention_banded_gather(self, p: Params, x: Array, n_segs: int,
                                 lengths: Array | None) -> Array:
        """Per-segment banded attention via row GATHER (round-3 variant).

        Kept only as a measured counterexample (tools/EMFORMER.json): the
        per-segment key windows duplicate each key ~(L+seg)/seg times through
        a dynamic gather whose VJP is a scatter-add, and the resulting
        [B, n_segs, rc+seg, H, W] einsums are 6x58 matmuls — both lower
        poorly on TPU, making this SLOWER than the dense path it was meant
        to beat.  The shipped banded path is `_attention_banded` (grouped
        slice-stack windows, no gather).
        """
        cfg = self.cfg
        seg, rc, L = (cfg.segment_length, cfg.right_context_length,
                      cfg.left_context_length)
        B, Ttot, D = x.shape
        H, Dh = cfg.num_heads, cfg.head_dim
        nrc = n_segs * rc
        T = Ttot - nrc
        nq = rc + seg
        q = _linear(x, p["q"])
        kv = _linear(x, p["kv"])
        k, v = kv[..., :D], kv[..., D:]
        utt_idx, valid, pos = self._banded_geometry(n_segs)
        W = valid.shape[1]

        def seg_group(a):  # [B, Ttot, D] -> [B, n_segs, rc+seg, D]
            if rc > 0:
                a_rc = a[:, :nrc].reshape(B, n_segs, rc, -1)
                a_utt = a[:, nrc:].reshape(B, n_segs, seg, -1)
                return jnp.concatenate([a_rc, a_utt], axis=2)
            return a.reshape(B, n_segs, seg, -1)

        def key_windows(a):  # [B, Ttot, D] -> [B, n_segs, W, D]
            utt = a[:, nrc:]
            win = utt[:, utt_idx.reshape(-1), :].reshape(B, n_segs, L + seg, -1)
            if rc > 0:
                a_rc = a[:, :nrc].reshape(B, n_segs, rc, -1)
                return jnp.concatenate([a_rc, win], axis=2)
            return win

        qs = seg_group(q).reshape(B, n_segs, nq, H, Dh)
        ks = key_windows(k).reshape(B, n_segs, W, H, Dh)
        vs = key_windows(v).reshape(B, n_segs, W, H, Dh)
        logits = jnp.einsum("bsqhd,bskhd->bshqk", qs, ks, precision=_prec(),
                            preferred_element_type=jnp.float32)
        logits = logits * (Dh ** -0.5)
        bias = jnp.where(jnp.asarray(valid), 0.0, NEG_INF)  # [n_segs, W]
        bias = bias[None, :, None, None, :]
        if lengths is not None:
            # same semantics as the dense path: rc keys always valid,
            # utterance key at absolute position p valid iff p < utt_hi[b]
            utt_hi = lengths + (T - jnp.max(lengths))
            lvalid = jnp.asarray(pos)[None] < utt_hi[:, None, None]
            if rc > 0:
                lvalid = jnp.concatenate(
                    [jnp.ones((B, n_segs, rc), bool), lvalid], axis=2)
            bias = bias + jnp.where(lvalid, 0.0, NEG_INF)[:, :, None, None, :]
        probs = jax.nn.softmax(logits + bias, axis=-1)
        o = jnp.einsum("bshqk,bskhd->bsqhd", probs, vs, precision=_prec())
        o = o.reshape(B, n_segs, nq, D)
        if rc > 0:
            o_rc = o[:, :, :rc].reshape(B, nrc, D)
            o_utt = o[:, :, rc:].reshape(B, T, D)
            o = jnp.concatenate([o_rc, o_utt], axis=1)
        else:
            o = o.reshape(B, T, D)
        return _linear(o, p["out"])

    def _blocked_geometry(self, n_segs: int, G: int):
        """Static mask/bookkeeping for the grouped slice-stack banded path.

        Segments are processed in groups of G.  Group g's queries are the
        rc+utt rows of segments [gG, gG+G); its keys are those segments' rc
        blocks plus the CONTIGUOUS utterance window
        [(gG - pad_segs)·seg, (gG + G)·seg) — segment-aligned so it can be
        built from plain slices (pad_segs = ceil(L/seg) left blocks, a few
        over-included positions masked).  Returns
        (n_pad, n_groups, bias [n_groups, nq, nk], utt_abs [n_groups, nk_utt]).
        """
        cfg = self.cfg
        seg, rc, L = (cfg.segment_length, cfg.right_context_length,
                      cfg.left_context_length)
        T = n_segs * seg
        pad_segs = -(-L // seg)
        n_pad = -(-n_segs // G) * G
        n_groups = n_pad // G
        nq = G * (rc + seg)
        nk_utt = (pad_segs + G) * seg
        nk = G * rc + nk_utt

        g = np.arange(n_groups)[:, None, None]            # [ng,1,1]
        # query row -> segment-within-group
        q_seg = np.concatenate([np.arange(G * rc) // max(rc, 1),
                                np.arange(G * seg) // seg])  # [nq]
        s_abs = g * G + q_seg[None, :, None]               # [ng,nq,1]
        q_real = s_abs < n_segs
        # rc key cols: allowed iff same segment (and that segment is real)
        if rc > 0:
            k_rc_seg = (np.arange(G * rc) // rc)[None, None, :]
            rc_ok = (k_rc_seg == q_seg[None, :, None]) & \
                    (g * G + k_rc_seg < n_segs)
            rc_ok = np.broadcast_to(rc_ok, (n_groups, nq, G * rc))
        # utt window cols: absolute positions
        utt_abs = (g[:, 0] * G - pad_segs) * seg + np.arange(nk_utt)[None, :]
        a = utt_abs[:, None, :]                            # [ng,1,nk_utt]
        utt_ok = ((a >= s_abs * seg - L) & (a < (s_abs + 1) * seg)
                  & (a >= 0) & (a < T))
        utt_ok = np.broadcast_to(utt_ok, (n_groups, nq, nk_utt))
        ok = np.concatenate([rc_ok, utt_ok], axis=2) if rc > 0 else utt_ok
        # padded-query rows are sliced off afterwards, but an all-masked row
        # would make softmax emit NaN which poisons gradients through 0*NaN;
        # let them attend uniformly instead.
        ok = ok | ~np.broadcast_to(q_real, ok.shape)
        bias = np.where(ok, 0.0, NEG_INF).astype(np.float32)
        return n_pad, n_groups, bias, utt_abs

    def _attention_banded(self, p: Params, x: Array, n_segs: int,
                          lengths: Array | None, group: int = 16) -> Array:
        """Banded multi-head attention over x = [rc ∥ utt], numerically equal
        to dense attention under `_offline_mask` (masked keys are exact -inf
        in both) but computing only each query's rc+L+seg-key neighbourhood.

        At production geometry (seg=4, L=50, rc=2) the dense path
        materializes [B,H,750,750] f32 score tensors — 288 MB/layer, 93% of
        it -inf — and the distill step is HBM-bound at 4% MFU
        (tools/EMFORMER.json).  This path groups `group` segments per block:
        their key windows are merged into ONE contiguous segment-aligned
        slice (no gather — the VJP is a slice-add, not a scatter) and the
        score einsum becomes [G(rc+seg)] x [Grc+(pad+G)seg] matmuls that
        tile the MXU instead of 6x58 crumbs.
        """
        cfg = self.cfg
        seg, rc, L = (cfg.segment_length, cfg.right_context_length,
                      cfg.left_context_length)
        B, Ttot, D = x.shape
        H, Dh = cfg.num_heads, cfg.head_dim
        nrc = n_segs * rc
        T = Ttot - nrc
        G = min(group, n_segs)
        pad_segs = -(-L // seg)
        n_pad, n_groups, bias_np, utt_abs = self._blocked_geometry(n_segs, G)
        nq = G * (rc + seg)

        q = _linear(x, p["q"])
        kv = _linear(x, p["kv"])
        k, v = kv[..., :D], kv[..., D:]

        def grouped_queries(a):  # [B,Ttot,D] -> [B,n_groups,nq,D]
            parts = []
            if rc > 0:
                a_rc = jnp.pad(a[:, :nrc], ((0, 0), (0, (n_pad - n_segs) * rc),
                                            (0, 0)))
                parts.append(a_rc.reshape(B, n_groups, G * rc, D))
            a_utt = jnp.pad(a[:, nrc:], ((0, 0), (0, (n_pad - n_segs) * seg),
                                         (0, 0)))
            parts.append(a_utt.reshape(B, n_groups, G * seg, D))
            return jnp.concatenate(parts, axis=2) if len(parts) > 1 else parts[0]

        def grouped_keys(a):  # [B,Ttot,D] -> [B,n_groups,nk,D]
            parts = []
            if rc > 0:
                a_rc = jnp.pad(a[:, :nrc], ((0, 0), (0, (n_pad - n_segs) * rc),
                                            (0, 0)))
                parts.append(a_rc.reshape(B, n_groups, G * rc, D))
            # utterance windows: pad pad_segs zero segments in front (+ tail
            # padding), then each group's window is one contiguous slice.
            a_utt = jnp.pad(a[:, nrc:],
                            ((0, 0), (pad_segs * seg, (n_pad - n_segs) * seg),
                             (0, 0)))
            win = jnp.stack(
                [jax.lax.slice_in_dim(a_utt, g * G * seg,
                                      (g * G + pad_segs + G) * seg, axis=1)
                 for g in range(n_groups)], axis=1)
            parts.append(win)
            return jnp.concatenate(parts, axis=2) if len(parts) > 1 else parts[0]

        qs = grouped_queries(q).reshape(B, n_groups, nq, H, Dh)
        ks = grouped_keys(k)
        nk = ks.shape[2]
        vs = grouped_keys(v).reshape(B, n_groups, nk, H, Dh)
        ks = ks.reshape(B, n_groups, nk, H, Dh)
        logits = jnp.einsum("bgqhd,bgkhd->bghqk", qs, ks, precision=_prec(),
                            preferred_element_type=jnp.float32)
        logits = logits * (Dh ** -0.5)
        bias = jnp.asarray(bias_np)[None, :, None]          # [1,ng,1,nq,nk]
        if lengths is not None:
            # dense-path semantics: rc keys always valid, utterance key at
            # absolute position p valid iff p < utt_hi[b]
            utt_hi = lengths + (T - jnp.max(lengths))
            lvalid = jnp.asarray(utt_abs)[None] < utt_hi[:, None, None]
            if rc > 0:
                lvalid = jnp.concatenate(
                    [jnp.ones((B, n_groups, G * rc), bool), lvalid], axis=2)
            bias = bias + jnp.where(lvalid, 0.0,
                                    NEG_INF)[:, :, None, None, :]
        probs = jax.nn.softmax(logits + bias, axis=-1)
        o = jnp.einsum("bghqk,bgkhd->bgqhd", probs, vs, precision=_prec())
        o = o.reshape(B, n_groups, nq, D)
        if rc > 0:
            o_rc = o[:, :, :G * rc].reshape(B, n_pad * rc, D)[:, :nrc]
            o_utt = o[:, :, G * rc:].reshape(B, n_pad * seg, D)[:, :T]
            o = jnp.concatenate([o_rc, o_utt], axis=1)
        else:
            o = o.reshape(B, n_pad * seg, D)[:, :T]
        return _linear(o, p["out"])

    def _layer(self, p: Params, x: Array, bias: Array | None,
               n_segs: int | None = None,
               lengths: Array | None = None) -> Array:
        """One Emformer layer over x = [rc ∥ utt]. When ``n_segs`` is given
        the banded attention path is used (bias is ignored — the band
        geometry + lengths reproduce it exactly)."""
        xn = _layer_norm(x, p["ln_in"])
        if n_segs is not None:
            att = self._attention_banded(p, xn, n_segs, lengths)
        else:
            att = self._attention(p, xn, xn, bias)
        y = att + x
        h = _layer_norm(y, p["ffn_ln"])
        h = jax.nn.relu(_linear(h, p["ffn1"]))
        h = _linear(h, p["ffn2"])
        y = y + h
        return _layer_norm(y, p["ln_out"])

    def apply(self, params: Params, mel: Array, lengths: Array | None = None,
              *, banded: bool = True) -> Array:
        """Offline forward. mel [B, T_in, D] where T_in = n_segs*seg + rc
        (right-context lookahead included, like torchaudio). Returns
        [B, T_utt, D] utterance features.

        ``banded=True`` (default) computes attention only over each query's
        rc+L+seg-key band — numerically identical to the dense masked path
        (``banded=False``, kept as the equivalence oracle) but ~13x less
        score-tensor traffic at production geometry.
        """
        cfg = self.cfg
        seg, rc = cfg.segment_length, cfg.right_context_length
        B, T_in, D = mel.shape
        T = T_in - rc
        assert T % seg == 0, f"utterance length {T} must be a multiple of segment {seg}"
        n_segs = T // seg
        utt = mel[:, :T]
        if rc > 0:
            # hard-copy right-context blocks: block s = input[(s+1)*seg : +rc]
            idx = (np.arange(n_segs)[:, None] + 1) * seg + np.arange(rc)[None, :]
            rc_blocks = mel[:, idx.reshape(-1), :]
            x = jnp.concatenate([rc_blocks, utt], axis=1)
        else:
            x = utt
        if banded:
            for lp in params["layers"]:
                x = self._layer(lp, x, None, n_segs=n_segs, lengths=lengths)
            return x[:, n_segs * rc:] if rc > 0 else x
        bias = jnp.asarray(self._offline_mask(n_segs))
        if lengths is not None:
            # torchaudio `_gen_padding_mask` semantics (verified against the
            # torch oracle in tests/torch_emformer_oracle.py): every
            # right-context key stays valid; utterance key j is valid iff
            # j < lengths[b] + T_utt - max(lengths), i.e. klengths =
            # lengths + (rc_total + T_utt - max(lengths)) over the
            # [rc ∥ utterance] key layout.  `lengths` counts valid frames of
            # `mel` (including its rc tail), matching the reference's usage
            # (`/root/reference/modules/Emformer/emformer.py:40,87`).
            nrc = n_segs * rc
            utt_pos = jnp.arange(T)
            utt_hi = lengths + (T - jnp.max(lengths))
            utt_valid = utt_pos[None, :] < utt_hi[:, None]
            if rc > 0:
                rc_valid = jnp.ones((lengths.shape[0], nrc), bool)
                key_valid = jnp.concatenate([rc_valid, utt_valid], axis=1)
            else:
                key_valid = utt_valid
            bias = bias[None] + jnp.where(key_valid, 0.0, NEG_INF)[:, None, :]
        for lp in params["layers"]:
            x = self._layer(lp, x, bias)
        return x[:, n_segs * rc:] if rc > 0 else x

    # ----------------------------------------------------------- streaming
    def init_state(self, batch: int, dtype=jnp.float32) -> State:
        cfg = self.cfg
        L, D = cfg.left_context_length, cfg.input_dim
        st: State = {"cache_len": jnp.zeros((), jnp.int32)}
        for i in range(cfg.num_layers):
            st[f"l{i}.k"] = jnp.zeros((batch, L, D), dtype)
            st[f"l{i}.v"] = jnp.zeros((batch, L, D), dtype)
        return st

    def step(self, params: Params, state: State, chunk: Array) -> tuple[Array, State]:
        """One streaming step. chunk [B, seg+rc, D] (segment then lookahead).

        Returns ([B, seg, D], state'). Equals the corresponding slice of
        ``apply`` over the full stream (tested invariant).
        """
        cfg = self.cfg
        seg, rc, L, D = (cfg.segment_length, cfg.right_context_length,
                         cfg.left_context_length, cfg.input_dim)
        B = chunk.shape[0]
        u, r = chunk[:, :seg], chunk[:, seg:]
        x = jnp.concatenate([r, u], axis=1)  # [B, rc+seg, D]
        cache_len = state["cache_len"]
        # cache slot j (0..L-1) is valid iff j >= L - cache_len
        cache_valid = jnp.arange(L) >= (L - cache_len)
        bias_cache = jnp.where(cache_valid, 0.0, NEG_INF)[None, :]  # [1, L]
        new_state: State = {"cache_len": jnp.minimum(cache_len + seg, L)}
        for i, lp in enumerate(params["layers"]):
            xn = _layer_norm(x, lp["ln_in"])
            kv_new = _linear(xn, lp["kv"])
            k_cache, v_cache = state[f"l{i}.k"], state[f"l{i}.v"]
            H, Dh = cfg.num_heads, cfg.head_dim
            q = _linear(xn, lp["q"]).reshape(B, rc + seg, H, Dh)
            k_new = kv_new[..., :D]
            v_new = kv_new[..., D:]
            k = jnp.concatenate([k_cache, k_new], axis=1).reshape(B, L + rc + seg, H, Dh)
            v = jnp.concatenate([v_cache, v_new], axis=1).reshape(B, L + rc + seg, H, Dh)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, precision=_prec(),
                                preferred_element_type=jnp.float32) * (Dh ** -0.5)
            bias = jnp.concatenate(
                [jnp.broadcast_to(bias_cache, (1, L)), jnp.zeros((1, rc + seg))], axis=1)
            logits = logits + bias[None, None]
            probs = jax.nn.softmax(logits, axis=-1)
            att = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                             precision=_prec()).reshape(B, rc + seg, D)
            att = _linear(att, lp["out"])
            y = att + x
            h = _layer_norm(y, lp["ffn_ln"])
            h = jax.nn.relu(_linear(h, lp["ffn1"]))
            y = y + _linear(h, lp["ffn2"])
            x = _layer_norm(y, lp["ln_out"])
            # cache the segment rows' K/V (rows rc..rc+seg of kv_new)
            new_state[f"l{i}.k"] = jnp.concatenate([k_cache, k_new[:, rc:]], axis=1)[:, -L:]
            new_state[f"l{i}.v"] = jnp.concatenate([v_cache, v_new[:, rc:]], axis=1)[:, -L:]
        return x[:, rc:], new_state


class EmformerDistillModel:
    """Emformer + Linear logit head (reference `modules/Emformer/emformer.py:6-47`).

    ``mode="both"`` adds the dual heads (100-way codes + 768-dim features,
    reference `emformer.py:28-30,41-44`)."""

    def __init__(self, cfg: EmformerConfig, mode: str | None = None):
        self.cfg = cfg
        self.mode = mode
        self.emformer = Emformer(cfg)

    def init(self, key) -> Params:
        k1, k2, k3 = jax.random.split(key, 3)
        D, O = self.cfg.input_dim, self.cfg.output_dim
        p = self.emformer.init(k1)

        def head(k, o):
            kw, kb = jax.random.split(k)
            return {"w": inits.kaiming_uniform(kw, (o, D)),
                    "b": inits.default_bias(kb, (o,), (o, D))}

        if self.mode == "both":
            p["proj1"] = head(k2, 100)
            p["proj2"] = head(k3, 768)
        else:
            p["proj"] = head(k2, O)
        return p

    def apply(self, params: Params, mel: Array, lengths: Array | None = None):
        """[B, T_in, 80] → logits [B, T_utt, output_dim] (or the two heads)."""
        h = self.emformer.apply(params, mel, lengths)
        if self.mode == "both":
            return _linear(h, params["proj1"]), _linear(h, params["proj2"])
        return _linear(h, params["proj"])

    def init_state(self, batch: int) -> State:
        return self.emformer.init_state(batch)

    def step(self, params: Params, state: State, chunk: Array):
        h, state = self.emformer.step(params, state, chunk)
        if self.mode == "both":
            return (_linear(h, params["proj1"]), _linear(h, params["proj2"])), state
        return _linear(h, params["proj"]), state
