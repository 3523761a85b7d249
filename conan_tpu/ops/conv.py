"""1-D convolution primitives for the streaming stack.

Everything is channels-last ``[B, T, C]`` (lane dim = channels → natural TPU
tiling). Weights are stored in torch layout ``[out, in, k]`` for 1:1 reference
checkpoint mapping and are transposed to XLA ``[k, in, out]`` inside the jitted
apply (free after fusion).

Reference semantics covered:
  - left-padded causal conv  (`/root/reference/modules/vocoder/hifigan/hifigan_causal.py:30-54`,
    `/root/reference/modules/Conan/diff/net.py:20-47`)
  - streaming step with a per-layer input tail carry (design delta from the
    reference, which re-runs the full prefix per chunk — SURVEY.md §7)
  - weight normalization (torch ``weight_norm`` with dim=0)
  - 1-D pixel shuffle (`hifigan_causal.py:171-189`)
  - causal transposed conv / zero-insertion upsamplers (`hifigan_causal.py:60-164`)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

# f32 inputs use full-precision MXU passes by default (SURVEY.md §7 "the
# allclose target forces f32 accumulation"); training jobs can trade down via
# conan_tpu.ops.precision.precision_scope("default").
from conan_tpu.ops.precision import get_precision  # noqa: E402

_DN_1D = ("NHC", "HIO", "NHC")  # x [B,T,C], w [K,I,O]


def _to_hio(w_oik: Array) -> Array:
    """[out, in, k] -> [k, in, out]."""
    return jnp.transpose(w_oik, (2, 1, 0))


def conv1d(
    x: Array,
    w: Array,
    b: Array | None = None,
    *,
    stride: int = 1,
    dilation: int = 1,
    padding: str | tuple[int, int] = (0, 0),
    groups: int = 1,
) -> Array:
    """Plain 1-D conv. x: [B,T,Cin], w: [Cout, Cin//groups, K] -> [B,T',Cout]."""
    if groups > 1 and not isinstance(padding, str):
        # small-per-group convs starve the MXU under XLA's grouped lowering;
        # route them through the block-diagonal dense formulation (measured
        # 1.6-4x faster on the MSD shapes — ops/grouped_conv.py).  An
        # equivalent fused Pallas kernel (ops/pallas_groupconv.py) wins
        # 1.4-3x on isolated L3/L4/L6 forwards but TIES at train-step level
        # (83.7 vs 83.3 ms — both schedules are MXU-bound and XLA already
        # fuses/overlaps the rest), so the XLA form stays the default.
        from conan_tpu.ops.grouped_conv import grouped_conv1d_blocked, use_blocked

        if use_blocked(groups, w.shape[1]):
            return grouped_conv1d_blocked(x, w, b, stride=stride,
                                          dilation=dilation,
                                          padding=tuple(padding), groups=groups)
    if isinstance(padding, str):
        pad = padding
    else:
        pad = [tuple(padding)]
    y = lax.conv_general_dilated(
        x,
        _to_hio(w),
        window_strides=(stride,),
        padding=pad,
        rhs_dilation=(dilation,),
        dimension_numbers=_DN_1D,
        feature_group_count=groups,
        precision=get_precision(),
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
    )
    if b is not None:
        y = y + b
    return y


def causal_conv1d(x: Array, w: Array, b: Array | None = None, *, dilation: int = 1) -> Array:
    """Left-padded causal conv: out[t] depends on in[<=t]. [B,T,C]->[B,T,O]."""
    k = w.shape[-1]
    left = dilation * (k - 1)
    return conv1d(x, w, b, dilation=dilation, padding=(left, 0))


def causal_conv1d_state(batch: int, in_ch: int, k: int, dilation: int = 1, dtype=jnp.float32) -> Array:
    """Initial streaming carry: the `left_pad` zero frames preceding t=0."""
    left = dilation * (k - 1)
    return jnp.zeros((batch, left, in_ch), dtype)


def causal_conv1d_step(
    x: Array, carry: Array, w: Array, b: Array | None = None, *, dilation: int = 1
) -> tuple[Array, Array]:
    """One streaming step: exactly equals the corresponding slice of
    `causal_conv1d` over the full sequence (prefix-consistency invariant,
    reference harness `hifigan_causal.py:603-680`).

    x: [B, Tc, Cin] chunk; carry: [B, left_pad, Cin] input tail.
    Returns ([B, Tc, Cout], new carry).
    """
    k = w.shape[-1]
    left = dilation * (k - 1)
    x_ext = jnp.concatenate([carry, x], axis=1) if left > 0 else x
    y = conv1d(x_ext, w, b, dilation=dilation, padding=(0, 0))
    new_carry = x_ext[:, x_ext.shape[1] - left:] if left > 0 else carry
    return y, new_carry


def conv_transpose1d(
    x: Array,
    w: Array,
    b: Array | None = None,
    *,
    stride: int,
    padding: int = 0,
    output_padding: int = 0,
) -> Array:
    """torch-semantics ConvTranspose1d. x: [B,T,Cin], w: [Cin, Cout, K].

    L_out = (T-1)*stride - 2*padding + K + output_padding.
    """
    k = w.shape[-1]
    # lhs-dilated conv formulation of transposed conv (exact torch semantics):
    # insert (stride-1) zeros between inputs, then VALID conv with the
    # flipped kernel padded by (k-1-padding) on both sides.
    w_flip = jnp.flip(w, axis=-1)  # [Cin, Cout, K]
    w_oik = jnp.transpose(w_flip, (1, 0, 2))  # [Cout, Cin, K]
    lo = k - 1 - padding
    hi = k - 1 - padding + output_padding
    y = lax.conv_general_dilated(
        x,
        _to_hio(w_oik),
        window_strides=(1,),
        padding=[(lo, hi)],
        lhs_dilation=(stride,),
        dimension_numbers=_DN_1D,
        precision=get_precision(),
    )
    if b is not None:
        y = y + b
    return y


def conv2d(
    x: Array,
    w: Array,
    b: Array | None = None,
    *,
    stride: tuple[int, int] = (1, 1),
    padding: tuple[tuple[int, int], tuple[int, int]] = ((0, 0), (0, 0)),
    groups: int = 1,
) -> Array:
    """2-D conv, channels-last. x: [B,H,W,Cin], w: [Cout, Cin//groups, KH, KW]."""
    y = lax.conv_general_dilated(
        x,
        jnp.transpose(w, (2, 3, 1, 0)),  # [KH,KW,I,O]
        window_strides=stride,
        padding=list(padding),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        precision=get_precision(),
    )
    if b is not None:
        y = y + b
    return y


# ---------------------------------------------------------------------------
# Weight normalization (torch nn.utils.weight_norm, dim=0)
# ---------------------------------------------------------------------------

def weight_norm_init(w: Array) -> dict:
    """Split a weight into (v, g) like torch weight_norm at attach time."""
    norm = jnp.sqrt(jnp.sum(w * w, axis=tuple(range(1, w.ndim)), keepdims=True))
    return {"v": w, "g": norm}


def weight_norm_weight(p: dict) -> Array:
    """Recompose w = g * v / ||v||_per-out-channel.

    Accepts a pre-folded weight (``{"w": ...}``, see ``fold_weight_norm``):
    inference-only paths can fold once at load instead of recomposing every
    step (training must keep (v, g) — the reparameterization changes the
    gradient geometry, which is weight norm's whole point)."""
    if "w" in p:
        return p["w"]
    v, g = p["v"], p["g"]
    norm = jnp.sqrt(jnp.sum(v * v, axis=tuple(range(1, v.ndim)), keepdims=True))
    return g * v / norm


def fold_weight_norm(params):
    """Pre-fold every weight-normed leaf dict {"v","g",...} in a param pytree
    into {"w",...} for inference (one-time host cost; removes the per-step
    norm+scale sweeps over the weights)."""
    if isinstance(params, dict):
        if "v" in params and "g" in params:
            out = {k: fold_weight_norm(x) for k, x in params.items()
                   if k not in ("v", "g")}
            out["w"] = weight_norm_weight(params)
            return out
        return {k: fold_weight_norm(x) for k, x in params.items()}
    if isinstance(params, (list, tuple)):
        return type(params)(fold_weight_norm(x) for x in params)
    return params


# ---------------------------------------------------------------------------
# Spectral normalization (torch nn.utils.spectral_norm)
# ---------------------------------------------------------------------------

def spectral_norm_weight(w: Array, iters: int = 3) -> Array:
    """w / sigma_max(w) with sigma estimated by power iteration over the
    [out, in*k] matricization (torch spectral_norm semantics: u/v are
    non-differentiable, sigma = uᵀWv differentiates through W).

    Stateless delta from torch: torch carries a persistent ``u`` buffer and
    runs ONE iteration per forward; here a fixed start vector and ``iters``
    iterations per apply give the same Lipschitz constraint without threading
    buffer state through the functional discriminators.
    """
    m = w.reshape(w.shape[0], -1)
    u = jnp.full((m.shape[0],), 1.0 / jnp.sqrt(jnp.float32(m.shape[0])), w.dtype)
    for _ in range(iters):
        v = m.T @ u
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
        u = m @ v
        u = u / jnp.maximum(jnp.linalg.norm(u), 1e-12)
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    sigma = u @ (m @ v)
    return w / jnp.maximum(sigma, 1e-12)


# ---------------------------------------------------------------------------
# Pixel shuffle (the paper's causal upsampler, `hifigan_causal.py:171-189`)
# ---------------------------------------------------------------------------

def pixel_shuffle_1d(x: Array, r: int) -> Array:
    """Channels-last 1-D pixel shuffle.

    torch reference (channels-first): view (B, C, r, T) -> permute -> (B, C, T*r),
    i.e. out[b, c, t*r + j] = in[b, c*r + j, t]. Channels-last equivalent:
    [B, T, C*r] -> [B, T*r, C] with out[b, t*r + j, c] = x[b, t, c*r + j].
    """
    B, T, CR = x.shape
    assert CR % r == 0, (CR, r)
    C = CR // r
    x = x.reshape(B, T, C, r)
    x = jnp.swapaxes(x, 2, 3)  # [B, T, r, C]
    return x.reshape(B, T * r, C)
