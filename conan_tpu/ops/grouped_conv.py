"""Fast grouped 1-D convolution for the MSD discriminator.

XLA's native grouped conv (``feature_group_count``) runs the MSD's
41-tap grouped layers (`/root/reference/modules/vocoder/hifigan/
hifigan_causal.py:419-452`: groups 4/16, per-group channels 8-64) at
5-17 TFLOP/s on v5e — the tiny per-group contraction (cig·k where cig is
8..64) starves the 128×128 MXU (tools/GROUPCONV.json).

This module reformulates the grouped conv as a small number of DENSE
convolutions over block-diagonal weights: pack ``nb = 128 // cig`` groups
into one tile so the contraction dim becomes ``nb·cig = 128`` (one full
MXU pass per tap), at the cost of ``nb×`` redundant FLOPs inside the tile
(the off-diagonal blocks are zeros).  Redundant-but-dense beats
exact-but-starved: per-tile utilisation goes from ~cig/128 of the MXU to
~1.0, a net win whenever XLA's grouped path runs below peak/nb.

A Pallas kernel for the same block-diag tap-matmul schedule lives in
``ops/pallas_groupconv.py``; the dispatcher below picks the fastest
measured implementation per shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from conan_tpu.ops.precision import get_precision

Array = jax.Array

_DN_1D = ("NHC", "HIO", "NHC")  # x [B,T,C], w [K,I,O]

# MXU lane width: pack groups until the per-tile contraction reaches this.
_TARGET_CI = 128


def _pick_nb(groups: int, cig: int) -> int:
    """Groups per tile: largest divisor of ``groups`` with nb*cig <= 128."""
    nb = max(1, min(groups, _TARGET_CI // max(cig, 1)))
    while groups % nb:
        nb -= 1
    return nb


def block_diag_weight(w: Array, groups: int, nb: int) -> Array:
    """[Co, cig, K] grouped weight -> [G//nb, nb*cog, nb*cig, K] dense tiles.

    Tile t, output row a*cog+o, input col a'*cig+i, tap k equals
    w[(t*nb+a)*cog+o, i, k] when a == a' and 0 otherwise (block diagonal).
    """
    co, cig, k = w.shape
    cog = co // groups
    w4 = w.reshape(groups // nb, nb, cog, cig, k)
    eye = jnp.eye(nb, dtype=w.dtype)
    # [T, nb, cog, 1, cig, K] * [nb, 1, nb, 1, 1] -> [T, nb, cog, nb, cig, K]
    wblk = w4[:, :, :, None, :, :] * eye[:, None, :, None, None]
    return wblk.reshape(groups // nb, nb * cog, nb * cig, k)


def use_blocked(groups: int, cig: int) -> bool:
    """True when the block-diag dense formulation beats XLA's grouped conv.

    Measured on v5e (tools/GROUPCONV.json vs GROUPCONV_blocked.json, grad
    mode, production MSD shapes): nb>=4 (cig<=32) wins 1.6-4x; nb=2
    (cig=64, MSD L6) loses (0.59 -> 0.87 ms) because the 2x FLOP inflation
    exceeds the utilisation gain at an already-half-full MXU.
    """
    return _pick_nb(groups, cig) >= 4


def grouped_conv1d_blocked(
    x: Array,
    w: Array,
    b: Array | None = None,
    *,
    stride: int = 1,
    dilation: int = 1,
    padding: tuple[int, int] = (0, 0),
    groups: int = 1,
) -> Array:
    """Grouped conv as dense block-diagonal convs. Same contract as
    ``ops.conv1d(..., groups=groups)``: x [B,T,Ci], w [Co, Ci//groups, K].

    Gradient comes from autodiff of the dense convs (XLA lowers dense conv
    VJPs well; it is exactly the grouped path that it mishandles).
    """
    co, cig, k = w.shape
    cog = co // groups
    nb = _pick_nb(groups, cig)
    if nb <= 1:
        # per-group contraction already fills the MXU; dense tiling cannot win
        y = lax.conv_general_dilated(
            x, jnp.transpose(w, (2, 1, 0)), window_strides=(stride,),
            padding=[tuple(padding)], rhs_dilation=(dilation,),
            dimension_numbers=_DN_1D,
            feature_group_count=groups, precision=get_precision(),
            preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None)
        return y if b is None else y + b
    wblk = block_diag_weight(w, groups, nb)  # [T, nb*cog, nb*cig, K]
    n_tiles = groups // nb
    ci_t = nb * cig
    ys = []
    for t in range(n_tiles):
        xt = lax.slice_in_dim(x, t * ci_t, (t + 1) * ci_t, axis=2)
        yt = lax.conv_general_dilated(
            xt, jnp.transpose(wblk[t], (2, 1, 0)), window_strides=(stride,),
            padding=[tuple(padding)], rhs_dilation=(dilation,),
            dimension_numbers=_DN_1D,
            precision=get_precision(),
            preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None)
        ys.append(yt)
    y = ys[0] if n_tiles == 1 else jnp.concatenate(ys, axis=-1)
    return y if b is None else y + b
