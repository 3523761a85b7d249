"""Pallas TPU kernel for the MSD's grouped 1-D convolutions.

Schedule: the block-diagonal tap-matmul form (see ops/grouped_conv.py for
why this is MXU-optimal for per-group channels < 128 — packing nb = 128/cog
groups into one full-lane output tile trades nb× redundant FLOPs for full
lane occupancy; with cog as small as 16 there is NO schedule that fills the
128×128 systolic array with true FLOPs only, so "redundant-but-dense" is
the hardware ceiling, not a compromise).

Layout:
  * x is polyphase-decomposed outside the kernel: x_poly[b, r, t', c] =
    x_padded[b, t'*s + r, c], so every tap j reads a CONTIGUOUS row slice
    of phase j % s at row offset j // s (a strided time-slice would
    otherwise hit the sublane dim with stride s).
  * the block-diag weight wblk[ct, j, cib, co_t] is precomputed at trace
    time (tiny) and BlockSpec-tiled per output-channel tile ct.
  * grid = (B, T_out/T_TILE, Co/co_t); each cell runs K accumulating
    [T_TILE, cib] @ [cib, co_t] dots — one full-MXU pass per tap.  The x
    block's index_map ignores the time-tile index, so Pallas keeps it
    resident in VMEM across the whole time sweep (no per-tile halo DMA).

Forward matches ``ops.conv1d(..., groups=g)`` (golden-tested in
tests/test_pallas_groupconv.py).  The custom VJP reuses the XLA
block-diagonal formulation (whose grad lowering is already dense/fast);
the Pallas deliverable is the fused forward.  Reference op semantics:
`/root/reference/modules/vocoder/hifigan/hifigan_causal.py:419-452`.

Measured (tools/GROUPCONV_pallas.json, v5e, B=18 production MSD shapes):
the Pallas forward ties the XLA block-diag forward within noise — both are
MXU-bound on the same schedule — so the XLA form (free autodiff, fusion
with neighbours) stays the default in ``ops.conv1d``; this kernel is the
proof of the ceiling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from conan_tpu.ops.grouped_conv import (_pick_nb, block_diag_weight,
                                        grouped_conv1d_blocked)

Array = jax.Array


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("stride", "padding", "groups",
                                             "t_tile", "interpret"))
def _pallas_grouped_conv1d_fwd(x: Array, w: Array, *, stride: int,
                               padding: tuple[int, int], groups: int,
                               t_tile: int = 256,
                               interpret: bool = False) -> Array:
    """x [B,T,Ci] f32/bf16, w [Co, cig, K] -> [B, T_out, Co] f32.

    Matmuls run at the INPUT dtype (pass bf16 operands for the bf16 policy).
    """
    B, T, Ci = x.shape
    Co, cig, K = w.shape
    cog = Co // groups
    nb = _pick_nb(groups, cig)
    cib = nb * cig
    n_ct = groups // nb  # output-channel tiles of width nb*cog
    co_t = nb * cog
    s = stride
    T_out = (T + padding[0] + padding[1] - K) // s + 1
    T_out_pad = _ceil_to(T_out, t_tile)
    halo = (K - 1) // s  # rows a tap can reach past the tile, per phase
    t_poly = T_out_pad + halo + 1
    compute_dtype = x.dtype
    # x is stored f32 in VMEM: Mosaic rejects row-offset slices of PACKED
    # bf16 tiles (off >= 1 on the sublane dim); slices are cast back to the
    # compute dtype right before the dot, so the MXU still runs bf16.
    x_pad = jnp.pad(x.astype(jnp.float32),
                    ((0, 0), (padding[0], s * t_poly - T - padding[0]),
                     (0, 0)))
    # polyphase: [B, t', s, C] -> [B, s, t', C]
    x_poly = x_pad.reshape(B, t_poly, s, Ci).transpose(0, 2, 1, 3)
    wblk = block_diag_weight(w, groups, nb)  # [n_ct, co_t, cib, K]
    wblk = wblk.transpose(0, 3, 2, 1).astype(compute_dtype)

    n_tt = T_out_pad // t_tile

    def kernel(xp_ref, w_ref, o_ref):
        tt = pl.program_id(1)
        base = tt * t_tile
        acc = jnp.zeros((t_tile, co_t), jnp.float32)
        for j in range(K):
            r, off = j % s, j // s
            xs = xp_ref[0, r, pl.ds(base + off, t_tile), :]
            acc = acc + jnp.dot(xs.astype(compute_dtype), w_ref[0, j],
                                preferred_element_type=jnp.float32)
        o_ref[0] = acc

    out = pl.pallas_call(
        kernel,
        grid=(B, n_tt, n_ct),
        in_specs=[
            # full padded time axis per (b, channel-block): stays VMEM-
            # resident across the tt sweep (index_map ignores tt)
            pl.BlockSpec((1, s, t_poly, cib),
                         lambda b, tt, ct: (b, 0, 0, ct),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, cib, co_t), lambda b, tt, ct: (ct, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_tile, co_t),
                               lambda b, tt, ct: (b, tt, ct),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T_out_pad, Co), jnp.float32),
        interpret=interpret,
    )(x_poly, wblk)
    return out[:, :T_out]


def pallas_grouped_conv1d(x: Array, w: Array, b: Array | None = None, *,
                          stride: int = 1, padding: tuple[int, int] = (0, 0),
                          groups: int = 1,
                          interpret: bool | None = None) -> Array:
    """Grouped conv with a Pallas forward and an XLA block-diag VJP.

    ``interpret`` defaults to True off-TPU (Pallas CPU = interpreter only).
    """
    if groups <= 1:
        raise ValueError("pallas_grouped_conv1d is for grouped convs; "
                         "use ops.conv1d for dense ones")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    y = _pallas_fwd_vjp(x, w, stride, tuple(padding), groups, interpret)
    return y if b is None else y + b


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _pallas_fwd_vjp(x, w, stride, padding, groups, interpret):
    return _pallas_grouped_conv1d_fwd(x, w, stride=stride, padding=padding,
                                      groups=groups, interpret=interpret)


def _fwd(x, w, stride, padding, groups, interpret):
    return _pallas_fwd_vjp(x, w, stride, padding, groups, interpret), (x, w)


def _bwd(stride, padding, groups, interpret, res, g):
    x, w = res
    _, vjp = jax.vjp(
        lambda xx, ww: grouped_conv1d_blocked(
            xx, ww, stride=stride, padding=padding, groups=groups), x, w)
    dx, dw = vjp(g.astype(x.dtype))
    return dx, dw


_pallas_fwd_vjp.defvjp(_fwd, _bwd)
