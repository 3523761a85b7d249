"""Lane-packed causal conv1d for sub-128-channel stages (TPU MXU fix).

The v5e MXU is 128 lanes wide; a C=64 conv fills half of every tile and
XLA's conv lowering runs at ~39% of the 6-pass f32-emulation ceiling on the
vocoder tail shapes.  Packing p=2 consecutive time steps into the channel
axis ([B, T, 64] → [B, T/2, 128]) and convolving with a block-Toeplitz
weight fills all 128 lanes: measured 2.3× on the exact-serving-dominant
C=64/k=7/d=1 shape (0.182 → 0.079 ms, 90% of the emulation ceiling —
tools/TAIL_CONV.json, tools/bench_tail_conv.py).

Routing rules (everything else falls back to the lax path):
  * trace-time precision is HIGHEST — at HIGH/DEFAULT the bf16 conv
    lowering is not lane-bound and the kp/k·p FLOP multiplier makes packing
    a net LOSS (full vocoder step measured 6.04→6.46 ms high,
    2.43→3.31 ms default; HIGHEST improves 11.24→10.29 ms)
  * dilation == 1 — dilated taps span (k−1)·d+1 samples, inflating the
    packed kernel by ~d× (measured SLOWER than lax for d=3)
  * C_in == C_out == 64 — C=32 (p=4) measured only parity with lax (the
    kp/k·p FLOP multiplier eats the lane gain)
  * (k−1) and T divisible by p — true for every vocoder tail shape
    (k ∈ {3,7,11}, chunk T multiples of 4)

Numerics: f32 math, different summation grouping → bit-different from the
lax lowering but well inside every parity tolerance.  Streaming and offline
route identically whenever their matmul M = B·T/p lands on the same side of
the small-M gate; when a long offline sequence packs while the B=1 chunk
step falls back, the difference is f32 reassociation only (~1e-7 on the
waveform, far inside the 1e-3 stream-vs-offline guard tolerance;
regression-tested at both gate outcomes).

Reference conv being accelerated: `hifigan_causal.py:217-244` ResBlock1.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

Array = jax.Array

PACK = 2  # pack factor: 2 × 64 channels = 128 lanes


def packable(cin: int, cout: int, k: int, dilation: int, T: int,
             batch: int = 1 << 30) -> bool:
    from jax import lax

    from conan_tpu.ops.precision import get_precision

    return (get_precision() == lax.Precision.HIGHEST
            and dilation == 1 and cin == 64 and cout == 64
            and (k - 1) % PACK == 0 and T % PACK == 0
            # small-M gate: at B=1 the extra reshape/concat per conv costs
            # more than the lane win (packed matmul M = B·T/p); route only
            # when the matmul is big enough to be MXU-bound
            and batch * (T // PACK) >= 4096)


@functools.lru_cache(maxsize=None)
def _pack_layout(k: int):
    """Static block layout: maps (row-block = fr·p+slot, col-block = b) to
    the tap index j it carries, or None (zero block)."""
    p = PACK
    kp = (k - 1) // p + 1
    layout: dict[tuple[int, int], int] = {}
    for b in range(p):          # output slot within a packed frame
        for j in range(k):      # tap (oldest first)
            u = b - (k - 1 - j)             # input offset within frame m
            f = (-u + p - 1) // p if u < 0 else 0   # frames back
            slot = (u + f * p) % p
            fr = kp - 1 - f                  # oldest-first frame index
            layout[(fr * p + slot, b)] = j
    return layout, kp


def _packed_weight(w: Array) -> tuple[Array, int]:
    """Block-Toeplitz packed weight Wp[kp·p·Cin, p·Cout] from w[Cout,Cin,k],
    built from pure slice/transpose/concat ops — NO gather/scatter (a
    per-element scatter construction measured 4-8x SLOWER end-to-end on TPU:
    XLA executes gathers row-at-a-time and did not hoist them out of the
    chunk step)."""
    cout, cin, k = w.shape
    p = PACK
    layout, kp = _pack_layout(k)
    zeros = jnp.zeros((cin, cout), w.dtype)
    rows = []
    for rb in range(kp * p):
        rows.append(jnp.concatenate(
            [w[:, :, layout[(rb, b)]].T if (rb, b) in layout else zeros
             for b in range(p)], axis=1))
    return jnp.concatenate(rows, axis=0), kp


def _run(x: Array, carry: Array | None, w: Array, b: Array | None,
         precision) -> Array:
    """Core: y[t] = Σ_j w[:,:,j] · x_lp[t+j] with x_lp = [carry ∥ x]
    (carry = zeros ⇔ the offline left-pad), evaluated in the packed layout."""
    B, T, C = x.shape
    cout = w.shape[0]
    p = PACK
    wp, kp = _packed_weight(w)
    xp = x.reshape(B, T // p, p * C)
    if carry is None:
        left = jnp.zeros((B, kp - 1, p * C), x.dtype)
    else:
        left = carry.reshape(B, kp - 1, p * C)
    x_cat = jnp.concatenate([left, xp], axis=1)  # [B, T/p + kp-1, pC]
    n = T // p
    taps = jnp.concatenate([x_cat[:, j:j + n] for j in range(kp)], axis=-1)
    y = jnp.matmul(taps, wp, precision=precision)  # [B, T/p, p·cout]
    if b is not None:
        y = y + jnp.tile(b, p)
    return y.reshape(B, T, cout)


def packed_causal_conv1d(x: Array, w: Array, b: Array | None = None, *,
                         precision=None) -> Array:
    """Offline form: left zero-padded causal conv, [B,T,C] → [B,T,Cout]."""
    return _run(x, None, w, b, precision)


def packed_causal_conv1d_step(x: Array, carry: Array, w: Array,
                              b: Array | None = None, *,
                              precision=None) -> tuple[Array, Array]:
    """Streaming form: ``carry`` is the [B, k-1, C] input tail (identical
    state layout to ops.causal_conv1d_step, so the two paths are
    checkpoint/state compatible)."""
    k = w.shape[-1]
    y = _run(x, carry, w, b, precision)
    x_ext = jnp.concatenate([carry, x], axis=1)
    new_carry = x_ext[:, x_ext.shape[1] - (k - 1):]
    return y, new_carry
