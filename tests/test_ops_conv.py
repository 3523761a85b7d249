"""Parity tests: conan_tpu.ops.conv vs torch semantics the reference relies on."""

import numpy as np
import pytest
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

from conan_tpu import ops


def _np(x):
    return np.asarray(x)


@pytest.mark.parametrize("k,d", [(1, 1), (3, 1), (3, 3), (7, 1), (5, 2)])
def test_causal_conv1d_matches_torch(rng, k, d):
    B, T, Ci, Co = 2, 37, 8, 12
    x = rng.standard_normal((B, T, Ci), dtype=np.float32)
    w = rng.standard_normal((Co, Ci, k), dtype=np.float32) * 0.1
    b = rng.standard_normal((Co,), dtype=np.float32)

    # torch: left-pad then valid conv (hifigan_causal.py:50-54)
    xt = torch.from_numpy(x).transpose(1, 2)
    xt = F.pad(xt, (d * (k - 1), 0))
    yt = F.conv1d(xt, torch.from_numpy(w), torch.from_numpy(b), dilation=d)
    yt = yt.transpose(1, 2).numpy()

    yj = _np(ops.causal_conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), dilation=d))
    np.testing.assert_allclose(yj, yt, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("k,d,chunk", [(3, 1, 4), (7, 1, 4), (3, 3, 5), (5, 2, 3)])
def test_causal_conv1d_streaming_equals_offline(rng, k, d, chunk):
    B, T, Ci, Co = 2, 24, 6, 10
    x = jnp.asarray(rng.standard_normal((B, T, Ci), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((Co, Ci, k), dtype=np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((Co,), dtype=np.float32))

    y_off = ops.causal_conv1d(x, w, b, dilation=d)

    carry = ops.causal_conv1d_state(B, Ci, k, d)
    outs = []
    for s in range(0, T, chunk):
        yc, carry = ops.causal_conv1d_step(x[:, s:s + chunk], carry, w, b, dilation=d)
        outs.append(yc)
    y_str = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(_np(y_str), _np(y_off), atol=1e-5, rtol=1e-5)


def test_weight_norm_matches_torch(rng):
    Co, Ci, k = 12, 8, 5
    conv = nn.utils.weight_norm(nn.Conv1d(Ci, Co, k))
    v = conv.weight_v.detach().numpy()
    g = conv.weight_g.detach().numpy()
    w_torch = conv.weight.detach().numpy()
    w_jax = _np(ops.weight_norm_weight({"v": jnp.asarray(v), "g": jnp.asarray(g)}))
    np.testing.assert_allclose(w_jax, w_torch, atol=1e-6, rtol=1e-5)


def test_pixel_shuffle_matches_torch(rng):
    B, C, r, T = 2, 6, 4, 9
    x = rng.standard_normal((B, C * r, T), dtype=np.float32)
    # torch reference (hifigan_causal.py:179-189)
    xt = torch.from_numpy(x)
    ref = xt.view(B, C, r, T).permute(0, 1, 3, 2).reshape(B, C, T * r).numpy()
    # channels-last input
    x_cl = jnp.asarray(np.transpose(x, (0, 2, 1)))
    out = _np(ops.pixel_shuffle_1d(x_cl, r))  # [B, T*r, C]
    np.testing.assert_allclose(np.transpose(out, (0, 2, 1)), ref, atol=0, rtol=0)


@pytest.mark.parametrize("stride,k,pad,opad", [(2, 4, 0, 1), (4, 8, 0, 3), (4, 8, 2, 0), (5, 10, 0, 4)])
def test_conv_transpose1d_matches_torch(rng, stride, k, pad, opad):
    B, T, Ci, Co = 2, 11, 4, 6
    x = rng.standard_normal((B, T, Ci), dtype=np.float32)
    w = rng.standard_normal((Ci, Co, k), dtype=np.float32) * 0.1
    b = rng.standard_normal((Co,), dtype=np.float32)
    yt = F.conv_transpose1d(
        torch.from_numpy(x).transpose(1, 2), torch.from_numpy(w), torch.from_numpy(b),
        stride=stride, padding=pad, output_padding=opad,
    ).transpose(1, 2).numpy()
    yj = _np(ops.conv_transpose1d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
        stride=stride, padding=pad, output_padding=opad))
    assert yj.shape == yt.shape
    np.testing.assert_allclose(yj, yt, atol=1e-5, rtol=1e-5)


def test_conv2d_matches_torch(rng):
    B, H, W, Ci, Co = 2, 12, 5, 3, 7
    x = rng.standard_normal((B, H, W, Ci), dtype=np.float32)
    w = rng.standard_normal((Co, Ci, 5, 1), dtype=np.float32) * 0.1
    b = rng.standard_normal((Co,), dtype=np.float32)
    yt = F.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(w), torch.from_numpy(b),
        stride=(3, 1), padding=(2, 0),
    ).permute(0, 2, 3, 1).numpy()
    yj = _np(ops.conv2d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
        stride=(3, 1), padding=((2, 2), (0, 0))))
    np.testing.assert_allclose(yj, yt, atol=1e-5, rtol=1e-5)


def test_packed_causal_conv_matches_lax(rng):
    """ops/packed_conv.py: the lane-packed C=64 conv (vocoder tail fast
    path, 2.3x at exact-serving precision — tools/TAIL_CONV.json) must
    reproduce ops.causal_conv1d in both offline and streaming forms, with
    the identical [B, k-1, C] carry layout."""
    import jax

    from conan_tpu.ops import packed_conv

    for k in (3, 7, 11):
        assert packed_conv.packable(64, 64, k, 1, 16, 1024)
        w = jnp.asarray(rng.standard_normal((64, 64, k)).astype(np.float32) / (k * 8))
        b = jnp.asarray(rng.standard_normal((64,)).astype(np.float32) * 0.1)
        x = jnp.asarray(rng.standard_normal((2, 16, 64)).astype(np.float32))
        y_ref = ops.causal_conv1d(x, w, b)
        y_pk = packed_conv.packed_causal_conv1d(x, w, b, precision="highest")
        np.testing.assert_allclose(np.asarray(y_pk), np.asarray(y_ref),
                                   atol=1e-5, rtol=1e-5)
        # streaming: two chunks must equal the offline slices, carry-compatible
        carry = ops.causal_conv1d_state(2, 64, k)
        y1, carry = packed_conv.packed_causal_conv1d_step(
            x[:, :8], carry, w, b, precision="highest")
        y2, carry = packed_conv.packed_causal_conv1d_step(
            x[:, 8:], carry, w, b, precision="highest")
        np.testing.assert_allclose(np.asarray(jnp.concatenate([y1, y2], 1)),
                                   np.asarray(y_ref), atol=1e-5, rtol=1e-5)
        # carry layout identical to the lax step path
        _, carry_lax = ops.causal_conv1d_step(x, ops.causal_conv1d_state(2, 64, k), w, b)
        np.testing.assert_allclose(np.asarray(carry), np.asarray(carry_lax),
                                   atol=0, rtol=0)
    # routing guards: dilated / odd-T / non-64 / small-batch shapes fall back
    assert not packed_conv.packable(64, 64, 3, 3, 16, 1024)
    assert not packed_conv.packable(32, 32, 3, 1, 16, 1024)
    assert not packed_conv.packable(64, 64, 3, 1, 15, 1024)
    assert not packed_conv.packable(64, 64, 4, 1, 16, 1024)
    assert not packed_conv.packable(64, 64, 3, 1, 640, 1)  # M too small
