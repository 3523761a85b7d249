"""Pallas grouped-conv kernel vs the XLA grouped conv (interpreter mode on
CPU; the same kernel is measured on hardware in tools/GROUPCONV_pallas.json).
Covers every production MSD layer geometry (groups 4/16, strides 1/2/4,
k=41 — hifigan_causal.py:419-452) for values AND both grads (the custom VJP
routes through the XLA block-diag formulation)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conan_tpu import ops
from conan_tpu.ops.pallas_groupconv import pallas_grouped_conv1d

MSD_LAYERS = [  # (ci, co, k, stride, groups)
    (128, 128, 41, 2, 4),
    (128, 256, 41, 2, 16),
    (256, 512, 41, 4, 16),
    (512, 1024, 41, 4, 16),
    (1024, 1024, 41, 1, 16),
]


@pytest.mark.parametrize("ci,co,k,s,g", MSD_LAYERS)
def test_pallas_groupconv_golden(rng, ci, co, k, s, g):
    T = 220 if ci <= 256 else 100
    x = jnp.asarray(rng.standard_normal((2, T, ci)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((co, ci // g, k)) * 0.1)
                    .astype(np.float32))
    b = jnp.asarray(rng.standard_normal((co,)).astype(np.float32))
    pad = (k - 1) // 2
    want = ops.conv1d(x, w, b, stride=s, padding=(pad, pad), groups=g)
    got = pallas_grouped_conv1d(x, w, b, stride=s, padding=(pad, pad), groups=g)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)

    def loss(fn):
        return lambda xx, ww: jnp.sum(
            jnp.sin(fn(xx, ww, b, stride=s, padding=(pad, pad), groups=g)))

    g_ref = jax.grad(loss(ops.conv1d), argnums=(0, 1))(x, w)
    g_new = jax.grad(loss(pallas_grouped_conv1d), argnums=(0, 1))(x, w)
    for a, c in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   atol=5e-4, rtol=1e-3)


def test_pallas_groupconv_rejects_dense():
    x = jnp.zeros((1, 16, 8))
    w = jnp.zeros((8, 8, 3))
    with pytest.raises(ValueError):
        pallas_grouped_conv1d(x, w, groups=1)
