"""Parameter initializers matching the torch defaults the reference relies on.

All conv weights are stored in torch layout ``[out, in, k]`` (1-D) /
``[out, in, kh, kw]`` (2-D) so reference checkpoints map 1:1; `conan_tpu.ops`
transposes to XLA layout inside the (jitted) apply where it is free.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _fan_in_out(shape: tuple[int, ...]) -> tuple[int, int]:
    # torch convention for conv weights [out, in, *kernel]
    receptive = 1
    for s in shape[2:]:
        receptive *= s
    fan_in = shape[1] * receptive if len(shape) > 1 else shape[0]
    fan_out = shape[0] * receptive
    return fan_in, fan_out


def kaiming_uniform(key, shape, a: float = math.sqrt(5), dtype=jnp.float32):
    """torch.nn.Conv1d/Linear default weight init (kaiming_uniform_, a=sqrt(5))."""
    fan_in, _ = _fan_in_out(shape)
    gain = math.sqrt(2.0 / (1 + a * a))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def default_bias(key, shape, weight_shape, dtype=jnp.float32):
    """torch default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    fan_in, _ = _fan_in_out(weight_shape)
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def kaiming_normal(key, shape, nonlinearity: str = "relu", dtype=jnp.float32):
    """nn.init.kaiming_normal_ (fan_in mode)."""
    fan_in, _ = _fan_in_out(shape)
    gain = {"relu": math.sqrt(2.0), "linear": 1.0, "leaky_relu": math.sqrt(2.0 / (1 + 0.01 ** 2))}[nonlinearity]
    std = gain / math.sqrt(fan_in)
    return jax.random.normal(key, shape, dtype) * std


def xavier_uniform(key, shape, gain: float = 1.0, dtype=jnp.float32):
    fan_in, fan_out = _fan_in_out(shape)
    bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def normal(key, shape, mean: float = 0.0, std: float = 1.0, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * std + mean


def uniform(key, shape, a: float = 0.0, b: float = 1.0, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, a, b)


def zeros(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)


def embedding_normal(key, shape, padding_idx: int | None = None, dtype=jnp.float32):
    """nn.Embedding default init N(0,1), row padding_idx zeroed."""
    w = jax.random.normal(key, shape, dtype)
    if padding_idx is not None:
        w = w.at[padding_idx].set(0.0)
    return w
