"""Tiny functional-module substrate.

Modules are frozen dataclass *configs* with ``init(key) -> params`` and
``apply(params, ...)`` methods; params are nested dicts of arrays (pytrees).
Streaming modules additionally expose ``init_state(batch) -> state`` and run
their forward through a `Stream` context that threads per-conv carries, so the
offline and streaming code paths are literally the same function — which is
what makes the streaming≡offline invariant (reference harness
`/root/reference/modules/vocoder/hifigan/hifigan_causal.py:603-680`) hold by
construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from conan_tpu import ops

Array = jax.Array
Params = dict
State = dict


class Stream:
    """Carries streaming state through a forward pass.

    ``Stream(None)`` = offline mode: causal convs use left zero-padding.
    ``Stream(state)`` = streaming mode: causal convs consume/update their
    input-tail carry keyed by a unique path string.
    """

    __slots__ = ("state", "new_state")

    def __init__(self, state: State | None = None):
        self.state = state
        self.new_state: State = {}

    @property
    def streaming(self) -> bool:
        return self.state is not None

    def causal_conv(self, path: str, x: Array, p: Params, *, dilation: int = 1,
                    weight_norm: bool = True) -> Array:
        w = ops.weight_norm_weight(p) if weight_norm else p["w"]
        b = p.get("b")
        # lane-packed fast path for 64-channel undilated convs (vocoder tail):
        # 2.3x at exact-serving precision, identical state layout, both modes
        # routed the same so streaming == offline stays exact
        # (ops/packed_conv.py, tools/TAIL_CONV.json)
        from conan_tpu.ops import packed_conv
        from conan_tpu.ops.precision import get_precision

        if packed_conv.packable(x.shape[-1], w.shape[0], w.shape[-1],
                                dilation, x.shape[1], x.shape[0]):
            if self.state is None:
                return packed_conv.packed_causal_conv1d(
                    x, w, b, precision=get_precision())
            y, carry = packed_conv.packed_causal_conv1d_step(
                x, self.state[path], w, b, precision=get_precision())
            self.new_state[path] = carry
            return y
        if self.state is None:
            return ops.causal_conv1d(x, w, b, dilation=dilation)
        y, carry = ops.causal_conv1d_step(x, self.state[path], w, b, dilation=dilation)
        self.new_state[path] = carry
        return y

def conv_state_entries(prefix: str, batch: int, in_ch: int, k: int,
                       dilation: int = 1, dtype=jnp.float32) -> State:
    return {prefix: ops.causal_conv1d_state(batch, in_ch, k, dilation, dtype)}
