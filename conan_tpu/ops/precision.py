"""Global matmul/conv precision policy.

Default is HIGHEST (f32-equivalent MXU passes): the parity and streaming
invariants are allclose-grade (SURVEY.md §7). Training jobs that prefer
throughput can drop to the bf16 default inside a scope:

    with precision_scope("default"):
        state, metrics = train_step(...)   # traced under bf16 matmuls

The policy is read at TRACE time — re-jit (new step function) after changing
it; already-compiled executables keep the policy they were traced with.
"""

from __future__ import annotations

import contextlib

from jax import lax

_POLICY = lax.Precision.HIGHEST

_NAMES = {
    "default": lax.Precision.DEFAULT,
    "high": lax.Precision.HIGH,
    "highest": lax.Precision.HIGHEST,
}


def get_precision() -> lax.Precision:
    return _POLICY


def set_precision(name: str) -> None:
    global _POLICY
    _POLICY = _NAMES[name.lower()] if isinstance(name, str) else name


@contextlib.contextmanager
def precision_scope(name: str):
    global _POLICY
    old = _POLICY
    set_precision(name)
    try:
        yield
    finally:
        _POLICY = old
