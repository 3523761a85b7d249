"""Optimizers and LR schedules.

optax equivalents of the reference's AdamW + schedulers
(`/root/reference/utils/nn/schedulers.py:1-57`, torch StepLR, and the Emformer
warmup+stepwise-decay LambdaLR `tasks/Emformer/Emformer.py:474-491`).

Schedules are pure functions of the update count, so the whole optimizer
update stays inside the jitted train step.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def none_schedule(lr: float):
    return lambda step: jnp.asarray(lr)


def warmup_schedule(lr: float, warmup_updates: int = 4000):
    def f(step):
        warm = jnp.minimum(step / warmup_updates, 1.0)
        return jnp.maximum(lr * warm, 1e-7)
    return f


def rsqrt_schedule(lr: float, warmup_updates: int, hidden_size: int):
    def f(step):
        warm = jnp.minimum(step / warmup_updates, 1.0)
        rsqrt_decay = jnp.maximum(jnp.asarray(warmup_updates, jnp.float32), step) ** -0.5
        return jnp.maximum(lr * warm * rsqrt_decay * hidden_size ** -0.5, 1e-7)
    return f


def step_lr_schedule(lr: float, step_size: int, gamma: float):
    def f(step):
        return lr * gamma ** jnp.floor(step / step_size)
    return f


def emformer_distill_schedule(lr: float, warmup_steps: int = 20000,
                              warmup_init_lr: float = 1e-7, lr_decay: float = 0.995,
                              decay_interval: int = 2500, min_lr: float = 1e-6):
    def f(step):
        frac = step / warmup_steps
        warm = warmup_init_lr + (lr - warmup_init_lr) * frac
        decay_steps = jnp.floor(jnp.maximum(step - warmup_steps, 0) / decay_interval)
        decayed = jnp.maximum(lr * lr_decay ** decay_steps, min_lr)
        return jnp.where(step < warmup_steps, warm, decayed)
    return f


def build_schedule(hp) -> optax.Schedule:
    """Generator schedule selection (tasks/tts/speech_base.py:156-165)."""
    name = hp.get("scheduler", "none")
    if name == "rsqrt":
        return rsqrt_schedule(hp["lr"], hp.get("warmup_updates", 4000), hp["hidden_size"])
    if name == "warmup":
        return warmup_schedule(hp["lr"], hp.get("warmup_updates", 4000))
    if name == "step_lr":
        return step_lr_schedule(hp["lr"], 500, 0.998)
    return none_schedule(hp["lr"])


def adamw(schedule, *, b1: float = 0.9, b2: float = 0.98, eps: float = 1e-8,
          weight_decay: float = 0.0, clip_norm: float = 0.0,
          accumulate_steps: int = 1) -> optax.GradientTransformation:
    """torch.AdamW semantics: decoupled weight decay scaled by lr; optional
    global-norm clipping (reference clip_grad_norm before step) and gradient
    accumulation (reference accumulate_grad_batches, trainer.py:339,366)."""
    chain = []
    if clip_norm and clip_norm > 0:
        chain.append(optax.clip_by_global_norm(clip_norm))
    chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_learning_rate(schedule))
    tx = optax.chain(*chain)
    if accumulate_steps and accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx
