"""SPMD data parallelism over a device mesh.

TPU-native replacement for the reference's single-host NCCL DDP
(`/root/reference/utils/commons/trainer.py:116-137,475-495`,
`utils/commons/ddp_utils.py`): instead of per-rank processes with bucketed
gradient all-reduce, the train step is jitted over a `jax.sharding.Mesh` with
the batch sharded on the ``data`` axis and all state replicated — XLA inserts
the gradient all-reduce (psum over ICI/DCN) automatically. Multi-host: call
``jax.distributed.initialize()`` first and the same code spans hosts (DCN),
replacing the reference's localhost-only MASTER_ADDR scheme.

The models are small (10–60 M params), so replication + DP is the right
parallelism (SURVEY.md §2.4); per-stream decode state stays device-local.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Multi-host SPMD entry: call once per host before building the mesh.

    Replaces the reference's localhost-only MASTER_ADDR/NCCL scheme
    (`trainer.py:481-485`) — after this, ``make_mesh()`` spans every chip of
    every host (ICI within hosts, DCN across), and the same jitted train step
    runs unchanged; XLA routes the gradient all-reduce over the fastest links.
    On Cloud TPU pods the arguments are auto-detected from the environment.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def make_mesh(n_devices: int | None = None, axis: str = DATA_AXIS) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]).reshape(n), (axis,))


def pad_batch_to_multiple(batch: dict, n: int) -> dict:
    """Repeat leading entries so every [B, ...] array has B % n == 0 — the
    analog of the reference's pad-to-multiple batch-list duplication
    (`dataset_utils.py:320-323`)."""
    out = {}
    for k, v in batch.items():
        if isinstance(v, (np.ndarray, jax.Array)) and getattr(v, "ndim", 0) >= 1:
            B = v.shape[0]
            r = (-B) % n
            if r:
                idx = np.arange(B + r) % B  # wrap-around repeat for tiny batches
                v = np.asarray(v)[idx]
        out[k] = v
    return out


def shard_batch(batch: dict, mesh: Mesh, axis: str = DATA_AXIS) -> dict:
    """Place each [B, ...] array batch-sharded over the data axis. Non-array
    metadata (names, python ints) is dropped — it must not enter the jitted
    step. Batches are padded to a device-count multiple."""
    n = mesh.devices.size
    sharding = NamedSharding(mesh, P(axis))
    out = {}
    for k, v in pad_batch_to_multiple(batch, n).items():
        if isinstance(v, (np.ndarray, jax.Array)) and getattr(v, "ndim", 0) >= 1:
            out[k] = jax.device_put(v, sharding)
    return out


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_train_step(train_step, mesh: Mesh, axis: str = DATA_AXIS,
                     donate_state: bool = False):
    """jit a (state, batch, rng) -> (state, metrics) step over the mesh.

    State/rng replicated, batch sharded on ``axis``. Gradients/metrics are
    averaged across shards by XLA (the loss is already a mean over the global
    batch once the batch dim is sharded).
    """
    rep = NamedSharding(mesh, P())
    bshard = NamedSharding(mesh, P(axis))
    return jax.jit(
        train_step,
        in_shardings=(rep, bshard, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate_state else (),
    )
