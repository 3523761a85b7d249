"""Checkpoint I/O.

Mirrors the reference's semantics (`/root/reference/utils/commons/
ckpt_utils.py:7-95`, `trainer.py:431-470`): ``model_ckpt_steps_<N>.ckpt``
naming, newest-first discovery, atomic write via ``.part`` + os.replace,
keep-newest-K retention, and sub-tree extraction by key path so separately
trained stages compose at inference (reference loads 3 checkpoint dirs).

Format: a single pickle of {"global_step", "state": pytree of np arrays,
"hparams": dict} — the pytree structure IS the public contract (it matches
each task's ``init_state``)."""

from __future__ import annotations

import glob
import os
import pickle
import re

import numpy as np
import jax


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(work_dir: str, global_step: int, state, hparams: dict | None = None,
                    num_keep: int = 3, prefix: str = "model_ckpt_steps") -> str:
    os.makedirs(work_dir, exist_ok=True)
    path = os.path.join(work_dir, f"{prefix}_{global_step}.ckpt")
    tmp = path + ".part"
    with open(tmp, "wb") as f:
        pickle.dump({"global_step": int(global_step), "state": _to_numpy(state),
                     "hparams": dict(hparams) if hparams else None}, f)
    os.replace(tmp, path)
    for old in get_all_checkpoints(work_dir, prefix)[num_keep:]:
        os.remove(old)
    return path


def get_all_checkpoints(work_dir: str, prefix: str = "model_ckpt_steps") -> list[str]:
    """Newest-first (reference ckpt_utils.py:16-24)."""
    paths = glob.glob(os.path.join(work_dir, f"{prefix}_*.ckpt"))
    return sorted(paths, key=lambda p: -int(re.findall(r"_(\d+)\.ckpt", p)[0]))


def get_last_checkpoint(work_dir: str, steps: int | None = None,
                        prefix: str = "model_ckpt_steps"):
    """Returns (ckpt_dict, path) or (None, None)."""
    if steps is not None and steps > 0:
        path = os.path.join(work_dir, f"{prefix}_{steps}.ckpt")
        paths = [path] if os.path.exists(path) else []
    else:
        paths = get_all_checkpoints(work_dir, prefix)
    if not paths:
        return None, None
    with open(paths[0], "rb") as f:
        return pickle.load(f), paths[0]


def extract_subtree(state: dict, key_path: str):
    """'params_g' or 'params_g/decoder' → sub-pytree (the analog of the
    reference's prefix-based sub-module extraction, ckpt_utils.py:35-47)."""
    node = state
    for part in key_path.split("/"):
        if part:
            node = node[part]
    return node


def load_ckpt_state(work_dir: str, key_path: str = "", steps: int | None = None):
    ckpt, path = get_last_checkpoint(work_dir, steps)
    if ckpt is None:
        raise FileNotFoundError(f"no checkpoint in {work_dir}")
    state = ckpt["state"]
    return extract_subtree(state, key_path) if key_path else state
