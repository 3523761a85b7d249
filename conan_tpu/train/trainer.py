"""Trainer: compiled-step loop with validation, checkpointing, and metrics.

Replaces the reference Trainer (`/root/reference/utils/commons/trainer.py:
45-559`): no epoch machinery or DDP process spawning — one single-controller
process drives a jitted data-parallel train step over the mesh; resume finds
the newest ``model_ckpt_steps_*.ckpt`` automatically (trainer.py:153-163);
metrics stream to ``<work_dir>/metrics.jsonl`` (+ optional TensorBoard if the
package is present) with running-average meters (reference meters.py).
"""

from __future__ import annotations

import json
import logging
import os
import time
from collections import defaultdict

import numpy as np
import jax

from conan_tpu.parallel import make_mesh, replicate, shard_batch, shard_train_step
from conan_tpu.train.checkpoint import get_last_checkpoint, save_checkpoint

log = logging.getLogger(__name__)


class AvgMeter:
    """Running average (reference meters.py:5-18)."""

    def __init__(self):
        self.sum = 0.0
        self.cnt = 0

    def update(self, v, n: int = 1):
        self.sum += float(v) * n
        self.cnt += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.cnt, 1)


class Trainer:
    def __init__(self, task, hp, work_dir: str, *, mesh=None,
                 static_step_kwargs: dict | None = None):
        self.task = task
        self.hp = hp
        self.work_dir = work_dir
        os.makedirs(work_dir, exist_ok=True)
        self.mesh = mesh or make_mesh()
        self.max_updates = hp.get("max_updates", 1000000)
        self.val_check_interval = hp.get("val_check_interval", 2000)
        self.tb_log_interval = hp.get("tb_log_interval", 100)
        self.num_ckpt_keep = hp.get("num_ckpt_keep", 3)
        self.seed = hp.get("seed", 1234)
        self._metrics_f = open(os.path.join(work_dir, "metrics.jsonl"), "a")
        self._compiled = {}
        self._static_kwargs = static_step_kwargs or {}
        self._tb = None
        try:  # optional TensorBoard (torch's writer is available in this image)
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(os.path.join(work_dir, "tb"))
        except Exception:
            pass
        self.valid_monitor_key = hp.get("valid_monitor_key", "val_loss")
        self.save_best = hp.get("save_best", False)
        self._best = float("inf")
        self._snapshot_code()

    def _snapshot_code(self) -> None:
        """Archive the framework + configs into the exp dir (reference
        save_codes rsync, trainer.py:543-559) — once per work_dir."""
        import shutil

        dst = os.path.join(self.work_dir, "codes.zip")
        if os.path.exists(dst):
            return
        try:
            import conan_tpu

            pkg_root = os.path.dirname(os.path.dirname(conan_tpu.__file__))
            tmp = os.path.join(self.work_dir, "_codes_tmp")
            os.makedirs(tmp, exist_ok=True)
            for name in ("conan_tpu", "egs"):
                src = os.path.join(pkg_root, name)
                if os.path.isdir(src):
                    shutil.copytree(src, os.path.join(tmp, name), dirs_exist_ok=True,
                                    ignore=shutil.ignore_patterns("__pycache__", "*.so"))
            shutil.make_archive(dst[:-4], "zip", tmp)
            shutil.rmtree(tmp)
        except Exception as e:
            log.warning("code snapshot failed: %s", e)

    # ------------------------------------------------------------------
    def _get_step_fn(self, **static_kwargs):
        key = tuple(sorted(static_kwargs.items()))
        if key not in self._compiled:
            if static_kwargs:
                import functools

                fn = functools.partial(self.task.train_step, **static_kwargs)
            else:
                fn = self.task.train_step
            self._compiled[key] = shard_train_step(fn, self.mesh)
        return self._compiled[key]

    def _hook_due(self, step: int) -> bool:
        """Run the task host hook from its trigger step onward (until the hook
        reports done) — D2H round trips are expensive on tunneled devices, so
        don't touch device state before the boundary."""
        vq_start = self.hp.get("vq_start", None)
        if vq_start is None:
            return False
        return step >= max(int(vq_start), 0) + 1

    def _log(self, step: int, metrics: dict, prefix: str = "tr") -> None:
        rec = {"step": step, "prefix": prefix,
               **{k: float(v) for k, v in metrics.items()}}
        self._metrics_f.write(json.dumps(rec) + "\n")
        self._metrics_f.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(f"{prefix}/{k}", float(v), step)

    # ------------------------------------------------------------------
    def fit(self, train_iter, valid_fn=None) -> dict:
        """train_iter yields numpy batch dicts; valid_fn(state, step) -> dict
        of validation metrics (optional)."""
        hp = self.hp
        state = self.task.init_state(jax.random.PRNGKey(self.seed))
        ckpt, path = get_last_checkpoint(self.work_dir)
        if ckpt is not None:
            log.info("resuming from %s (step %d)", path, ckpt["global_step"])
            state = ckpt["state"]
        state = replicate(state, self.mesh)
        step = int(np.asarray(jax.device_get(state["step"])))
        rng = jax.random.PRNGKey(self.seed + 17)
        meters: dict[str, AvgMeter] = defaultdict(AvgMeter)
        t_last = time.time()
        if valid_fn is not None and self.hp.get("num_sanity_val_steps", 0) != 0:
            # crash-early sanity validation (reference trainer.py:259-261)
            vm = valid_fn(jax.device_get(state), step)
            self._log(step, vm, prefix="sanity")
        hook_done = not hasattr(self.task, "host_hook")
        pending: list[dict] = []  # device-resident per-step metrics — read back
        # only at the log interval so the hot loop never blocks on the device
        # (a per-step device_get would forfeit async-dispatch pipelining; on
        # tunneled devices it also flips dispatch into ~40 ms sync mode)
        for batch in train_iter:
            if step >= self.max_updates:
                break
            if not hook_done and self._hook_due(step):
                new, hook_done = self.task.host_hook(state, step, batch)
                if new is not None:
                    state = replicate(new, self.mesh)
            static = dict(self._static_kwargs)
            if "use_random_ref_after" in static:
                thr = static.pop("use_random_ref_after")
                static["use_random_ref"] = step >= thr
            step_fn = self._get_step_fn(**static)
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, shard_batch(batch, self.mesh),
                                     replicate(sub, self.mesh))
            step += 1
            pending.append(metrics)
            if step % self.tb_log_interval == 0:
                for m in jax.device_get(pending):
                    for k, v in m.items():
                        meters[k].update(v)
                pending.clear()
                avg = {k: m.avg for k, m in meters.items()}
                avg["steps_per_s"] = self.tb_log_interval / (time.time() - t_last)
                t_last = time.time()
                if avg.get("skipped", 0.0) > 0:
                    # NaN-gated updates were skipped inside the jitted step —
                    # surface it loudly (reference prints + exits on NaN
                    # grads, trainer.py:356-363; we skip-and-continue but must
                    # not look like healthy training)
                    log.warning("step %d: %.0f of the last %d updates were "
                                "SKIPPED (non-finite grads)", step,
                                avg["skipped"] * self.tb_log_interval,
                                self.tb_log_interval)
                self._log(step, avg)
                log.info("step %d: %s", step,
                         " ".join(f"{k}={v:.4f}" for k, v in avg.items()))
                meters.clear()
            if step % self.val_check_interval == 0:
                host_state = jax.device_get(state)
                if valid_fn is not None:
                    vm = valid_fn(host_state, step)
                    self._log(step, vm, prefix="val")
                    monitored = vm.get(self.valid_monitor_key,
                                       sum(vm.values()) if vm else None)
                    if (self.save_best and monitored is not None
                            and monitored < self._best):
                        # reference model_ckpt_best.pt (trainer.py:431-449)
                        self._best = monitored
                        save_checkpoint(self.work_dir, step, host_state,
                                        hp if isinstance(hp, dict) else hp.to_dict(),
                                        num_keep=1, prefix="model_ckpt_best")
                save_checkpoint(self.work_dir, step, host_state,
                                hp if isinstance(hp, dict) else hp.to_dict(),
                                num_keep=self.num_ckpt_keep)
        final = jax.device_get(state)
        save_checkpoint(self.work_dir, step, final,
                        hp if isinstance(hp, dict) else hp.to_dict(),
                        num_keep=self.num_ckpt_keep)
        return final
