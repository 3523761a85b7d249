"""Validation functions per task.

Reference semantics (`/root/reference/tasks/Conan/Conan.py:191-212`,
`tasks/vocoder/hifigan.py:222-230`, `tasks/Emformer/Emformer.py:279-359`):
evaluate a handful of validation batches, log losses, and for the acoustic
model synthesize audio through the vocoder for qualitative checks (wav files
written under ``<work_dir>/valid_wavs`` instead of TensorBoard audio tabs).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from conan_tpu.train import losses as L


def _save_mel_plot(work_dir: str, step: int, idx: int, mel_pred: np.ndarray,
                   mel_gt: np.ndarray) -> None:
    """gt/pred mel figure (reference plot_mel, speech_base.py:255-270) saved
    as a PNG under <work_dir>/valid_plots."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    d = os.path.join(work_dir, "valid_plots")
    os.makedirs(d, exist_ok=True)
    fig, axes = plt.subplots(2, 1, figsize=(10, 5), sharex=True)
    axes[0].imshow(mel_gt, origin="lower", aspect="auto")
    axes[0].set_title("gt")
    axes[1].imshow(mel_pred, origin="lower", aspect="auto")
    axes[1].set_title("pred")
    fig.tight_layout()
    fig.savefig(os.path.join(d, f"step{step}_b{idx}.png"), dpi=80)
    plt.close(fig)


def make_emformer_valid_fn(task, valid_batches: list[dict]):
    def valid_fn(state, step: int) -> dict:
        ce_sum, acc_sum, n = 0.0, 0.0, 0
        for batch in valid_batches:
            loss, acc = task._loss(state["params"],
                                   {k: jnp.asarray(v) for k, v in batch.items()
                                    if isinstance(v, np.ndarray)})
            ce_sum += float(loss)
            acc_sum += float(acc)
            n += 1
        return {"ce": ce_sum / max(n, 1), "acc": acc_sum / max(n, 1)}

    return valid_fn


def make_conan_valid_fn(task, valid_batches: list[dict], *, work_dir: str | None = None,
                        vocoder=None, vocoder_params=None, num_plots: int = 4,
                        sample_rate: int = 16000):
    """Full-utterance inference on validation items + optional vocoder audio
    (reference ConanTask.validation_step)."""

    def valid_fn(state, step: int) -> dict:
        metrics: dict[str, float] = {}
        n = 0
        for bi, batch in enumerate(valid_batches):
            out = task.model.apply(
                state["params_g"], jnp.asarray(batch["content"]),
                ref=jnp.asarray(batch["ref_mels"]), vq_state=state["vq_state"],
                infer=True, global_step=200000,
                rng=jax.random.PRNGKey(step + bi))
            losses = {}
            L.add_mel_losses(out["mel_out"], jnp.asarray(batch["mels"]),
                             task.hp.get("mel_losses", "l1:0.5|ssim:0.5"), losses)
            for k, v in losses.items():
                metrics[k] = metrics.get(k, 0.0) + float(v)
            n += 1
            if work_dir is not None and bi < num_plots:
                _save_mel_plot(work_dir, step, bi,
                               np.asarray(out["mel_out"][0]).T,
                               np.asarray(batch["mels"][0]).T)
            if vocoder is not None and bi < num_plots and work_dir is not None:
                wav = vocoder.apply(vocoder_params, out["mel_out"][:1])
                d = os.path.join(work_dir, "valid_wavs")
                os.makedirs(d, exist_ok=True)
                from conan_tpu.infer.run_vc import save_wav

                save_wav(os.path.join(d, f"step{step}_b{bi}.wav"),
                         np.asarray(wav[0, :, 0]), sample_rate)
        return {k: v / max(n, 1) for k, v in metrics.items()}

    return valid_fn


def make_vocoder_valid_fn(task, valid_batches: list[dict]):
    def valid_fn(state, step: int) -> dict:
        tot, n = {}, 0
        for batch in valid_batches:
            gtot, (gl, _) = task._gen_losses(state["params_g"], state["params_d"],
                                             jnp.asarray(batch["mels"]),
                                             jnp.asarray(batch["wavs"]))
            for k, v in gl.items():
                tot[k] = tot.get(k, 0.0) + float(v)
            tot["total"] = tot.get("total", 0.0) + float(gtot)
            n += 1
        return {k: v / max(n, 1) for k, v in tot.items()}

    return valid_fn
