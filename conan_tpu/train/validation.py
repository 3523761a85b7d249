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
                   mel_gt: np.ndarray, f0_gt: np.ndarray | None = None,
                   f0_pred: np.ndarray | None = None) -> None:
    """gt/pred mel figure with optional F0-curve overlays (reference
    plot_mel + f0-overlay save_result, speech_base.py:255-270 and
    tasks/Conan/base_gen_task.py:203-229 — parselmouth is absent here, so the
    curves are the dataset's RMVPE f0 and the model's own f0_denorm_pred)
    saved as a PNG under <work_dir>/valid_plots."""
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
    if f0_gt is not None or f0_pred is not None:
        # overlay F0 in mel-bin coordinates (reference f0_to_figure analog):
        # 0..900 Hz mapped onto the 80-bin axis for visual alignment
        n_bins = mel_gt.shape[0]
        for ax, f0 in ((axes[0], f0_gt), (axes[1], f0_pred)):
            if f0 is not None:
                curve = np.where(f0 > 0, f0 / 900.0 * (n_bins - 1), np.nan)
                ax.plot(curve[: mel_gt.shape[1]], color="white", lw=0.8)
    fig.tight_layout()
    fig.savefig(os.path.join(d, f"step{step}_b{idx}.png"), dpi=80)
    plt.close(fig)


def make_emformer_valid_fn(task, valid_batches: list[dict],
                           work_dir: str | None = None, num_dumps: int = 2):
    def valid_fn(state, step: int) -> dict:
        ce_sum, acc_sum, n = 0.0, 0.0, 0
        for bi, batch in enumerate(valid_batches):
            jb = {k: jnp.asarray(v) for k, v in batch.items()
                  if isinstance(v, np.ndarray)}
            loss, acc = task._loss(state["params"], jb)
            ce_sum += float(loss)
            acc_sum += float(acc)
            n += 1
            if work_dir is not None and bi < num_dumps:
                # predicted-vs-gt code text dumps (reference logs these to
                # TensorBoard text, tasks/Emformer/Emformer.py:312-359)
                logits = task.model.apply(state["params"], jb["mels"])
                pred = np.asarray(jnp.argmax(logits, -1)[0])
                gt = np.asarray(batch["content"][0])
                valid = gt != -1
                d = os.path.join(work_dir, "valid_codes")
                os.makedirs(d, exist_ok=True)
                with open(os.path.join(d, f"step{step}_b{bi}.txt"), "w") as f:
                    f.write("gt:   " + " ".join(map(str, gt[valid])) + "\n")
                    f.write("pred: " + " ".join(map(str, pred[: len(gt)][valid])) + "\n")
        m = {"ce": ce_sum / max(n, 1), "acc": acc_sum / max(n, 1)}
        m["val_loss"] = m["ce"]  # the monitored total (reference val_loss)
        return m

    valid_fn.batches = valid_batches
    return valid_fn


def make_conan_valid_fn(task, valid_batches: list[dict], *, work_dir: str | None = None,
                        vocoder=None, vocoder_params=None, num_plots: int = 4,
                        sample_rate: int = 16000, infer_interval: int = 1):
    """Full-utterance inference on validation items + optional vocoder audio
    (reference ConanTask.validation_step).  Plots/audio are produced on
    validations where ``step % infer_interval == 0`` (reference
    valid_infer_interval gate, speech_base.py:208-209; shipped 5000) AND —
    a deliberate deviation from reference parity — on every validation with
    ``step <= infer_interval``, so short soak runs (300 steps under a 5000
    interval) still leave audio/plot artifacts to inspect."""

    def valid_fn(state, step: int) -> dict:
        from conan_tpu.audio.pitch import denorm_f0

        metrics: dict[str, float] = {}
        plots = num_plots if (step % max(infer_interval, 1) == 0
                              or step <= infer_interval) else 0
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
            metrics["val_loss"] = metrics.get("val_loss", 0.0) + float(
                sum(losses.values()))
            n += 1
            if work_dir is not None and bi < plots:
                f0_gt = None
                if "f0" in batch and "uv" in batch:
                    f0_gt = np.asarray(denorm_f0(jnp.asarray(batch["f0"][0]),
                                                 jnp.asarray(batch["uv"][0])))
                _save_mel_plot(work_dir, step, bi,
                               np.asarray(out["mel_out"][0]).T,
                               np.asarray(batch["mels"][0]).T,
                               f0_gt=f0_gt,
                               f0_pred=np.asarray(out["f0_denorm_pred"][0]))
            if vocoder is not None and bi < plots and work_dir is not None:
                # gt + pred audio through the vocoder (reference logs both,
                # tasks/Conan/Conan.py:203-211)
                d = os.path.join(work_dir, "valid_wavs")
                os.makedirs(d, exist_ok=True)
                from conan_tpu.infer.run_vc import save_wav

                wav_p = vocoder.apply(vocoder_params, out["mel_out"][:1])
                save_wav(os.path.join(d, f"step{step}_b{bi}_pred.wav"),
                         np.asarray(wav_p[0, :, 0]), sample_rate)
                if step == 0 or not os.path.exists(
                        os.path.join(d, f"gt_b{bi}.wav")):
                    wav_g = vocoder.apply(vocoder_params,
                                          jnp.asarray(batch["mels"][:1]))
                    save_wav(os.path.join(d, f"gt_b{bi}.wav"),
                             np.asarray(wav_g[0, :, 0]), sample_rate)
        return {k: v / max(n, 1) for k, v in metrics.items()}

    valid_fn.batches = valid_batches
    return valid_fn


def make_vocoder_valid_fn(task, valid_batches: list[dict]):
    def valid_fn(state, step: int) -> dict:
        tot, n = {}, 0
        for batch in valid_batches:
            gtot, (gl, _) = task._gen_losses(state["params_g"], state["params_d"],
                                             jnp.asarray(batch["mels"]),
                                             jnp.asarray(batch["wavs"]),
                                             jax.random.PRNGKey(0))
            for k, v in gl.items():
                tot[k] = tot.get(k, 0.0) + float(v)
            tot["total"] = tot.get("total", 0.0) + float(gtot)
            n += 1
        m = {k: v / max(n, 1) for k, v in tot.items()}
        m["val_loss"] = m.get("total", 0.0)  # monitored key (reference val_loss)
        return m

    valid_fn.batches = valid_batches
    return valid_fn
