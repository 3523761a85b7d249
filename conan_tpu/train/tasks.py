"""Task train steps: pure jitted functions of (state, batch, rng).

TPU redesign of the reference's task layer (`/root/reference/tasks/`):
the Lightning-style mutable-task + 2-optimizer loop becomes, per task, ONE
pure ``train_step`` covering generator update, discriminator update, EMA/VQ
state updates, and every schedule gate (traced booleans) — so a single
compiled step serves all training phases, and data parallelism is just a
sharded batch dimension (gradients are summed by XLA via the mesh).

  VocoderTask   `tasks/vocoder/hifigan.py:60-230`   (GAN: MPD+MSD+mel+MRSTFT)
  ConanTask     `tasks/Conan/Conan.py:33-326`       (GAN: mel disc, schedule gates)
  EmformerTask  `tasks/Emformer/Emformer.py:15-509` (HuBERT distillation CE)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from conan_tpu.models.conan.model import Conan, ConanConfig
from conan_tpu.models.emformer import EmformerConfig, EmformerDistillModel
from conan_tpu.models.vocoder.discriminators import (MultiPeriodDiscriminator,
                                                     MultiScaleDiscriminator,
                                                     MultiWindowDiscriminator)
from conan_tpu.models.vocoder.hifigan import HifiGanConfig, HifiGanGenerator
from conan_tpu.train import losses as L
from conan_tpu.train import optim

Array = jax.Array


def _tree_finite(tree) -> Array:
    leaves = jax.tree.leaves(tree)
    ok = jnp.asarray(True)
    for x in leaves:
        ok = ok & jnp.all(jnp.isfinite(x))
    return ok


def _gated_update(ok: Array, params, updates, opt_new, opt_old):
    """NaN-grad guard (reference trainer.py:356-363): when any grad is
    non-finite (or the phase gate is off), skip BOTH the parameter update and
    the optimizer-state advance — matching the reference's skipped
    optimizer.step()."""
    new_params = jax.tree.map(lambda p, u: jnp.where(ok, p + u, p), params, updates)
    new_opt = jax.tree.map(lambda n, o: jnp.where(ok, n, o), opt_new, opt_old)
    return new_params, new_opt


# ---------------------------------------------------------------------------
# Vocoder GAN
# ---------------------------------------------------------------------------

class VocoderTask:
    def __init__(self, hp):
        self.hp = hp
        gen_type = hp.get("generator_type", "causal")
        cfg = HifiGanConfig.from_hparams(hp)
        if gen_type == "causal":
            self.gen = HifiGanGenerator(cfg)
        elif gen_type == "noncausal":  # reference tasks/vocoder/hifigan_noncausal.py
            from conan_tpu.models.vocoder.hifigan_noncausal import \
                NonCausalHifiGanGenerator

            self.gen = NonCausalHifiGanGenerator(cfg)
        else:
            raise ValueError(gen_type)
        self.use_cond_disc = bool(hp.get("use_cond_disc", False))
        self.use_spec_disc = bool(hp.get("use_spec_disc", False))
        hop = hp.get("hop_size", 320)
        self.mpd = MultiPeriodDiscriminator(use_cond=self.use_cond_disc, hop=hop)
        self.msd = MultiScaleDiscriminator(use_cond=self.use_cond_disc, hop=hop)
        if self.use_spec_disc:
            # reference: Discriminator(time_lengths=[8,16,32], freq=80,
            # hidden=128) over the loss mels (tasks/vocoder/hifigan.py:75-83).
            # Its import target (modules.fastspeech.multi_window_disc) is
            # absent from the reference tree, so this follows the in-tree
            # iclspeech discriminator semantics with the hifigan window plan.
            self.specd = MultiWindowDiscriminator(time_lengths=(8, 16, 32),
                                                  freq_length=80, hidden=128)
            from conan_tpu.audio.mel import MelConfig

            self.spec_mel_cfg = MelConfig.from_hparams(hp)
        gen_sched = optim.step_lr_schedule(
            hp["generator_optimizer_params"]["lr"],
            hp["generator_scheduler_params"]["step_size"],
            hp["generator_scheduler_params"]["gamma"])
        disc_sched = optim.step_lr_schedule(
            hp["discriminator_optimizer_params"]["lr"],
            hp["discriminator_scheduler_params"]["step_size"],
            hp["discriminator_scheduler_params"]["gamma"])
        b1, b2 = hp.get("adam_b1", 0.8), hp.get("adam_b2", 0.99)
        acc = hp.get("accumulate_grad_batches", 1)
        self.opt_g = optim.adamw(gen_sched, b1=b1, b2=b2,
                                 clip_norm=hp.get("generator_grad_norm", 10.0),
                                 accumulate_steps=acc)
        self.opt_d = optim.adamw(disc_sched, b1=b1, b2=b2,
                                 clip_norm=hp.get("discriminator_grad_norm", 1.0),
                                 accumulate_steps=acc)

    def init_state(self, key) -> dict:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        pg = self.gen.init(k1)
        pd = {"mpd": self.mpd.init(k2), "msd": self.msd.init(k3)}
        if self.use_spec_disc:
            pd["specd"] = self.specd.init(k4)
        return {"params_g": pg, "params_d": pd,
                "opt_g": self.opt_g.init(pg), "opt_d": self.opt_d.init(pd),
                "step": jnp.zeros((), jnp.int32)}

    def _spec_mel(self, wav):
        """80-bin loss mel of a waveform for the spec disc. The reference
        feeds mel_spectrogram(for_loss=use_different_mel_loss) here
        (hifigan.py:137-143) — which at 320 loss bins would not even fit its
        own freq_length=80 discriminator; the 80-bin standard mel is the only
        self-consistent reading."""
        from conan_tpu.audio.mel import wav2mel_gan

        return wav2mel_gan(wav, self.spec_mel_cfg)

    def _gen_losses(self, pg, pd, mel, y, rng):
        hp = self.hp
        y_ = self.gen.apply(pg, mel)[..., 0]  # [B, T]
        cond = mel if self.use_cond_disc else None
        out = {}
        mlp = hp["mel_loss_param"]
        out["mel"] = L.multi_res_gan_mel_loss(
            y, y_, hp["audio_sample_rate"], mlp["mel_bin"],
            tuple(mlp["fft_sizes"]), tuple(mlp["hop_sizes"]),
            tuple(mlp["win_lengths"]), hp.get("lambda_mel", 5.0))
        _, ypg, fpr, fpg = self.mpd.apply(pd["mpd"], y[..., None], y_[..., None],
                                          cond)
        _, ysg, fsr, fsg = self.msd.apply(pd["msd"], y[..., None], y_[..., None],
                                          cond)
        lam_adv = hp.get("lambda_adv", 1.0)
        out["a_p"] = L.generator_loss(ypg) * lam_adv
        out["a_s"] = L.generator_loss(ysg) * lam_adv
        if hp.get("use_fm_loss", False):
            out["fm_f"] = L.feature_loss(fpr, fpg)
            out["fm_s"] = L.feature_loss(fsr, fsg)
        if self.use_spec_disc:
            # adversarial mel term (hifigan.py:152-158): specd(y_hat_mel) vs 1
            v, _, _, fit = self.specd.apply(pd["specd"], self._spec_mel(y_),
                                            rng, train=True)
            out["a_mel"] = jnp.where(
                fit, jnp.mean(jnp.square(v - 1.0)), 0.0) * \
                hp.get("lambda_mel_adv", 1.0)
        if hp.get("use_ms_stft", False):
            sp = hp["stft_loss_param"]
            out["sc"], out["mag"] = L.multi_res_stft_loss(
                y, y_, tuple(sp["fft_sizes"]), tuple(sp["hop_sizes"]),
                tuple(sp["win_lengths"]))
        return sum(out.values()), (out, y_)

    def _disc_losses(self, pd, mel, y, y_, rng):
        cond = mel if self.use_cond_disc else None
        out = {}
        ypr, ypg, _, _ = self.mpd.apply(pd["mpd"], y[..., None], y_[..., None],
                                        cond)
        out["r_p"], out["f_p"] = L.discriminator_loss(ypr, ypg)
        ysr, ysg, _, _ = self.msd.apply(pd["msd"], y[..., None], y_[..., None],
                                        cond)
        out["r_s"], out["f_s"] = L.discriminator_loss(ysr, ysg)
        if self.use_spec_disc:
            # real-vs-fake on the loss mels (hifigan.py:181-186)
            r1, r2 = jax.random.split(rng)
            vr, _, _, fit_r = self.specd.apply(pd["specd"], self._spec_mel(y),
                                               r1, train=True)
            vf, _, _, fit_f = self.specd.apply(pd["specd"], self._spec_mel(y_),
                                               r2, train=True)
            fit = fit_r & fit_f
            out["r_mel"] = jnp.where(fit, jnp.mean(jnp.square(vr - 1.0)), 0.0)
            out["f_mel"] = jnp.where(fit, jnp.mean(jnp.square(vf)), 0.0)
        if self.use_cond_disc:
            # rolled-mel negatives: real AND fake wavs under a mismatched mel
            # are both "fake" (hifigan.py:187-196)
            mel_shift = jnp.roll(mel, -1, axis=0)
            yp1, yp2, _, _ = self.mpd.apply(pd["mpd"], y[..., None],
                                            y_[..., None], mel_shift)
            out["f_p_cd1"] = L.cond_discriminator_loss(yp1)
            out["f_p_cd2"] = L.cond_discriminator_loss(yp2)
            ys1, ys2, _, _ = self.msd.apply(pd["msd"], y[..., None],
                                            y_[..., None], mel_shift)
            out["f_s_cd1"] = L.cond_discriminator_loss(ys1)
            out["f_s_cd2"] = L.cond_discriminator_loss(ys2)
        return sum(out.values()), out

    def train_step(self, state: dict, batch: dict, rng) -> tuple[dict, dict]:
        """batch: mels [B,T,80], wavs [B,T*hop]."""
        mel, y = batch["mels"], batch["wavs"]
        step = state["step"]
        rg, rd = jax.random.split(rng if rng is not None else jax.random.PRNGKey(0))
        # ---- generator
        (gtot, (gl, y_)), grads_g = jax.value_and_grad(
            self._gen_losses, has_aux=True)(state["params_g"], state["params_d"],
                                            mel, y, rg)
        ok_g = _tree_finite(grads_g)
        upd_g, opt_g_new = self.opt_g.update(grads_g, state["opt_g"], state["params_g"])
        params_g, opt_g = _gated_update(ok_g, state["params_g"], upd_g,
                                        opt_g_new, state["opt_g"])
        # ---- discriminator (on detached y_)
        y_d = jax.lax.stop_gradient(y_)
        (dtot, dl), grads_d = jax.value_and_grad(
            self._disc_losses, has_aux=True)(state["params_d"], mel, y, y_d, rd)
        ok_d = _tree_finite(grads_d)
        upd_d, opt_d_new = self.opt_d.update(grads_d, state["opt_d"], state["params_d"])
        params_d, opt_d = _gated_update(ok_d, state["params_d"], upd_d,
                                        opt_d_new, state["opt_d"])
        metrics = {**gl, **dl, "total_g": gtot, "total_d": dtot,
                   # surfaced so the trainer can WARN about NaN-skipped
                   # updates instead of silently freezing (reference prints
                   # and exits on NaN grads, trainer.py:356-363)
                   "skipped": 1.0 - ok_g.astype(jnp.float32)}
        new_state = {"params_g": params_g, "params_d": params_d,
                     "opt_g": opt_g, "opt_d": opt_d, "step": step + 1}
        return new_state, metrics


# ---------------------------------------------------------------------------
# Conan acoustic GAN
# ---------------------------------------------------------------------------

class ConanTask:
    def __init__(self, hp):
        self.hp = hp
        self.cfg = ConanConfig.from_hparams(hp)
        self.model = Conan(self.cfg)
        self.mel_disc = MultiWindowDiscriminator(
            time_lengths=tuple([32, 64, 128][: hp.get("disc_win_num", 3)]),
            freq_length=80, hidden=hp.get("mel_disc_hidden_size", 128))
        acc = hp.get("accumulate_grad_batches", 1)
        self.opt_g = optim.adamw(optim.build_schedule(hp),
                                 b1=hp.get("optimizer_adam_beta1", 0.9),
                                 b2=hp.get("optimizer_adam_beta2", 0.98),
                                 weight_decay=hp.get("weight_decay", 0.0),
                                 clip_norm=hp.get("clip_grad_norm", 1.0),
                                 accumulate_steps=acc)
        dsp = hp.get("discriminator_scheduler_params", {"step_size": 40000, "gamma": 0.5})
        dop = hp.get("discriminator_optimizer_params", {"eps": 1e-6, "weight_decay": 0.0})
        self.opt_d = optim.adamw(
            optim.step_lr_schedule(hp.get("disc_lr", 1e-4), dsp["step_size"], dsp["gamma"]),
            b1=hp.get("optimizer_adam_beta1", 0.9), b2=hp.get("optimizer_adam_beta2", 0.98),
            eps=dop.get("eps", 1e-6), weight_decay=dop.get("weight_decay", 0.0),
            clip_norm=hp.get("clip_grad_norm", 1.0), accumulate_steps=acc)

    def init_state(self, key) -> dict:
        k1, k2, k3 = jax.random.split(key, 3)
        pg = self.model.init(k1)
        vq = self.model.init_vq_state(k2) if self.cfg.style else None
        pd = self.mel_disc.init(k3)
        return {"params_g": pg, "params_d": pd, "vq_state": vq,
                "opt_g": self.opt_g.init(pg), "opt_d": self.opt_d.init(pd),
                "step": jnp.zeros((), jnp.int32)}

    def _gen_losses(self, pg, pd, vq_state, batch, step, rng, axis_name,
                    use_random_ref):
        hp = self.hp
        content, target = batch["content"], batch["mels"]
        f0, uv = batch["f0"], batch["uv"]
        # ref = same utterance until random_speaker_steps, then a random
        # same-speaker utterance (tasks/Conan/Conan.py:76-79). The two have
        # different lengths, so the flip is a STATIC flag toggled by the
        # trainer at the phase boundary (one recompile at step 100k).
        ref = batch["ref_mels"] if use_random_ref else target
        r_model, r_disc = jax.random.split(rng)
        out = self.model.apply(pg, content, ref=ref, vq_state=vq_state,
                               spk_embed=batch.get("spk_embed"),
                               spk_id=(batch.get("spk_ids")
                                       if self.cfg.use_spk_id else None),
                               f0=f0, uv=uv, infer=False, global_step=step,
                               rng=r_model, train=True, axis_name=axis_name,
                               vq_start=hp.get("vq_start", 20500),
                               forcing_steps=hp.get("forcing", 20000))
        losses = {}
        L.add_mel_losses(out["mel_out"], target,
                         hp.get("mel_losses", "l1:0.5|ssim:0.5"), losses)
        nonpad = (content != -1).astype(jnp.float32)
        if self.cfg.f0_gen == "flow":
            losses["pflow"] = out["pflow"]
        else:
            losses["fdiff"] = out["fdiff"]
        losses["uv"] = L.masked_bce_with_logits(out["uv_pred"][:, :, 0], uv, nonpad,
                                                hp.get("lambda_uv", 1.0))
        if self.cfg.style:
            gloss_on = (step > hp.get("forcing", 20000)) & \
                       (step < hp.get("random_speaker_steps", 100000))
            losses["gloss"] = jnp.where(gloss_on, out["gloss"], 0.0)
            vq_on = step > hp.get("vq_start", 20500)
            losses["vq_loss"] = jnp.where(vq_on, out["vq_loss"], 0.0)
        # adversarial mel loss (after disc_start_steps); skipped when any
        # disc window does not fit, like the reference's validity=None path
        disc_on = step >= hp.get("disc_start_steps", 40000)
        v, _, _, fit = self.mel_disc.apply(pd, out["mel_out"], r_disc, train=True)
        adv = jnp.mean(jnp.square(v - 1.0)) * hp.get("lambda_mel_adv", 0.05)
        losses["a"] = jnp.where(disc_on & fit, adv, 0.0)
        total = sum(losses.values())
        metrics = dict(losses)
        metrics["ppl"] = out.get("ppl", 0.0)
        return total, (metrics, out)

    def _disc_losses(self, pd, mel_g, mel_p, rng):
        r1, r2 = jax.random.split(rng)
        v_r, _, _, fit_r = self.mel_disc.apply(pd, mel_g, r1, train=True)
        # reference uses fresh random windows for real and fake alike
        v_f, _, _, fit_f = self.mel_disc.apply(pd, mel_p, r2, train=True)
        out = {"r": jnp.mean(jnp.square(v_r - 1.0)), "f": jnp.mean(jnp.square(v_f))}
        return out["r"] + out["f"], (out, fit_r & fit_f)

    def host_hook(self, state: dict, step: int, batch: dict):
        """Host-side one-time VQ kmeans bootstrap at the vq_start boundary
        (reference VQEmbeddingEMA data-dependent init on the first VQ batch,
        prosody_util.py:56-65). Called by the Trainer OUTSIDE the jitted step
        from vq_start+1 onward until it reports done — so a batch with too few
        prosody frames (or a resume past the boundary) retries on the next
        batch instead of silently skipping the init.

        Returns ``(new_state | None, done)``; params stay on device — only the
        tiny ``initialized`` flag and the [N, hidden] feature matrix cross the
        tunnel.
        """
        import numpy as np

        if not self.cfg.style or state.get("vq_state") is None:
            return None, True
        if float(np.asarray(jax.device_get(state["vq_state"]["initialized"]))) != 0.0:
            return None, True  # already bootstrapped (fresh run or resume)
        ref = jnp.asarray(batch["mels"])  # same-utterance phase at vq_start
        feats = np.asarray(self.model.prosody.pre_vq(state["params_g"]["prosody"], ref))
        flat = feats.reshape(-1, feats.shape[-1])
        flat = flat[np.abs(flat).sum(-1) > 0]
        if len(flat) < self.cfg.n_vq:
            return None, False  # too few frames for kmeans; retry next batch
        vq_state = jax.device_get(state["vq_state"])
        new_vq = self.model.prosody.vq.kmeans_init_host(vq_state, flat)
        new_state = dict(state)
        new_state["vq_state"] = new_vq
        return new_state, True

    def train_step(self, state: dict, batch: dict, rng, axis_name: str | None = None,
                   use_random_ref: bool = False):
        hp = self.hp
        step = state["step"]
        rg, rd = jax.random.split(rng)
        grad_fn = jax.value_and_grad(self._gen_losses, has_aux=True)
        (gtot, (gl, out)), grads_g = grad_fn(state["params_g"], state["params_d"],
                                             state["vq_state"], batch, step, rg,
                                             axis_name, use_random_ref)
        ok_g = _tree_finite(grads_g)
        upd_g, opt_g_new = self.opt_g.update(grads_g, state["opt_g"], state["params_g"])
        params_g, opt_g = _gated_update(ok_g, state["params_g"], upd_g,
                                        opt_g_new, state["opt_g"])
        vq_state = jax.lax.stop_gradient(out["vq_state"]) if self.cfg.style else None
        # discriminator update, gated on disc_start (reference returns None
        # before disc_start_steps -> no optimizer step at all), on the
        # disc_interval grid (Conan.py:170; shipped disc_interval=1) and on
        # window fit (reference skips r/f losses when validity is None)
        disc_on = (step >= hp.get("disc_start_steps", 40000)) & (
            step % hp.get("disc_interval", 1) == 0)
        mel_p = jax.lax.stop_gradient(out["mel_out"])
        (dtot, (dl, d_fit)), grads_d = jax.value_and_grad(
            self._disc_losses, has_aux=True)(state["params_d"], batch["mels"],
                                             mel_p, rd)
        d_gate = disc_on & d_fit
        ok_d = _tree_finite(grads_d) & d_gate
        upd_d, opt_d_new = self.opt_d.update(grads_d, state["opt_d"], state["params_d"])
        params_d, opt_d = _gated_update(ok_d, state["params_d"], upd_d,
                                        opt_d_new, state["opt_d"])
        metrics = {**gl, **{f"d_{k}": jnp.where(d_gate, v, 0.0) for k, v in dl.items()},
                   "total_g": gtot,
                   "skipped": 1.0 - ok_g.astype(jnp.float32)}
        new_state = {"params_g": params_g, "params_d": params_d, "vq_state": vq_state,
                     "opt_g": opt_g, "opt_d": opt_d, "step": step + 1}
        return new_state, metrics


# ---------------------------------------------------------------------------
# Mel-postnet rectified flow (stage 4, reference VCPostnetTask
# tasks/Conan/Conan.py:328-383: frozen pretrained Conan + trainable postflow)
# ---------------------------------------------------------------------------

class PostnetTask:
    def __init__(self, hp, pretrain_params, pretrain_vq_state):
        from conan_tpu.models.conan.postnet import ConanPostnet, PostnetConfig

        self.hp = hp
        self.conan_cfg = ConanConfig.from_hparams(hp)
        self.conan = Conan(self.conan_cfg)
        # frozen backbone lives in the train STATE (not closed over) so the
        # jitted step receives it as an argument — closing over the pytree
        # would bake every weight in as a compile-time constant (CLAUDE.md)
        self.pretrain_params = pretrain_params
        self.pretrain_vq = pretrain_vq_state
        self.postnet = ConanPostnet(PostnetConfig.from_hparams(hp))
        sched = optim.step_lr_schedule(hp["lr"], hp.get("decay_steps", 50000), 0.5)
        self.opt = optim.adamw(sched, b1=0.9, b2=0.98, eps=1e-9,
                               clip_norm=hp.get("clip_grad_norm", 1.0))

    def init_state(self, key) -> dict:
        p = self.postnet.init(key)
        return {"params": p, "opt": self.opt.init(p),
                "step": jnp.zeros((), jnp.int32),
                "frozen": {"conan": self.pretrain_params, "vq": self.pretrain_vq}}

    def _loss(self, params, frozen, batch, rng):
        r1, r2 = jax.random.split(rng)
        out = self.conan.apply(frozen["conan"], batch["content"],
                               ref=batch["ref_mels"], vq_state=frozen["vq"],
                               f0=batch["f0"], uv=batch["uv"], infer=False,
                               global_step=200000, rng=r1)
        coarse = jax.lax.stop_gradient(out["mel_out"])
        dec_inp = jax.lax.stop_gradient(out["decoder_inp"])
        return self.postnet.loss(params, coarse, dec_inp, batch["mels"], r2)

    def train_step(self, state: dict, batch: dict, rng):
        loss, grads = jax.value_and_grad(self._loss)(
            state["params"], jax.lax.stop_gradient(state["frozen"]), batch, rng)
        ok = _tree_finite(grads)
        upd, opt_new = self.opt.update(grads, state["opt"], state["params"])
        params, opt = _gated_update(ok, state["params"], upd, opt_new, state["opt"])
        return ({"params": params, "opt": opt, "step": state["step"] + 1,
                 "frozen": state["frozen"]},
                {"flow": loss, "skipped": 1.0 - ok.astype(jnp.float32)})


# ---------------------------------------------------------------------------
# Emformer distillation
# ---------------------------------------------------------------------------

class EmformerTask:
    def __init__(self, hp):
        self.hp = hp
        self.cfg = EmformerConfig.from_hparams(hp)
        self.model = EmformerDistillModel(self.cfg)
        sched = optim.emformer_distill_schedule(
            hp["lr"], hp.get("warmup_steps", 20000),
            float(hp.get("warmup_init_lr", 1e-7)), hp.get("lr_decay", 0.995),
            hp.get("decay_interval", 2500), float(hp.get("min_lr", 1e-6)))
        self.opt = optim.adamw(sched, b1=hp.get("optimizer_adam_beta1", 0.9),
                               b2=hp.get("optimizer_adam_beta2", 0.98),
                               weight_decay=hp.get("weight_decay", 0.0),
                               clip_norm=hp.get("clip_grad_norm", 1.0))

    def init_state(self, key) -> dict:
        p = self.model.init(key)
        return {"params": p, "opt": self.opt.init(p),
                "step": jnp.zeros((), jnp.int32)}

    def _loss(self, params, batch):
        """mels [B, T_in, 80] (includes rc tail), content codes [B, T_utt]
        (pad -1, per-sample rc-tail truncated by the collate); masked CE +
        accuracy (Emformer.py:123-230).  No attention lengths: the reference
        passes the full padded length for every sample (all keys valid)."""
        mel, codes = batch["mels"], batch["content"]
        logits = self.model.apply(params, mel)
        T = min(logits.shape[1], codes.shape[1])
        logits, codes = logits[:, :T], codes[:, :T]
        mask = codes != -1
        # temperature-scaled CE × lambda (Emformer.py:15-46,57-58,163-165;
        # shipped values are 1.0/1.0)
        loss = L.distillation_loss(
            logits, codes, mask,
            temperature=float(self.hp.get("distillation_temperature", 1.0)))
        loss = loss * float(self.hp.get("lambda_distillation", 1.0))
        acc = L.distillation_accuracy(logits, codes, mask)
        return loss, acc

    def train_step(self, state: dict, batch: dict, rng=None):
        (loss, acc), grads = jax.value_and_grad(self._loss, has_aux=True)(
            state["params"], batch)
        ok = _tree_finite(grads)
        upd, opt_new = self.opt.update(grads, state["opt"], state["params"])
        params, opt = _gated_update(ok, state["params"], upd, opt_new, state["opt"])
        return ({"params": params, "opt": opt, "step": state["step"] + 1},
                {"ce": loss, "acc": acc,
                 "skipped": 1.0 - ok.astype(jnp.float32)})
