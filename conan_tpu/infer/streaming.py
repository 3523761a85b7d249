"""Streaming voice-conversion engine — the serving hot loop.

Chains the three stages per 80 ms chunk like the reference engine
(`/root/reference/inference/Conan.py:20-187`) but with O(chunk) incremental
state instead of the reference's O(T²) full-prefix re-runs:

  reference per chunk:  emformer.infer → append code → re-run FULL-prefix
                        acoustic model → re-run FULL-prefix vocoder → slice
  here per chunk:       ONE jitted fused step: emformer KV-cache step →
                        argmax codes → acoustic chunk step (carried conv
                        state) → vocoder chunk step (carried conv state)

Prefix-consistency of every stage (property-tested per model) makes the
incremental output exactly equal the reference's recompute-everything scheme.

All state lives on device between chunks; per chunk exactly one host→device
transfer (the 6 mel frames) and one device→host transfer (1280 samples).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from conan_tpu.audio.mel import MelConfig, wav2mel_frontend
from conan_tpu.models.conan.model import Conan, ConanConfig
from conan_tpu.models.emformer import EmformerConfig, EmformerDistillModel
from conan_tpu.models.vocoder.hifigan import HifiGanConfig, HifiGanGenerator

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class StreamingConfig:
    mel: MelConfig = MelConfig()
    emformer: EmformerConfig = EmformerConfig()
    conan: ConanConfig = ConanConfig()
    vocoder: HifiGanConfig = HifiGanConfig()

    @property
    def seg(self) -> int:
        return self.emformer.segment_length

    @property
    def rc(self) -> int:
        return self.emformer.right_context_length


class StreamingVoiceConversion:
    """Batched multi-stream engine: B concurrent conversions per step.

    Weights come from three separately trained checkpoints (reference
    composition, `inference/Conan.py:34-52`).

    ``serving_precision``:
      "exact" (default) — every matmul at HIGHEST (f32-grade MXU passes);
        streaming output == offline output at allclose grade, the §4
        prefix-consistency invariant of the reference held bit-for-bit.
      "high" — the Emformer stays HIGHEST while the acoustic model and
        vocoder run lax.Precision.HIGH (the 3-pass bf16 emulation, ~f32-grade
        mantissa over the dominant terms at ~3x the bf16 FLOP cost instead of
        HIGHEST's 6 passes).  The middle rung of the ladder: codes stay exact
        by construction, the waveform tracks the exact mode far tighter than
        fast, and the vocoder-bound chunk step (tools/SERVING_PARTS_B64.json:
        94% vocoder at B=64) sheds about half its matmul time.  Measured
        capacity/quality rows: tools/SERVING_LADDER.json.
      "fast" — the Emformer stays HIGHEST (its argmax CODES are the one
        discretization in the pipeline: bf16 drift flips them, an audible
        discrete error) while the acoustic model and vocoder matmuls run the
        TPU-native bf16 DEFAULT.  The waveform is no longer bit-equal to
        offline but the capacity ceiling rises ~4x (the chunk step is
        fp32-emulation FLOP-bound at high stream counts; see
        tools/SERVING_FAST.json for the measured capacity + quality deltas).
    """

    def __init__(self, cfg: StreamingConfig, emformer_params, conan_params,
                 conan_vq_state, vocoder_params,
                 serving_precision: str = "exact"):
        if serving_precision not in ("exact", "high", "fast"):
            raise ValueError(f"serving_precision: {serving_precision}")
        self.serving_precision = serving_precision
        self.cfg = cfg
        self.emformer = EmformerDistillModel(cfg.emformer)
        self.conan = Conan(cfg.conan)
        self.vocoder = HifiGanGenerator(cfg.vocoder)
        # inference-only weight-norm pre-folding: drops the per-step
        # g·v/||v|| recompose sweeps (identical outputs — the folded weight
        # is the same arithmetic computed once; tools/VOC_CEILING.json
        # full_folded_wn row).  Training keeps (v, g).
        from conan_tpu.ops.conv import fold_weight_norm

        conan_params = fold_weight_norm(conan_params)
        vocoder_params = fold_weight_norm(vocoder_params)
        self.p_emformer = emformer_params
        self.p_conan = conan_params
        self.vq_state = conan_vq_state
        self.p_vocoder = vocoder_params
        # params are EXPLICIT jit arguments: closing over them via self would
        # bake every weight in as a compile-time constant (observed: 450 s
        # compiles and 36 ms dispatches through the axon tunnel; with
        # params-as-args the same step compiles in seconds)
        self._params = {"emformer": emformer_params, "conan": conan_params,
                        "vq": conan_vq_state, "vocoder": vocoder_params}
        self._step_impl = jax.jit(self._chunk_step)
        self._prepare_jit = jax.jit(self._prepare_impl)

    def _step(self, state, mel_chunk, style_ctx, f0_noise=None):
        if f0_noise is None:
            f0_noise = jnp.zeros((mel_chunk.shape[0], self.cfg.seg, 1))
        return self._step_impl(self._params, state, mel_chunk, style_ctx, f0_noise)

    def _prepare(self, ref_mel):
        return self._prepare_jit(self._params, ref_mel)

    def shard_streams(self, mesh, axis: str = "data") -> None:
        """Scale-out serving: shard the stream (batch) dimension of every
        per-chunk input/output over a device mesh, params replicated — N
        concurrent conversions run data-parallel across chips (SURVEY.md §2.4
        TPU equivalents: vocoder/style encoder replicated, per-stream state
        device-resident). Call before ``infer_once`` with B a multiple of the
        mesh size."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        bsh = NamedSharding(mesh, P(axis))

        def by_rank(x):
            # batch-dim leaves shard; scalars (e.g. the emformer cache-length
            # counter) replicate
            return bsh if getattr(x, "ndim", 0) >= 1 else rep

        n = mesh.devices.size
        state_t = self.init_state(n)
        state_sh = jax.tree.map(by_rank, state_t)
        style_t = jax.eval_shape(self._prepare_impl, self._params,
                                 jax.ShapeDtypeStruct((n, 8, self.cfg.conan.n_mels),
                                                      jnp.float32))
        style_sh = jax.tree.map(by_rank, style_t)
        seg, rc = self.cfg.seg, self.cfg.rc
        out_t = jax.eval_shape(
            self._chunk_step, self._params, state_t,
            jax.ShapeDtypeStruct((n, seg + rc, self.cfg.conan.n_mels), jnp.float32),
            style_t, jax.ShapeDtypeStruct((n, seg, 1), jnp.float32))
        out_sh = jax.tree.map(by_rank, out_t)
        params_sh = jax.tree.map(lambda x: rep, self._params)
        self._step_impl = jax.jit(
            self._chunk_step,
            in_shardings=(params_sh, state_sh, bsh, style_sh, bsh),
            out_shardings=out_sh,
        )
        self._prepare_jit = jax.jit(self._prepare_impl,
                                    in_shardings=(params_sh, bsh),
                                    out_shardings=style_sh)

    # ------------------------------------------------------------------
    def _prepare_impl(self, params: dict, ref_mel: Array) -> dict:
        return self.conan.prepare_style(params["conan"], params["vq"], ref_mel)

    def init_state(self, batch: int) -> dict:
        return {
            "emformer": self.emformer.init_state(batch),
            "conan": self.conan.init_stream_state(batch),
            "vocoder": self.vocoder.init_state(batch),
        }

    def _chunk_step(self, params: dict, state: dict, mel_chunk: Array,
                    style_ctx: dict, f0_noise: Array):
        """mel_chunk [B, seg+rc, 80], f0_noise [B, seg, 1] (this chunk's slice
        of the per-utterance rectified-flow x0; ignored unless f0_gen='flow')
        → (wav [B, seg*hop, 1], codes, state').

        Precision scopes are TRACE-time (ops/precision.py): in fast mode only
        the continuous-output stages drop to bf16; the Emformer's discrete
        code path keeps f32-grade matmuls."""
        from conan_tpu.ops.precision import precision_scope

        logits, em_state = self.emformer.step(params["emformer"], state["emformer"],
                                              mel_chunk)
        codes = jnp.argmax(logits, axis=-1)  # [B, seg]
        stage_prec = {"exact": "highest", "high": "high",
                      "fast": "default"}[self.serving_precision]
        with precision_scope(stage_prec):
            ret, conan_state = self.conan.stream_step(params["conan"], state["conan"],
                                                      codes, style_ctx,
                                                      f0_noise=f0_noise)
            wav, voc_state = self.vocoder.step(params["vocoder"], state["vocoder"],
                                               ret["mel_out"])
        return wav, codes, {"emformer": em_state, "conan": conan_state,
                            "vocoder": voc_state}

    def stream_scan(self, state: dict, mel_chunks: Array, style_ctx: dict,
                    f0_noise_chunks: Array | None = None):
        """Run N chunk steps entirely on device via lax.scan.

        mel_chunks: [N, B, seg+rc, 80] (+ optional f0_noise_chunks
        [N, B, seg, 1]) → (wavs [N, B, seg*hop, 1], codes, final state). This
        is the device-speed path: no per-chunk host dispatch, so it
        measures/realizes the hardware per-chunk time and is the fastest way
        to batch-convert recorded audio chunkwise."""
        if f0_noise_chunks is None:
            N, B = mel_chunks.shape[:2]
            f0_noise_chunks = jnp.zeros((N, B, self.cfg.seg, 1))
        if not hasattr(self, "_scan_jit"):
            self._scan_jit = jax.jit(
                lambda params, st, chunks, style: jax.lax.scan(
                    lambda s, c: (lambda w, cd, s2: (s2, (w, cd)))(
                        *self._chunk_step(params, s, c[0], style, c[1])),
                    st, chunks))
        st, (wavs, codes) = self._scan_jit(self._params, state,
                                           (mel_chunks, f0_noise_chunks), style_ctx)
        return wavs, codes, st

    # ------------------------------------------------------------------
    def wav_to_mel(self, wav: np.ndarray) -> Array:
        """Feature frontend (reference `_wav_to_mel`, librosa log10-mel).
        wav [T] or [B, T] → [B, frames, 80]."""
        if wav.ndim == 1:
            wav = wav[None]
        return wav2mel_frontend(jnp.asarray(wav.astype(np.float32)), self.cfg.mel)

    @staticmethod
    def _p2bucket(n: int, lo: int = 64) -> int:
        b = lo
        while b < n:
            b *= 2
        return b

    def infer_once(self, src_wav: np.ndarray, ref_wav: np.ndarray,
                   collect_codes: bool = False, use_scan: bool = False,
                   rng=None, bucket_lengths: bool = False):
        """Full streaming conversion of one (or a batch of) utterance(s).

        Like the reference engine, the source mel is computed up-front and
        consumed chunkwise; the REFERENCE mel is fully available before
        streaming starts (the paper's structural insight).

        For ``f0_gen='flow'`` the per-utterance rectified-flow x0 is sampled
        up-front (same default key and derivation as ``infer_offline``, so
        streaming == offline holds for the flow path too — the reference
        likewise draws one noise per utterance,
        `/root/reference/modules/Conan/flow/flow_f0.py:124-145`) and sliced
        chunk-by-chunk into the fused step.

        ``use_scan=True`` runs the chunk loop on-device via lax.scan —
        identical output, and immune to per-chunk host-dispatch overhead
        (preferred for recorded-file batch conversion; the python loop is the
        live-streaming shape where chunks arrive in real time).

        ``bucket_lengths=True`` pads the ref mel (zeros — the style/prosody
        encoders mask zero frames) and, on the scan path, the source length
        (edge frames — every source-side op is causal) onto power-of-two
        ladders, so batch conversion over many utterance lengths compiles a
        handful of XLA programs instead of one per length; output is
        unchanged (prefix consistency, property-tested)."""
        cfg = self.cfg
        seg, rc = cfg.seg, cfg.rc
        src_mel = self.wav_to_mel(src_wav)
        ref_mel = self.wav_to_mel(ref_wav)
        if bucket_lengths:
            ref_mel = jnp.pad(ref_mel, ((0, 0), (0, self._p2bucket(
                ref_mel.shape[1]) - ref_mel.shape[1]), (0, 0)))
        style_ctx = self._prepare(ref_mel)
        B, T, _ = src_mel.shape
        # pad so T is a segment multiple, then add rc lookahead tail by
        # repeating the last frame (reference tail behavior)
        T_pad = ((T + seg - 1) // seg) * seg
        if bucket_lengths and use_scan:
            T_pad = self._p2bucket(T_pad)
        pad_tail = jnp.repeat(src_mel[:, -1:], T_pad - T + rc, axis=1)
        mel_ext = jnp.concatenate([src_mel, pad_tail], axis=1)  # [B, T_pad+rc, 80]
        if cfg.conan.f0_gen == "flow":
            if rng is None:
                rng = jax.random.PRNGKey(0)
            noise_full = self.conan.sample_f0_noise(rng, B, T_pad)
        else:
            noise_full = jnp.zeros((B, T_pad, 1))
        state = self.init_state(B)
        if use_scan:
            n = T_pad // seg
            idx = (np.arange(n)[:, None] * seg + np.arange(seg + rc)[None, :])
            chunks = jnp.moveaxis(mel_ext[:, idx], 1, 0)  # [N, B, seg+rc, 80]
            noise_chunks = jnp.moveaxis(
                noise_full.reshape(B, n, seg, 1), 1, 0)  # [N, B, seg, 1]
            wavs, codes, state = self.stream_scan(state, chunks, style_ctx,
                                                  noise_chunks)
            wav_out = jnp.moveaxis(wavs, 0, 1).reshape(B, -1, 1)[:, : T * cfg.mel.hop, 0]
            if collect_codes:
                codes_full = jnp.moveaxis(codes, 0, 1).reshape(B, -1)[:, :T]
                return np.asarray(wav_out), np.asarray(codes_full)
            return np.asarray(wav_out)
        wav_chunks = []
        codes_all = []
        for s in range(0, T_pad, seg):
            wav, codes, state = self._step(state, mel_ext[:, s:s + seg + rc],
                                           style_ctx, noise_full[:, s:s + seg])
            wav_chunks.append(wav)
            if collect_codes:
                codes_all.append(codes)
        wav_out = jnp.concatenate(wav_chunks, axis=1)[:, : T * cfg.mel.hop, 0]
        if collect_codes:
            return np.asarray(wav_out), np.asarray(jnp.concatenate(codes_all, 1))[:, :T]
        return np.asarray(wav_out)

    # ------------------------------------------------------------------
    def infer_offline(self, src_wav: np.ndarray, ref_wav: np.ndarray,
                      rng=None, bucket_lengths: bool = False) -> np.ndarray:
        """Non-streaming composition of the three stages (for equivalence
        checks and offline batch conversion). ``rng`` seeds the rectified-flow
        x0 when the acoustic model uses f0_gen='flow' (fixed key by default so
        the path is deterministic).  ``bucket_lengths`` as in infer_once."""
        cfg = self.cfg
        seg, rc = cfg.seg, cfg.rc
        src_mel = self.wav_to_mel(src_wav)
        ref_mel = self.wav_to_mel(ref_wav)
        if bucket_lengths:
            ref_mel = jnp.pad(ref_mel, ((0, 0), (0, self._p2bucket(
                ref_mel.shape[1]) - ref_mel.shape[1]), (0, 0)))
        B, T, _ = src_mel.shape
        T_pad = ((T + seg - 1) // seg) * seg
        if bucket_lengths:
            T_pad = self._p2bucket(T_pad)
        pad_tail = jnp.repeat(src_mel[:, -1:], T_pad - T + rc, axis=1)
        mel_ext = jnp.concatenate([src_mel, pad_tail], axis=1)
        logits = self.emformer.apply(self.p_emformer, mel_ext)
        codes = jnp.argmax(logits, axis=-1)
        if rng is None and cfg.conan.f0_gen == "flow":
            rng = jax.random.PRNGKey(0)
        ret = self.conan.apply(self.p_conan, codes, ref=ref_mel,
                               vq_state=self.vq_state, infer=True,
                               global_step=200000, rng=rng)
        wav = self.vocoder.apply(self.p_vocoder, ret["mel_out"])
        return np.asarray(wav[:, : T * cfg.mel.hop, 0])


def random_engine(cfg: StreamingConfig | None = None, seed: int = 0,
                  serving_precision: str = "exact") -> StreamingVoiceConversion:
    """Engine with random weights — for benchmarks and pipeline tests.

    Inits are jitted: one compile + one dispatch instead of hundreds of
    per-parameter RNG ops (each costing a tunnel round-trip on axon)."""
    cfg = cfg or StreamingConfig()
    k = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    em = EmformerDistillModel(cfg.emformer)
    co = Conan(cfg.conan)
    vo = HifiGanGenerator(cfg.vocoder)
    return StreamingVoiceConversion(
        cfg, jax.jit(em.init)(k1), jax.jit(co.init)(k2),
        jax.jit(co.init_vq_state)(k3), jax.jit(vo.init)(k4),
        serving_precision=serving_precision)
