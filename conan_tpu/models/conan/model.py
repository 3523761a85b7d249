"""Conan acoustic model: content codes + reference style → mel.

TPU-native redesign of `/root/reference/modules/Conan/Conan.py:45-589` (which
subclasses the FastSpeech skeleton `modules/tts/fs.py:16-172`):

  content embedding (102×H) → causal conv proj → (+ global style vector from
  the reference mel) → (+ VQ prosody aligned onto content via cross-attention)
  → pitch head (direct regression "orig" or rectified-flow "flow") →
  pitch embedding → causal conv decoder → linear mel head.

Design deltas (SURVEY.md §7): schedule gates (vq_start / forcing) are traced
booleans selected with jnp.where so one jitted train step serves every phase;
the non-causal style/prosody encoders run once per utterance over the full
reference (available before streaming starts — the paper's key structural
insight), while the causal content→mel path supports per-chunk streaming with
carried conv state instead of the reference's O(T²) prefix re-runs.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from conan_tpu.audio.pitch import denorm_f0, f0_to_coarse
from conan_tpu.nn.blocks import (ConvBlocks, PitchPredictor, dropout, embedding,
                                 init_conv, init_embedding, init_linear, linear,
                                 nonpadding_mask, positional_embedding)
from conan_tpu.nn.module import Params, State, Stream
from conan_tpu import ops
from conan_tpu.models.conan.flow import (DiffNet, DiffNetConfig, RectifiedFlow,
                                         ReflowConfig, StreamingRectifiedFlow,
                                         minmax_denorm_f0, minmax_norm_f0)
from conan_tpu.models.conan.prosody import LocalStyleAdaptor, ProsodyAligner

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ConanConfig:
    hidden_size: int = 256
    kernel_size: int = 3
    n_mels: int = 80
    content_vocab: int = 102
    silent_token: int = 57
    style: bool = True
    use_spk_id: bool = False
    num_spk: int = 120
    n_vq: int = 512
    vae_dropout: float = 0.0
    lambda_commit: float = 0.25
    f0_gen: str = "orig"  # orig | flow
    predictor_kernel: int = 5
    predictor_grad: float = 1.0
    lambda_f0: float = 1.0
    dec_dilations: tuple[int, ...] = (1, 1, 1, 1)
    dec_kernel_size: int = 5
    dec_post_net_kernel: int = 3
    layers_in_block: int = 2
    dropout: float = 0.0
    f0_timesteps: int = 1000
    f0_k_step: int = 100
    f0_residual_layers: int = 10
    f0_residual_channels: int = 192
    f0_dilation_cycle_length: int = 4
    f0_sample_clip: bool = True
    max_source_positions: int = 2000

    @classmethod
    def from_hparams(cls, hp) -> "ConanConfig":
        return cls(
            hidden_size=hp["hidden_size"], kernel_size=hp["kernel_size"],
            n_mels=hp.get("audio_num_mel_bins", 80),
            content_vocab=hp.get("content_embedding_dim", 102),
            silent_token=hp["silent_token"], style=hp["style"],
            use_spk_id=hp.get("use_spk_id", False),
            num_spk=hp.get("num_spk", 120), n_vq=hp["nVQ"],
            vae_dropout=hp.get("vae_dropout", 0.0),
            lambda_commit=hp.get("lambda_commit", 0.25),
            f0_gen=hp["f0_gen"], predictor_kernel=hp["predictor_kernel"],
            predictor_grad=hp.get("predictor_grad", 1.0),
            lambda_f0=hp.get("lambda_f0", 1.0),
            dec_dilations=tuple(hp["dec_dilations"]),
            dec_kernel_size=hp["dec_kernel_size"],
            dec_post_net_kernel=hp.get("dec_post_net_kernel", 3),
            layers_in_block=hp["layers_in_block"], dropout=hp.get("dropout", 0.0),
            f0_timesteps=hp.get("f0_timesteps", 1000), f0_k_step=hp.get("f0_K_step", 100),
            f0_residual_layers=hp.get("f0_residual_layers", 10),
            f0_residual_channels=hp.get("f0_residual_channels", 192),
            f0_dilation_cycle_length=hp.get("f0_dilation_cycle_length", 4),
            f0_sample_clip=hp.get("f0_sample_clip", True),
        )


class Conan:
    def __init__(self, cfg: ConanConfig):
        self.cfg = cfg
        H = cfg.hidden_size
        self.global_encoder = ConvBlocks(H, H, None, 31, layers_in_block=2, num_layers=5)
        self.decoder = ConvBlocks(H, H, cfg.dec_dilations, cfg.dec_kernel_size,
                                  layers_in_block=cfg.layers_in_block,
                                  dropout=cfg.dropout,
                                  post_net_kernel=cfg.dec_post_net_kernel, causal=True)
        self.uv_predictor = PitchPredictor(H, n_layers=5, n_chans=128, odim=2,
                                           kernel_size=cfg.predictor_kernel)
        if cfg.style:
            self.prosody = LocalStyleAdaptor(H, cfg.n_vq, cfg.vae_dropout,
                                             cfg.lambda_commit)
            self.aligner = ProsodyAligner(num_layers=2, hidden=H, nhead=2)
        if cfg.f0_gen == "flow":
            self.f0_net = DiffNet(DiffNetConfig(
                in_dims=1, encoder_hidden=H,
                residual_layers=cfg.f0_residual_layers,
                residual_channels=cfg.f0_residual_channels,
                dilation_cycle_length=cfg.f0_dilation_cycle_length))
            self.f0_flow = RectifiedFlow(self.f0_net, ReflowConfig(
                timesteps=cfg.f0_timesteps, k_step=cfg.f0_k_step,
                sample_clip=cfg.f0_sample_clip))
            self.f0_stream = StreamingRectifiedFlow(self.f0_flow)

    # ----------------------------------------------------------- params
    def init(self, key) -> Params:
        cfg = self.cfg
        H = cfg.hidden_size
        keys = iter(jax.random.split(key, 16))
        p: Params = {
            # plain nn.Embedding in the reference (Conan.py:51) → std=1
            "content_embedding": init_embedding(next(keys), cfg.content_vocab, H, std=1.0),
            "content_proj": init_conv(next(keys), H, H, cfg.kernel_size,
                                      init="kaiming_relu"),
            "global_conv_in": init_conv(next(keys), H, cfg.n_mels, 1),
            "global_encoder": self.global_encoder.init(next(keys)),
            "uv_predictor": self.uv_predictor.init(next(keys)),
            # FastSpeech pitch table (fs.py:72): Embedding(300, H, pad 0)
            "pitch_embed": init_embedding(next(keys), 300, H, padding_idx=0),
            "decoder": self.decoder.init(next(keys)),
            "mel_out": init_linear(next(keys), cfg.n_mels, H),
        }
        if cfg.style:
            p["prosody"] = self.prosody.init(next(keys))
            p["l1"] = init_linear(next(keys), H, 2 * H)
            p["aligner"] = self.aligner.init(next(keys))
        if cfg.use_spk_id:
            # FastSpeech skeleton spk-id embedding (fs.py:59-60 uses
            # layers.Embedding → N(0, dim^-0.5)); summed into the style
            # vector like forward_style_embed (fs.py:113-117)
            p["spk_id_proj"] = init_embedding(next(keys), cfg.num_spk, H)
        if cfg.f0_gen == "flow":
            p["f0_net"] = self.f0_net.init(next(keys))
        return p

    def init_vq_state(self, key) -> Params:
        assert self.cfg.style
        return self.prosody.init_vq_state(key)

    # ----------------------------------------------------------- style side
    def encode_spk_embed(self, params: Params, ref: Array) -> Array:
        """ref mel [B, T, 80] → global style vector [B, 1, H]
        (Conan.py:200-219: 1×1 conv → 5-layer k=31 ConvBlocks → masked mean)."""
        nonpad = nonpadding_mask(ref)
        x = ops.conv1d(ref, params["global_conv_in"]["w"],
                       params["global_conv_in"]["b"]) * nonpad
        x = self.global_encoder.apply(params["global_encoder"], x, nonpad) * nonpad
        denom = jnp.maximum(jnp.sum(nonpad, axis=1, keepdims=True), 1.0)
        return jnp.sum(x * nonpad, axis=1, keepdims=True) / denom

    def encode_prosody(self, params: Params, vq_state: Params, ref: Array, *,
                       use_vq, train: bool = False, rng=None,
                       axis_name: str | None = None):
        """ref mel [B, Tr, 80] → (prosody keys [B, Tr//4, H], vq_loss, ppl,
        new_vq_state). Adds sinusoidal positions + the concat projection
        (Conan.py:243-245)."""
        pros, vq_loss, ppl, new_state = self.prosody.apply(
            params["prosody"], vq_state, ref, use_vq=use_vq, train=train,
            rng=rng, axis_name=axis_name)
        positions = positional_embedding(pros[:, :, 0], self.cfg.hidden_size,
                                         padding_idx=0,
                                         max_positions=self.cfg.max_source_positions + 2)
        pros = linear(jnp.concatenate([pros, positions], axis=-1), params["l1"])
        return pros, vq_loss, ppl, new_state

    # ----------------------------------------------------------- pitch head
    def _pitch_orig(self, params: Params, pitch_inp: Array, f0, uv, content, ret,
                    *, infer: bool, stream: Stream | None, rng, train: bool):
        uv_pred = self.uv_predictor.apply(params["uv_predictor"], pitch_inp,
                                          stream=stream, rng=rng, train=train)
        ret["uv_pred"] = uv_pred
        if infer:
            uv_b = uv_pred[:, :, 0] > 0
            uv_b = jnp.logical_or(uv_b, content == self.cfg.silent_token)
            f0_out = uv_pred[:, :, 1]
            ret["fdiff"] = 0.0
            return f0_out, uv_b.astype(jnp.float32)
        nonpad = (uv == 0).astype(jnp.float32)
        f0_pred = uv_pred[:, :, 1]
        ret["fdiff"] = (jnp.sum(jnp.square(f0_pred - f0) * nonpad)
                        / jnp.maximum(jnp.sum(nonpad), 1.0)) * self.cfg.lambda_f0
        return f0, uv

    def _pitch_flow(self, params: Params, pitch_inp: Array, f0, uv, content, ret,
                    *, infer: bool, rng, train: bool, initial_noise=None):
        uv_pred = self.uv_predictor.apply(params["uv_predictor"], pitch_inp,
                                          rng=rng, train=train)
        ret["uv_pred"] = uv_pred
        if infer:
            uv_b = uv_pred[:, :, 0] > 0
            uv_b = jnp.logical_or(uv_b, content == self.cfg.silent_token)
            x0 = initial_noise
            if x0 is None:
                assert rng is not None, "flow inference needs an rng for x0"
                x0 = jax.random.normal(rng, (*pitch_inp.shape[:2], 1))
            ret["initial_noise_used"] = x0
            f0_norm = self.f0_flow.sample(params["f0_net"], pitch_inp, x0)[..., 0]
            f0_out = minmax_denorm_f0(f0_norm, uv_b)
            ret["pflow"] = 0.0
            return f0_out, uv_b.astype(jnp.float32)
        nonpad = (uv == 0).astype(jnp.float32)
        norm = minmax_norm_f0(f0, uv)
        t = jax.random.randint(rng, (f0.shape[0],), 0, self.cfg.f0_timesteps)
        rng2 = jax.random.fold_in(rng, 1)
        ret["pflow"] = self.f0_flow.p_losses(params["f0_net"], norm[..., None], t,
                                             pitch_inp, rng2, nonpadding=nonpad)
        return f0, uv

    # ----------------------------------------------------------- forward
    def apply(self, params: Params, content: Array, *, ref: Array | None = None,
              spk_embed: Array | None = None, spk_id: Array | None = None,
              vq_state: Params | None = None,
              f0: Array | None = None, uv: Array | None = None,
              infer: bool = False, global_step: Array | int = 0,
              rng=None, train: bool = False, axis_name: str | None = None,
              vq_start: int = 20500, forcing_steps: int = 20000,
              initial_noise=None) -> dict:
        """Offline forward (training or full-utterance inference).

        content: [B, T] int codes (pad = -1 masked / 0 embeds like reference);
        ref: [B, Tr, 80] reference-utterance mel.
        Returns the ret dict (mel_out, uv_pred, losses, f0_denorm_pred, ...).
        """
        cfg = self.cfg
        ret: dict = {"content": content}
        tgt_nonpadding = (content != -1).astype(jnp.float32)[:, :, None]
        rngs = iter(jax.random.split(rng, 8)) if rng is not None else iter([None] * 8)

        ce = embedding(jnp.maximum(content, 0), params["content_embedding"])
        ce = ops.causal_conv1d(ce, params["content_proj"]["w"], params["content_proj"]["b"])
        ce = jax.nn.leaky_relu(ce, 0.01)
        ret["content_embed_proj"] = ce

        if spk_embed is not None:  # pre-extracted embedding (Conan.py:146-149)
            style = spk_embed if spk_embed.ndim == 3 else spk_embed[:, None, :]
        else:
            assert ref is not None
            style = self.encode_spk_embed(params, ref)
        if cfg.use_spk_id and spk_id is not None:
            # summed like the skeleton's forward_style_embed (fs.py:101-110)
            style = style + embedding(spk_id, params["spk_id_proj"])[:, None, :]
        ret["style_embed"] = style
        pitch_inp = ce + style

        new_vq_state = vq_state
        if cfg.style:
            assert ref is not None and vq_state is not None
            use_vq = jnp.asarray(infer) | (jnp.asarray(global_step) > vq_start)
            pros, vq_loss, ppl, new_vq_state = self.encode_prosody(
                params, vq_state, ref, use_vq=use_vq, train=train,
                rng=next(rngs), axis_name=axis_name)
            forcing = jnp.asarray(global_step) < forcing_steps
            if infer:
                forcing = jnp.asarray(False)
            src_pad = pitch_inp[:, :, 0] == 0.0
            pros_pad = pros[:, :, 0] == 0.0
            aligned, gloss, attn = self.aligner.apply(
                params["aligner"], pitch_inp, pros, src_pad, pros_pad,
                forcing=forcing, rng=next(rngs), train=train)
            ret.update(vq_loss=vq_loss, ppl=ppl, gloss=gloss, attn=attn)
            pitch_inp = pitch_inp + aligned
        ret["pitch_embed"] = pitch_inp

        if infer:
            f0, uv = None, None
        if cfg.predictor_grad != 1.0:
            pitch_inp_p = (jax.lax.stop_gradient(pitch_inp)
                           + cfg.predictor_grad * (pitch_inp - jax.lax.stop_gradient(pitch_inp)))
        else:
            pitch_inp_p = pitch_inp
        if cfg.f0_gen == "flow":
            f0_out, uv_out = self._pitch_flow(params, pitch_inp_p, f0, uv, content,
                                              ret, infer=infer, rng=next(rngs),
                                              train=train, initial_noise=initial_noise)
        else:
            f0_out, uv_out = self._pitch_orig(params, pitch_inp_p, f0, uv, content,
                                              ret, infer=infer, stream=None,
                                              rng=next(rngs), train=train)
        f0_denorm = denorm_f0(f0_out, uv_out)
        ret["f0_denorm_pred"] = f0_denorm
        pitch_embed_out = embedding(f0_to_coarse(f0_denorm), params["pitch_embed"])

        decoder_inp = pitch_inp + pitch_embed_out
        ret["decoder_inp"] = decoder_inp
        x = self.decoder.apply(params["decoder"], decoder_inp,
                               jnp.ones_like(decoder_inp[..., :1]),
                               rng=next(rngs), train=train)
        ret["mel_out"] = linear(x, params["mel_out"])
        ret["tgt_nonpadding"] = tgt_nonpadding
        ret["vq_state"] = new_vq_state
        return ret

    def sample_f0_noise(self, rng, batch: int, length: int) -> Array:
        """Rectified-flow x0 for ``f0_gen='flow'`` inference, with the SAME
        key derivation ``apply()`` uses internally (rngs = split(rng, 8);
        prosody and aligner each consume one when style=True, then the pitch
        head draws x0).  Generating the utterance's noise up-front through
        this helper and slicing it per chunk makes engine streaming
        bit-match engine offline — the reference samples one x0 per utterance
        too (`/root/reference/modules/Conan/flow/flow_f0.py:124-145`)."""
        idx = 2 if self.cfg.style else 0
        key = jax.random.split(rng, 8)[idx]
        return jax.random.normal(key, (batch, length, 1))

    # ----------------------------------------------------------- streaming
    def prepare_style(self, params: Params, vq_state: Params | None, ref: Array) -> dict:
        """Precompute everything derived from the reference utterance — runs
        once before streaming starts (the non-causal side of the model)."""
        style = self.encode_spk_embed(params, ref)
        out = {"style": style}
        if self.cfg.style:
            pros, _, _, _ = self.encode_prosody(params, vq_state, ref,
                                                use_vq=True, train=False)
            out["prosody"] = pros
            out["prosody_pad"] = pros[:, :, 0] == 0.0
        return out

    def init_stream_state(self, batch: int, dtype=jnp.float32) -> State:
        st: State = {}
        st["content_proj"] = ops.causal_conv1d_state(batch, self.cfg.hidden_size,
                                                     self.cfg.kernel_size, 1, dtype)
        st.update(self.uv_predictor.init_state(batch, "pp", dtype))
        st.update(self.decoder.init_state(batch, dtype))
        if self.cfg.f0_gen == "flow":
            # per-Euler-step denoiser conv carries, K-stacked
            st["f0_flow"] = self.f0_stream.init_state(batch, dtype)
        return st

    def stream_step(self, params: Params, state: State, content_chunk: Array,
                    style_ctx: dict, f0_noise: Array | None = None) -> tuple[dict, State]:
        """One causal chunk step: [B, Tc] codes → mel chunk [B, Tc, 80].

        Exactly equals the corresponding slice of ``apply(infer=True)`` (the
        aligner is per-query, every other op is causal) — replaces the
        reference's full-prefix re-run (`inference/Conan.py:129-145`).

        f0_gen='flow' streams too: the rectified-flow Euler integration runs
        chunkwise with per-Euler-step denoiser conv carries
        (StreamingRectifiedFlow); pass this chunk's slice of the utterance
        initial noise as ``f0_noise`` [B, Tc, 1] (defaults to zeros, which is
        deterministic but not distribution-matched — supply real noise in
        production).
        """
        cfg = self.cfg
        s = Stream(state)
        ret: dict = {}
        ce = embedding(jnp.maximum(content_chunk, 0), params["content_embedding"])
        ce = s.causal_conv("content_proj", ce, params["content_proj"], weight_norm=False)
        ce = jax.nn.leaky_relu(ce, 0.01)
        pitch_inp = ce + style_ctx["style"]
        if cfg.style:
            src_pad = pitch_inp[:, :, 0] == 0.0
            aligned, _, _ = self.aligner.apply(
                params["aligner"], pitch_inp, style_ctx["prosody"], src_pad,
                style_ctx["prosody_pad"], forcing=False)
            pitch_inp = pitch_inp + aligned
        if cfg.f0_gen == "flow":
            uv_pred = self.uv_predictor.apply(params["uv_predictor"], pitch_inp,
                                              stream=s)
            ret["uv_pred"] = uv_pred
            uv_b = jnp.logical_or(uv_pred[:, :, 0] > 0,
                                  content_chunk == cfg.silent_token)
            x0 = f0_noise if f0_noise is not None else                 jnp.zeros((*pitch_inp.shape[:2], 1))
            f0_norm, new_flow_state = self.f0_stream.step(
                params["f0_net"], state["f0_flow"], pitch_inp, x0)
            s.new_state["f0_flow"] = new_flow_state
            f0_out = minmax_denorm_f0(f0_norm[..., 0], uv_b)
            uv_out = uv_b.astype(jnp.float32)
        else:
            f0_out, uv_out = self._pitch_orig(params, pitch_inp, None, None,
                                              content_chunk, ret, infer=True,
                                              stream=s, rng=None, train=False)
        f0_denorm = denorm_f0(f0_out, uv_out)
        ret["f0_denorm_pred"] = f0_denorm
        pe = embedding(f0_to_coarse(f0_denorm), params["pitch_embed"])
        x = self.decoder.apply(params["decoder"], pitch_inp + pe,
                               jnp.ones_like(pe[..., :1]), stream=s)
        ret["mel_out"] = linear(x, params["mel_out"])
        return ret, s.new_state


# Decoder-state note: the uv_predictor's conv states use the "pp" prefix and
# the decoder uses "b*/post" — disjoint from "content_proj", so one flat dict
# carries all three sub-modules' streaming state.
