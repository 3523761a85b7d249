"""Map reference PyTorch state_dicts into conan_tpu param pytrees.

Checkpoint-parity layer (SURVEY.md §5.4): the reference's per-child state_dict
naming is preserved so trained reference weights drop straight in. All
functions take a flat ``{name: np.ndarray}`` dict (a torch state_dict with
tensors converted via ``.numpy()``).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _g(sd: dict, name: str):
    return jnp.asarray(np.asarray(sd[name]))


def _lin(sd: dict, p: str) -> dict:
    return {"w": _g(sd, f"{p}.weight"), "b": _g(sd, f"{p}.bias")}


def _conv(sd: dict, p: str) -> dict:
    return {"w": _g(sd, f"{p}.weight"), "b": _g(sd, f"{p}.bias")}


def _wn_conv(sd: dict, p: str) -> dict:
    return {"v": _g(sd, f"{p}.weight_v"), "g": _g(sd, f"{p}.weight_g"),
            "b": _g(sd, f"{p}.bias")}


def _ln(sd: dict, p: str) -> dict:
    return {"scale": _g(sd, f"{p}.weight"), "bias": _g(sd, f"{p}.bias")}


def conv_blocks_from_torch(sd: dict, prefix: str, n_blocks: int, n_sub: int,
                           causal: bool) -> dict:
    """Reference ConvBlocks / CausalConvBlocks (conv.py:84-264).

    Sequential indices: non-causal blocks.{j} = [norm, conv, λ, act, conv1x1]
    → (0,1,4); causal = [norm, λpad, conv, λ, act, conv1x1] → (0,2,5); post
    net is a bare conv (non-causal) or Sequential(λpad, conv) (causal)."""
    i_norm, i_c1, i_c2 = (0, 2, 5) if causal else (0, 1, 4)
    post = f"{prefix}.post_net1.1" if causal else f"{prefix}.post_net1"
    blocks = []
    for i in range(n_blocks):
        sub = []
        for j in range(n_sub):
            base = f"{prefix}.res_blocks.{i}.blocks.{j}"
            sub.append({
                "norm": _ln(sd, f"{base}.{i_norm}"),
                "conv1": _conv(sd, f"{base}.{i_c1}"),
                "conv2": _conv(sd, f"{base}.{i_c2}"),
            })
        blocks.append(sub)
    return {"blocks": blocks, "last_norm": _ln(sd, f"{prefix}.last_norm"),
            "post": _conv(sd, post)}


def wavenet_from_torch(sd: dict, prefix: str, n_layers: int, causal: bool) -> dict:
    """WN / CausalWN (wavenet.py): weight-normed in/res_skip layers."""
    p: dict = {"in": [], "res_skip": []}
    for i in range(n_layers):
        inp = f"{prefix}.in_layers.{i}" + (".conv" if causal else "")
        p["in"].append(_wn_conv(sd, inp))
        p["res_skip"].append(_wn_conv(sd, f"{prefix}.res_skip_layers.{i}"))
    if f"{prefix}.cond_layer.weight_v" in sd:
        p["cond"] = _wn_conv(sd, f"{prefix}.cond_layer")
    return p


def pitch_predictor_from_torch(sd: dict, prefix: str, n_layers: int = 5) -> dict:
    return {
        "convs": [_conv(sd, f"{prefix}.conv.{i}.0.conv") for i in range(n_layers)],
        "ln": _ln(sd, f"{prefix}.post_ln"),
        "out": _lin(sd, f"{prefix}.linear"),
    }


def mha_from_torch(sd: dict, prefix: str) -> dict:
    return {"in_w": _g(sd, f"{prefix}.in_proj_weight"),
            "in_b": _g(sd, f"{prefix}.in_proj_bias"),
            "out": _lin(sd, f"{prefix}.out_proj")}


def aligner_from_torch(sd: dict, prefix: str, n_layers: int = 2) -> dict:
    layers = []
    for i in range(n_layers):
        base = f"{prefix}.layers.{i}"
        layers.append({
            "attn": mha_from_torch(sd, f"{base}.multihead_attn"),
            "lin1": _lin(sd, f"{base}.linear1"),
            "lin2": _lin(sd, f"{base}.linear2"),
            "norm1": _ln(sd, f"{base}.norm1"),
            "norm2": _ln(sd, f"{base}.norm2"),
        })
    return {"layers": layers}


def vq_state_from_torch(sd: dict, prefix: str) -> dict:
    return {
        "embedding": _g(sd, f"{prefix}.embedding"),
        "ema_count": _g(sd, f"{prefix}.ema_count"),
        "ema_weight": _g(sd, f"{prefix}.ema_weight"),
        "initialized": _g(sd, f"{prefix}.data_initialized").reshape(()),
    }


def emformer_from_torchaudio(sd: dict, num_layers: int) -> dict:
    """Map a trained reference Emformer checkpoint (torchaudio
    ``Emformer`` state_dict under ``emformer.``, plus the ``proj`` head —
    reference `modules/Emformer/emformer.py:14-30`) onto conan_tpu's
    Emformer params.

    torchaudio layer names (memory bank disabled → no summary/memory paths):
      emformer.emformer_layers.{i}.attention.emb_to_query.{weight,bias}
      emformer.emformer_layers.{i}.attention.emb_to_key_value.*
      emformer.emformer_layers.{i}.attention.out_proj.*
      emformer.emformer_layers.{i}.layer_norm_input.* / layer_norm_output.*
      emformer.emformer_layers.{i}.pos_ff.{0 LN, 1 Linear, 4 Linear}.*
    The attention math matches 1:1 (queries over [rc ∥ utt], keys the same
    set, query scaling head_dim^-0.5, pre-LN FFN, output LN) — see
    conan_tpu.models.emformer docstring. torchaudio is not installed in this
    image, so this mapping is exercised only when a real checkpoint is
    supplied."""
    layers = []
    for i in range(num_layers):
        b = f"emformer.emformer_layers.{i}"
        layers.append({
            "q": _lin(sd, f"{b}.attention.emb_to_query"),
            "kv": _lin(sd, f"{b}.attention.emb_to_key_value"),
            "out": _lin(sd, f"{b}.attention.out_proj"),
            "ln_in": _ln(sd, f"{b}.layer_norm_input"),
            "ln_out": _ln(sd, f"{b}.layer_norm_output"),
            "ffn_ln": _ln(sd, f"{b}.pos_ff.0"),
            "ffn1": _lin(sd, f"{b}.pos_ff.1"),
            "ffn2": _lin(sd, f"{b}.pos_ff.4"),
        })
    p = {"layers": layers}
    if "proj.weight" in sd:
        p["proj"] = _lin(sd, "proj")
    if "proj1.weight" in sd:
        p["proj1"] = _lin(sd, "proj1")
        p["proj2"] = _lin(sd, "proj2")
    return p


def conan_from_torch(sd: dict, cfg) -> tuple[dict, dict | None]:
    """Full reference Conan state_dict (modules/Conan/Conan.py:45-113) →
    (params, vq_state)."""
    p: dict = {
        "content_embedding": {"w": _g(sd, "content_embedding.weight")},
        "content_proj": _conv(sd, "content_proj.0.conv"),
        "global_conv_in": _conv(sd, "global_conv_in"),
        "global_encoder": conv_blocks_from_torch(sd, "global_encoder", 5, 2, causal=False),
        "uv_predictor": pitch_predictor_from_torch(sd, "uv_predictor"),
        "pitch_embed": {"w": _g(sd, "pitch_embed.weight")},
        "decoder": conv_blocks_from_torch(sd, "decoder", len(cfg.dec_dilations),
                                          cfg.layers_in_block, causal=True),
        "mel_out": _lin(sd, "mel_out"),
    }
    if "spk_id_proj.weight" in sd:  # use_spk_id path (fs.py:59-60)
        p["spk_id_proj"] = {"w": _g(sd, "spk_id_proj.weight")}
    vq_state = None
    if cfg.style:
        p["prosody"] = {
            "wavenet": wavenet_from_torch(sd, "prosody_extractor.wavenet", 4, causal=False),
            "encoder": conv_blocks_from_torch(sd, "prosody_extractor.encoder", 5, 2,
                                              causal=False),
        }
        p["l1"] = _lin(sd, "l1")
        p["aligner"] = aligner_from_torch(sd, "align")
        vq_state = vq_state_from_torch(sd, "prosody_extractor.vqvae")
    if cfg.f0_gen == "flow":
        from conan_tpu.models.conan.flow import DiffNet, DiffNetConfig
        net = DiffNet(DiffNetConfig())
        sub = {k[len("pitch_flownet."):]: v for k, v in sd.items()
               if k.startswith("pitch_flownet.")}
        p["f0_net"] = net.params_from_torch(sub)
    return p, vq_state
