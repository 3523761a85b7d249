"""Emformer distill step-time decomposition (VERDICT r2 weak #4 / next #5).

The r2 measurement: 27.34 ms/step bf16 at 4.1% MFU with no analysis of WHY.
The why, quantified here on the real chip at production geometry
(B=16, T=500, 6 layers, D=80, H=8 → head_dim 10; seg=4, L=50, rc=2):

  * the dense masked attention materializes [B,H,750,750] f32 score/prob
    tensors — 288 MB per layer per direction; the step is HBM-bound on
    tensors that are 93% -inf (each query sees only rc+L+seg = 56 keys).
  * the matmuls themselves are lane-starved by D=80 (62% of the 128-wide
    MXU) and the score einsums by head_dim=10 (8%), but those are small
    FLOPs next to the FFN — the score-tensor TRAFFIC, not math, is the
    ceiling.

Variants measured (value_and_grad train step, slope-timed):
  dense        — r2 shipped path (banded=False)
  banded       — block-windowed attention (models/emformer.py), same math
  ffn_only     — attention replaced by identity: the FFN+LN+head floor
  attn_only    — FFN removed: attention cost in isolation (banded)
  attn_only_dense — FFN removed, dense attention
  d128_probe   — input_dim padded 80→128 (lane-fill ceiling probe; different
                 model, NOT a shipped config — measures what full lanes buy)

Writes tools/EMFORMER.json.  Usage: python tools/bench_emformer_parts.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_train import _time_steps  # noqa: E402

B, T, RC = 16, 500, 2


def build_step(variant: str):
    import jax
    import jax.numpy as jnp

    from conan_tpu.models.emformer import Emformer, EmformerConfig
    from conan_tpu.nn.module import Params
    from conan_tpu.train import losses as L

    D = 128 if variant == "d128_probe" else 80
    cfg = EmformerConfig(input_dim=D, num_heads=8, ffn_dim=2048, num_layers=6,
                         segment_length=4, left_context_length=50,
                         right_context_length=RC, output_dim=100)
    model = Emformer(cfg)

    banded = variant not in ("dense", "attn_only_dense")
    gather = variant in ("banded_gather", "attn_only_gather")
    skip_attn = variant == "ffn_only"
    skip_ffn = variant in ("attn_only", "attn_only_dense", "attn_only_gather")

    from conan_tpu.models.emformer import _layer_norm, _linear

    def layer(p: Params, x, bias, n_segs, lengths):
        xn = _layer_norm(x, p["ln_in"])
        if skip_attn:
            att = xn
        elif gather:
            att = model._attention_banded_gather(p, xn, n_segs, lengths)
        elif banded:
            att = model._attention_banded(p, xn, n_segs, lengths)
        else:
            att = model._attention(p, xn, xn, bias)
        y = att + x
        if not skip_ffn:
            h = _layer_norm(y, p["ffn_ln"])
            h = jax.nn.relu(_linear(h, p["ffn1"]))
            h = _linear(h, p["ffn2"])
            y = y + h
        return _layer_norm(y, p["ln_out"])

    def forward(params, mel):
        seg, rc = cfg.segment_length, cfg.right_context_length
        n_segs = (mel.shape[1] - rc) // seg
        utt = mel[:, :n_segs * seg]
        idx = (np.arange(n_segs)[:, None] + 1) * seg + np.arange(rc)[None, :]
        rc_blocks = mel[:, idx.reshape(-1), :]
        x = jnp.concatenate([rc_blocks, utt], axis=1)
        bias = None if banded or skip_attn else \
            jnp.asarray(model._offline_mask(n_segs))
        for lp in params["layers"]:
            x = layer(lp, x, bias, n_segs, None)
        x = x[:, n_segs * rc:]
        return _linear(x, params["proj"])

    def init(key):
        k1, k2, k3 = jax.random.split(key, 3)
        p = model.init(k1)
        from conan_tpu.nn import inits

        p["proj"] = {"w": inits.kaiming_uniform(k2, (100, D)),
                     "b": inits.default_bias(k3, (100,), (100, D))}
        return p

    def loss_fn(params, batch):
        logits = forward(params, batch["mels"])
        codes = batch["content"]
        Tm = min(logits.shape[1], codes.shape[1])
        mask = codes[:, :Tm] != -1
        return L.distillation_loss(logits[:, :Tm], codes[:, :Tm], mask)

    def step(state, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state["params"], batch)
        params = jax.tree.map(lambda p, g: p - 1e-9 * g, state["params"], grads)
        return dict(state, params=params,
                    step=state["step"] + 1), {"loss": loss}

    return init, step, D


def main():
    import jax
    import jax.numpy as jnp

    from conan_tpu.ops.precision import precision_scope

    variants = sys.argv[1:] or ["banded", "banded_gather", "dense",
                                "ffn_only", "attn_only", "attn_only_dense",
                                "attn_only_gather", "d128_probe"]
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 100, (B, T))
    codes[:, -RC:] = -1
    results = []
    for variant in variants:
        init, step, D = build_step(variant)
        batch = {
            "mels": jnp.asarray(rng.standard_normal((B, T + RC, D))
                                .astype(np.float32)),
            "content": jnp.asarray(codes),
        }
        with precision_scope("default"):
            state = {"params": init(jax.random.PRNGKey(0)),
                     "step": jnp.zeros((), jnp.int32)}
            try:
                ms, flops = _time_steps(step, state, batch, jax.random.PRNGKey(1))
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"variant": variant, "error": repr(e)[:200]}),
                      flush=True)
                continue
        r = dict(variant=variant, ms_per_step=round(ms, 3), flops=flops,
                 tflops=round(flops / ms / 1e9, 2) if flops else None)
        print(json.dumps(r), flush=True)
        results.append(r)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "EMFORMER.json")
    json.dump(results, open(path, "w"), indent=1)
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
