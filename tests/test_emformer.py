"""Emformer invariants: streaming ≡ offline, causality, left-context window.

No torchaudio exists in this image (and the reference ships no checkpoints), so
the oracle is the architecture's defining invariants rather than golden
tensors — these are exactly what the reference's runtime relies on
(`/root/reference/modules/Emformer/emformer.py:48-98`: streaming `inference`
is asserted to reproduce offline `forward`)."""

import numpy as np
import jax
import jax.numpy as jnp

from conan_tpu.models.emformer import Emformer, EmformerConfig, EmformerDistillModel

CFG = EmformerConfig(input_dim=16, num_heads=4, ffn_dim=32, num_layers=3,
                     segment_length=4, left_context_length=6, right_context_length=2)


def _mk(cfg=CFG, T_utt=24, B=2, seed=0):
    model = Emformer(cfg)
    params = model.init(jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    mel = rng.standard_normal((B, T_utt + cfg.right_context_length, cfg.input_dim)).astype(np.float32)
    return model, params, jnp.asarray(mel)


def test_streaming_equals_offline():
    cfg = CFG
    model, params, mel = _mk()
    y_off = model.apply(params, mel)
    seg, rc = cfg.segment_length, cfg.right_context_length
    T = mel.shape[1] - rc
    state = model.init_state(mel.shape[0])
    outs = []
    step = jax.jit(model.step)
    for s in range(0, T, seg):
        chunk = mel[:, s:s + seg + rc]
        y, state = step(params, state, chunk)
        outs.append(y)
    y_str = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(y_str), np.asarray(y_off), atol=2e-5, rtol=1e-4)


def test_streaming_equals_offline_no_right_context():
    cfg = EmformerConfig(input_dim=16, num_heads=4, ffn_dim=32, num_layers=2,
                         segment_length=4, left_context_length=6, right_context_length=0)
    model, params, mel = _mk(cfg)
    y_off = model.apply(params, mel)
    state = model.init_state(mel.shape[0])
    outs = []
    for s in range(0, mel.shape[1], cfg.segment_length):
        y, state = model.step(params, state, mel[:, s:s + cfg.segment_length])
        outs.append(y)
    np.testing.assert_allclose(np.asarray(jnp.concatenate(outs, 1)), np.asarray(y_off),
                               atol=2e-5, rtol=1e-4)


def test_causality_beyond_lookahead():
    """Output of segment s must not depend on inputs ≥ (s+1)*seg + rc."""
    cfg = CFG
    model, params, mel = _mk()
    y0 = np.asarray(model.apply(params, mel))
    seg, rc = cfg.segment_length, cfg.right_context_length
    rng = np.random.default_rng(1)
    for s in [0, 2, 4]:
        cut = (s + 1) * seg + rc
        mel_p = np.asarray(mel).copy()
        mel_p[:, cut:] += rng.standard_normal(mel_p[:, cut:].shape).astype(np.float32)
        yp = np.asarray(model.apply(params, jnp.asarray(mel_p)))
        np.testing.assert_allclose(yp[:, :(s + 1) * seg], y0[:, :(s + 1) * seg], atol=1e-5)


def test_lookahead_is_used():
    """Within the rc lookahead window, inputs DO influence the segment."""
    model, params, mel = _mk()
    seg, rc = CFG.segment_length, CFG.right_context_length
    y0 = np.asarray(model.apply(params, mel))
    rng = np.random.default_rng(7)
    mel_p = np.asarray(mel).copy()
    # random perturbation: constant shifts would be cancelled by LayerNorm
    mel_p[:, seg:seg + rc] += rng.standard_normal(mel_p[:, seg:seg + rc].shape).astype(np.float32)
    yp = np.asarray(model.apply(params, jnp.asarray(mel_p)))
    assert np.abs(yp[:, :seg] - y0[:, :seg]).max() > 1e-4


def test_left_context_window_single_layer():
    """With 1 layer, a perturbation further than L frames left of the segment
    start cannot change the segment output."""
    cfg = EmformerConfig(input_dim=16, num_heads=4, ffn_dim=32, num_layers=1,
                         segment_length=4, left_context_length=6, right_context_length=2)
    model, params, mel = _mk(cfg, T_utt=32)
    y0 = np.asarray(model.apply(params, mel))
    rng = np.random.default_rng(8)
    # segment 6 starts at frame 24; left window reaches back to frame 18
    mel_p = np.asarray(mel).copy()
    mel_p[:, :16] += rng.standard_normal(mel_p[:, :16].shape).astype(np.float32)  # outside window
    yp = np.asarray(model.apply(params, jnp.asarray(mel_p)))
    np.testing.assert_allclose(yp[:, 24:28], y0[:, 24:28], atol=1e-5)
    # and within the window it does matter
    mel_p2 = np.asarray(mel).copy()
    mel_p2[:, 20:22] += rng.standard_normal(mel_p2[:, 20:22].shape).astype(np.float32)
    yp2 = np.asarray(model.apply(params, jnp.asarray(mel_p2)))
    assert np.abs(yp2[:, 24:28] - y0[:, 24:28]).max() > 1e-4


def test_lengths_masking():
    """Keys beyond a sample's length must not affect other samples' outputs,
    and a shorter sample's valid prefix must match its unpadded forward."""
    cfg = CFG
    model = Emformer(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    rc, seg = cfg.right_context_length, cfg.segment_length
    T_long, T_short = 16, 8
    mel_short = rng.standard_normal((1, T_short + rc, cfg.input_dim)).astype(np.float32)
    # pad to long length with garbage
    pad = rng.standard_normal((1, T_long - T_short, cfg.input_dim)).astype(np.float32) * 10
    mel_padded = np.concatenate(
        [mel_short[:, :T_short], mel_short[:, T_short:], pad], axis=1)
    # note: padded layout is [utt_short ∥ rc ∥ garbage]; lengths = T_short + rc
    y_padded = np.asarray(model.apply(
        params, jnp.asarray(mel_padded), lengths=jnp.asarray([T_short + rc])))
    y_ref = np.asarray(model.apply(params, jnp.asarray(mel_short)))
    np.testing.assert_allclose(y_padded[:, :T_short], y_ref, atol=2e-4, rtol=1e-3)


def test_distill_model_shapes():
    cfg = EmformerConfig(input_dim=16, num_heads=4, ffn_dim=32, num_layers=2,
                         segment_length=4, left_context_length=6,
                         right_context_length=2, output_dim=100)
    m = EmformerDistillModel(cfg)
    p = m.init(jax.random.PRNGKey(0))
    mel = jnp.zeros((2, 18, 16))
    logits = m.apply(p, mel)
    assert logits.shape == (2, 16, 100)
    out, st = m.step(p, m.init_state(2), jnp.zeros((2, 6, 16)))
    assert out.shape == (2, 4, 100)


def test_banded_equals_dense_attention():
    """The banded (block-windowed) offline attention is numerically identical
    to the dense masked path, including uneven-length padding masks — the
    dense path is the oracle (same -inf masking, same softmax support)."""
    import jax

    cfg = EmformerConfig(input_dim=16, num_heads=4, ffn_dim=32, num_layers=2,
                         segment_length=4, left_context_length=10,
                         right_context_length=2, output_dim=20)
    model = Emformer(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B, n_segs = 3, 7
    T_in = n_segs * cfg.segment_length + cfg.right_context_length
    mel = jnp.asarray(rng.standard_normal((B, T_in, 16)).astype(np.float32))
    lengths = jnp.asarray([T_in, T_in - 5, T_in - 11])
    from unittest import mock

    for ln in (None, lengths):
        dense = model.apply(params, mel, ln, banded=False)
        band = model.apply(params, mel, ln, banded=True)
        np.testing.assert_allclose(np.asarray(band), np.asarray(dense),
                                   atol=1e-5, rtol=1e-5)
        # the gather variant is kept as the decomposition-bench
        # counterexample (tools/EMFORMER.json) — keep it correct too
        with mock.patch.object(Emformer, "_attention_banded",
                               Emformer._attention_banded_gather):
            gat = model.apply(params, mel, ln, banded=True)
        np.testing.assert_allclose(np.asarray(gat), np.asarray(dense),
                                   atol=1e-5, rtol=1e-5)

    # rc=0 fast variant
    cfg0 = EmformerConfig(input_dim=16, num_heads=4, ffn_dim=32, num_layers=1,
                          segment_length=4, left_context_length=10,
                          right_context_length=0, output_dim=20)
    m0 = Emformer(cfg0)
    p0 = m0.init(jax.random.PRNGKey(1))
    mel0 = jnp.asarray(rng.standard_normal((B, 28, 16)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(m0.apply(p0, mel0, banded=True)),
        np.asarray(m0.apply(p0, mel0, banded=False)), atol=1e-5, rtol=1e-5)


def test_banded_equals_dense_multigroup():
    """Grouped banded path across group boundaries AND with segment padding
    (n_segs=21 with group=16 pads 11 garbage segments — outputs for real rows
    must still match the dense oracle, and gradients must stay finite through
    the padded-query NaN guard). Production band geometry L=50, seg=4, rc=2."""
    import jax

    cfg = EmformerConfig(input_dim=16, num_heads=4, ffn_dim=32, num_layers=2,
                         segment_length=4, left_context_length=50,
                         right_context_length=2, output_dim=20)
    model = Emformer(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    B, n_segs = 2, 21
    T_in = n_segs * cfg.segment_length + cfg.right_context_length
    mel = jnp.asarray(rng.standard_normal((B, T_in, 16)).astype(np.float32))
    lengths = jnp.asarray([T_in, T_in - 7])
    for ln in (None, lengths):
        dense = model.apply(params, mel, ln, banded=False)
        band = model.apply(params, mel, ln, banded=True)
        np.testing.assert_allclose(np.asarray(band), np.asarray(dense),
                                   atol=1e-5, rtol=1e-5)

    def loss(p):
        return jnp.sum(jnp.square(model.apply(p, mel)))

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
