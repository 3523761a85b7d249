"""End-to-end pipeline: streaming chunked VC ≡ offline 3-stage composition."""

import numpy as np
import jax.numpy as jnp

from conan_tpu.infer.streaming import StreamingConfig, random_engine
from conan_tpu.models.conan.model import ConanConfig
from conan_tpu.models.emformer import EmformerConfig
from conan_tpu.models.vocoder.hifigan import HifiGanConfig

SMALL = StreamingConfig(
    emformer=EmformerConfig(input_dim=80, num_heads=4, ffn_dim=64, num_layers=2,
                            segment_length=4, left_context_length=8,
                            right_context_length=2, output_dim=100),
    conan=ConanConfig(hidden_size=64),
    vocoder=HifiGanConfig(upsample_initial_channel=32),
)


def test_streaming_pipeline_equals_offline(rng):
    eng = random_engine(SMALL, seed=0)
    hop = SMALL.mel.hop
    src = (rng.standard_normal(hop * 24) * 0.1).astype(np.float32)
    ref = (rng.standard_normal(hop * 40) * 0.1).astype(np.float32)
    wav_stream, codes = eng.infer_once(src, ref, collect_codes=True)
    wav_off = eng.infer_offline(src, ref)
    assert wav_stream.shape == wav_off.shape
    np.testing.assert_allclose(wav_stream, wav_off, atol=1e-4)
    assert codes.min() >= 0 and codes.max() < 100


def test_streaming_batched(rng):
    """N concurrent streams in one engine step (batched serving)."""
    eng = random_engine(SMALL, seed=1)
    hop = SMALL.mel.hop
    src = (rng.standard_normal((3, hop * 12)) * 0.1).astype(np.float32)
    ref = (rng.standard_normal((3, hop * 16)) * 0.1).astype(np.float32)
    wav = eng.infer_once(src, ref)
    n_frames = src.shape[1] // hop + 1  # center-padded STFT frame count
    assert wav.shape == (3, n_frames * hop)
    # each stream equals its solo run
    solo = eng.infer_once(src[1], ref[1])
    np.testing.assert_allclose(wav[1], solo[0], atol=1e-4)


def test_sharded_multi_stream_serving(rng):
    """8 concurrent streams data-parallel over the 8-device mesh equals the
    unsharded batched run."""
    from conan_tpu.parallel import make_mesh

    eng = random_engine(SMALL, seed=2)
    hop = SMALL.mel.hop
    src = (rng.standard_normal((8, hop * 12)) * 0.1).astype(np.float32)
    ref = (rng.standard_normal((8, hop * 16)) * 0.1).astype(np.float32)
    wav_plain = eng.infer_once(src, ref)
    eng.shard_streams(make_mesh(8))
    wav_sharded = eng.infer_once(src, ref)
    np.testing.assert_allclose(wav_sharded, wav_plain, atol=1e-5)


def test_flow_f0_streaming_equals_offline(rng):
    """f0_gen='flow': the engine slices one per-utterance x0 through the
    chunked rectified-flow integration — streaming == offline == scan, and a
    different rng gives a different (but valid) trajectory (VERDICT r1 #2;
    reference draws one noise per utterance, flow_f0.py:124-145)."""
    import jax

    cfg = StreamingConfig(
        emformer=SMALL.emformer,
        conan=ConanConfig(hidden_size=64, f0_gen="flow", f0_k_step=6,
                          f0_residual_layers=2, f0_residual_channels=16),
        vocoder=SMALL.vocoder)
    eng = random_engine(cfg, seed=4)
    hop = cfg.mel.hop
    src = (rng.standard_normal(hop * 16) * 0.1).astype(np.float32)
    ref = (rng.standard_normal(hop * 24) * 0.1).astype(np.float32)
    wav_stream = eng.infer_once(src, ref)
    wav_off = eng.infer_offline(src, ref)
    np.testing.assert_allclose(wav_stream, wav_off, atol=1e-4)
    wav_scan = eng.infer_once(src, ref, use_scan=True)
    np.testing.assert_allclose(wav_scan, wav_off, atol=1e-4)
    # explicit rng: still stream==offline
    k = jax.random.PRNGKey(7)
    wav_stream2 = eng.infer_once(src, ref, rng=k)
    wav_off2 = eng.infer_offline(src, ref, rng=k)
    np.testing.assert_allclose(wav_stream2, wav_off2, atol=1e-4)

    # Waveform equality alone is not probative (coarse-f0 quantization can
    # absorb noise differences), so also prove threading at the f0 level:
    # (a) sample_f0_noise reproduces the exact x0 apply() draws internally;
    # (b) chunk-sliced streaming integrates the same f0 trajectory.
    src_mel = eng.wav_to_mel(src)
    ref_mel = eng.wav_to_mel(ref)
    seg, rc = cfg.seg, cfg.rc
    B, T, _ = src_mel.shape
    T_pad = -(-T // seg) * seg
    mel_ext = jnp.concatenate(
        [src_mel, jnp.repeat(src_mel[:, -1:], T_pad - T + rc, axis=1)], axis=1)
    codes = jnp.argmax(eng.emformer.apply(eng.p_emformer, mel_ext), -1)
    ret_off = eng.conan.apply(eng.p_conan, codes, ref=ref_mel,
                              vq_state=eng.vq_state, infer=True,
                              global_step=200000, rng=k)
    noise = eng.conan.sample_f0_noise(k, B, T_pad)
    np.testing.assert_array_equal(np.asarray(noise),
                                  np.asarray(ret_off["initial_noise_used"]))
    # mostly-voiced weights => the f0 comparison below actually sees the flow
    assert np.asarray(ret_off["uv_pred"][:, :, 0] > 0).mean() < 0.5
    style = eng._prepare(ref_mel)
    state = eng.conan.init_stream_state(B)
    f0s = []
    for s in range(0, T_pad, seg):
        r, state = eng.conan.stream_step(eng.p_conan, state, codes[:, s:s + seg],
                                         style, f0_noise=noise[:, s:s + seg])
        f0s.append(np.asarray(r["f0_denorm_pred"]))
    np.testing.assert_allclose(np.concatenate(f0s, 1),
                               np.asarray(ret_off["f0_denorm_pred"]),
                               atol=1e-3, rtol=1e-4)


def test_fast_system_no_lookahead(rng):
    """right_context=0 (the reference's published fast variant): the engine
    streams 4-frame chunks with no lookahead, streaming == offline."""
    from conan_tpu.models.emformer import EmformerConfig

    cfg = StreamingConfig(
        emformer=EmformerConfig(input_dim=80, num_heads=4, ffn_dim=64,
                                num_layers=2, segment_length=4,
                                left_context_length=8, right_context_length=0,
                                output_dim=100),
        conan=SMALL.conan, vocoder=SMALL.vocoder)
    eng = random_engine(cfg, seed=3)
    hop = cfg.mel.hop
    src = (rng.standard_normal(hop * 16) * 0.1).astype(np.float32)
    ref = (rng.standard_normal(hop * 24) * 0.1).astype(np.float32)
    wav_stream = eng.infer_once(src, ref)
    wav_off = eng.infer_offline(src, ref)
    np.testing.assert_allclose(wav_stream, wav_off, atol=1e-4)


def test_fast_serving_precision_mode(rng):
    """serving_precision='fast' drops conan+vocoder matmuls to the bf16
    DEFAULT at trace time while the Emformer code path stays HIGHEST.  On the
    CPU test backend DEFAULT == HIGHEST numerically, so fast output must
    EQUAL exact output here — this pins the plumbing (scoped trace-time
    policy, same state/shape contract); the TPU quality/capacity deltas are
    measured by tools/bench_fast_quality.py -> tools/SERVING_FAST.json."""
    import pytest

    eng = random_engine(SMALL, seed=3)
    fast = random_engine(SMALL, seed=3, serving_precision="fast")
    hop = SMALL.mel.hop
    src = (rng.standard_normal(hop * 12) * 0.1).astype(np.float32)
    ref = (rng.standard_normal(hop * 16) * 0.1).astype(np.float32)
    wav_exact, codes_exact = eng.infer_once(src, ref, collect_codes=True)
    wav_fast, codes_fast = fast.infer_once(src, ref, collect_codes=True)
    np.testing.assert_array_equal(codes_exact, codes_fast)
    np.testing.assert_allclose(wav_fast, wav_exact, atol=1e-6)
    with pytest.raises(ValueError):
        random_engine(SMALL, seed=3, serving_precision="turbo")


def test_bucketed_lengths_identical_output(rng):
    """bucket_lengths=True (power-of-two padding of ref + scan length) must
    return the identical waveform/codes — zero-padded ref frames are masked
    by the style/prosody encoders and the source side is causal, so the
    [:T·hop] slice is invariant.  This is what bounds run_vc batch-conversion
    compiles to the bucket ladder."""
    eng = random_engine(SMALL, seed=1)
    hop = SMALL.mel.hop
    src = (rng.standard_normal(hop * 13) * 0.1).astype(np.float32)
    ref = (rng.standard_normal(hop * 11) * 0.1).astype(np.float32)
    wav_a, codes_a = eng.infer_once(src, ref, collect_codes=True, use_scan=True)
    wav_b, codes_b = eng.infer_once(src, ref, collect_codes=True, use_scan=True,
                                    bucket_lengths=True)
    np.testing.assert_array_equal(codes_a, codes_b)
    np.testing.assert_allclose(wav_b, wav_a, atol=1e-6)
    off_a = eng.infer_offline(src, ref)
    off_b = eng.infer_offline(src, ref, bucket_lengths=True)
    np.testing.assert_allclose(off_b, off_a, atol=1e-6)


def test_high_serving_precision_mode(rng):
    """serving_precision='high' — the middle rung (lax.Precision.HIGH 3-pass
    bf16 emulation for conan+vocoder under a HIGHEST emformer).  Same CPU
    plumbing pin as the fast test (CPU backend: HIGH == HIGHEST numerically);
    the TPU quality/capacity ladder lives in tools/SERVING_LADDER.json."""
    eng = random_engine(SMALL, seed=3)
    high = random_engine(SMALL, seed=3, serving_precision="high")
    hop = SMALL.mel.hop
    src = (rng.standard_normal(hop * 12) * 0.1).astype(np.float32)
    ref = (rng.standard_normal(hop * 16) * 0.1).astype(np.float32)
    wav_exact, codes_exact = eng.infer_once(src, ref, collect_codes=True)
    wav_high, codes_high = high.infer_once(src, ref, collect_codes=True)
    np.testing.assert_array_equal(codes_exact, codes_high)
    np.testing.assert_allclose(wav_high, wav_exact, atol=1e-6)


def test_build_engine_serving_precision_passthrough(tmp_path, rng):
    """build_engine forwards serving_precision (and honors a checkpoint's
    serving_precision hparam) — the ladder tools construct non-exact engines
    from trained checkpoint dirs through this path."""
    import os

    import jax
    import yaml

    from conan_tpu.config import HParams
    from conan_tpu.infer.build import build_engine
    from conan_tpu.train.checkpoint import save_checkpoint
    from conan_tpu.train.tasks import ConanTask, EmformerTask, VocoderTask
    from tests.test_train_steps import CONAN_HP, EMF_HP, VOC_HP

    dirs = {}
    for name, task_cls, hp in (
            ("emformer", EmformerTask,
             dict(EMF_HP, emformer_input_dim=80, emformer_layers=1)),
            ("vocoder", VocoderTask, dict(VOC_HP)),
            ("conan", ConanTask, dict(CONAN_HP))):
        task = task_cls(HParams(hp))
        state = task.init_state(jax.random.PRNGKey(0))
        d = str(tmp_path / name)
        os.makedirs(d)
        save_checkpoint(d, 1, jax.device_get(state), hp)
        yaml.safe_dump(hp, open(f"{d}/config.yaml", "w"))
        dirs[name] = d

    eng = build_engine(dirs["conan"], dirs["emformer"], dirs["vocoder"],
                       serving_precision="high")
    assert eng.serving_precision == "high"
    # checkpoint-pinned default: conan config carries serving_precision
    cfg = yaml.safe_load(open(f"{dirs['conan']}/config.yaml"))
    cfg["serving_precision"] = "fast"
    yaml.safe_dump(cfg, open(f"{dirs['conan']}/config.yaml", "w"))
    eng2 = build_engine(dirs["conan"], dirs["emformer"], dirs["vocoder"])
    assert eng2.serving_precision == "fast"
    # explicit caller choice still wins
    eng3 = build_engine(dirs["conan"], dirs["emformer"], dirs["vocoder"],
                        serving_precision="high")
    assert eng3.serving_precision == "high"
