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
