"""Mel frontend parity vs transformers' WhisperFeatureExtractor.

The reference extractor (FastWhisperMel, encoder.py:76-107) reimplements the
Whisper/librosa mel pipeline; WhisperFeatureExtractor(feature_size=128) is
the canonical oracle for the same math (hann window, center reflect pad,
slaney 128-bin bank at 0-8 kHz, log10, max-8 clamp, (x+4)/4).
"""

import numpy as np
import pytest

from qwen3_asr_gguf_tpu.audio.mel import LogMelFrontend, mel_filterbank


@pytest.fixture(scope="module")
def oracle_extractor():
    transformers = pytest.importorskip("transformers")
    return transformers.WhisperFeatureExtractor(feature_size=128, sampling_rate=16000)


def test_filterbank_matches_whisper(oracle_extractor):
    ref = np.asarray(oracle_extractor.mel_filters, dtype=np.float32)  # [201, 128]
    ours = mel_filterbank()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.parametrize("seconds", [1.0, 2.5])
def test_log_mel_matches_whisper(oracle_extractor, rng, seconds):
    n = int(16000 * seconds)
    audio = (rng.standard_normal(n) * 0.1).astype(np.float32)
    audio += np.sin(2 * np.pi * 440 * np.arange(n) / 16000).astype(np.float32) * 0.3

    ref = oracle_extractor(
        audio, sampling_rate=16000, padding="do_not_pad", return_tensors="np"
    )["input_features"][0]  # [128, T]

    ours = LogMelFrontend()(audio)
    assert ours.shape == ref.shape == (128, n // 160)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_output_frame_truncation(rng):
    # frame count must be len//160 even when not hop-aligned
    audio = rng.standard_normal(16000 + 77).astype(np.float32)
    out = LogMelFrontend()(audio)
    assert out.shape == (128, (16000 + 77) // 160)


def test_dynamic_range_normalization(rng):
    audio = (rng.standard_normal(16000) * 1e-6).astype(np.float32)  # near-silence
    out = LogMelFrontend()(audio)
    # after clamp to max-8 and (x+4)/4 normalize, range spans at most 2.0
    assert out.max() - out.min() <= 2.0 + 1e-5


def test_varlen_device_mel_matches_host():
    """The bucketed device mel (aligner windows) is an exact twin of the
    host path on the valid prefix, with padded frames exactly zero."""
    import jax.numpy as jnp

    from qwen3_asr_gguf_tpu.audio.mel import (
        _log_mel_padded_jit,
        log_mel_np,
        mel_filterbank,
        pad_signal_for_bucket,
    )

    f = mel_filterbank()
    rng = np.random.default_rng(0)
    for n in (16_000, 80_240, 160 * 501 + 80):
        a = rng.standard_normal(n).astype(np.float32)
        frames = n // 160
        bucket = -(-frames // 500) * 500
        y = pad_signal_for_bucket(a, bucket)
        dev = np.asarray(
            _log_mel_padded_jit(jnp.asarray(y), jnp.asarray(f), jnp.int32(frames), bucket)
        )
        host = log_mel_np(a, f)
        np.testing.assert_allclose(dev[:, :frames], host, atol=5e-5)
        if frames < bucket:
            assert np.abs(dev[:, frames:]).max() == 0.0
