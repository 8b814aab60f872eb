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
