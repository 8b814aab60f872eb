"""Batched multi-request decoding tests."""

import numpy as np
import pytest

from qwen3_asr_gguf_tpu.export.convert import make_synthetic_checkpoint
from qwen3_asr_gguf_tpu.runtime.batched import BatchedEngine
from qwen3_asr_gguf_tpu.runtime.engine import QwenASREngine
from qwen3_asr_gguf_tpu.schema import ASREngineConfig



pytestmark = pytest.mark.slow  # compile-heavy; fast lane: -m "not slow"


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    d = tmp_path_factory.mktemp("batch_ckpt")
    make_synthetic_checkpoint(str(d), "tiny", quant="f16")
    return QwenASREngine(ASREngineConfig(
        model_dir=str(d), llm_fn="qwen3_asr_llm.f16.gguf", precision="f32",
        chunk_size=2.0, n_ctx=512, verbose=False, max_new_tokens=12, decode_block=8,
    ))


def _audio(seconds, freq):
    t = np.arange(int(16000 * seconds)) / 16000
    return (np.sin(2 * np.pi * freq * t) * 0.3).astype(np.float32)


def test_batch_matches_sequential_greedy(engine):
    """Batched greedy decode must equal per-request sequential decode."""
    audios = [_audio(1.5, 440), _audio(1.0, 300), _audio(2.0, 520)]
    be = BatchedEngine(engine, block=8)
    batch_results = be.transcribe_batch(audios, language="English", temperature=0.0)

    for a, br in zip(audios, batch_results):
        seq = engine.asr(a, context="", language="English",
                         chunk_size_sec=2.0, temperature=0.0)
        # sequential path applies rollback trimming on non-final... both are
        # single-chunk+last so full text; compare text prefix robustly
        assert isinstance(br.text, str)
        assert br.text == seq.text, (br.text, seq.text)


def test_batch_mixed_lengths_fallback(engine):
    """Long inputs (> chunk) route through the sequential pipeline."""
    audios = [_audio(1.0, 440), _audio(3.0, 330)]  # second spans 2 chunks
    be = BatchedEngine(engine, block=8)
    results = be.transcribe_batch(audios, language="English", temperature=0.0)
    assert len(results) == 2
    assert results[0].performance.get("batched") is True
    assert "prefill_tokens" in results[1].performance  # sequential stats
