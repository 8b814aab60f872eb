"""Golden end-to-end traces on the deterministic synthetic checkpoints.

Pins the composed behavior of engine / aligner / streaming on fixed-seed
tiny checkpoints and fixed audio: a regression anywhere in the stack (mel,
encoder, prompt build, prefill, sampling, rollback, alignment math) breaks
a test here, not just the TPU bench (SURVEY.md §4 "metric gates as test
suite"; VERDICT r1 asked for tests/golden to be filled).

Regenerate after an intentional behavior change with:
    QWEN3_UPDATE_GOLDEN=1 python -m pytest tests/test_golden.py -q
"""

import json
import os
from pathlib import Path

import numpy as np
import pytest

from qwen3_asr_gguf_tpu.export.convert import make_synthetic_checkpoint
from qwen3_asr_gguf_tpu.runtime.engine import QwenASREngine
from qwen3_asr_gguf_tpu.schema import AlignerConfig, ASREngineConfig

GOLDEN_DIR = Path(__file__).parent / "golden"
UPDATE = bool(os.environ.get("QWEN3_UPDATE_GOLDEN"))


def _check(name: str, got: dict) -> None:
    path = GOLDEN_DIR / f"{name}.json"
    if UPDATE or not path.exists():
        GOLDEN_DIR.mkdir(exist_ok=True)
        path.write_text(json.dumps(got, ensure_ascii=False, indent=1, sort_keys=True))
        if UPDATE:
            pytest.skip(f"updated {path.name}")
    want = json.loads(path.read_text())
    assert got == want, f"golden mismatch for {name} (regenerate with QWEN3_UPDATE_GOLDEN=1 if intended)"


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("golden_ckpt")
    make_synthetic_checkpoint(str(d), "tiny", quant="f16", seed=0)
    make_synthetic_checkpoint(str(d), "tiny", quant="f16", aligner=True, seed=1)
    return str(d)


@pytest.fixture(scope="module")
def engine(model_dir):
    return QwenASREngine(ASREngineConfig(
        model_dir=model_dir,
        llm_fn="qwen3_asr_llm.f16.gguf",
        precision="f32",
        chunk_size=2.0,
        n_ctx=512,
        verbose=False,
        max_new_tokens=16,
        decode_block=8,
        enable_aligner=True,
        align_config=AlignerConfig(
            model_dir=model_dir, llm_fn="qwen3_aligner_llm.f16.gguf",
            precision="f32", n_ctx=512,
        ),
    ))


def _audio(seconds: float, freq: float = 440.0) -> np.ndarray:
    t = np.arange(int(16000 * seconds)) / 16000
    return (np.sin(2 * np.pi * freq * t) * 0.3).astype(np.float32)


def test_golden_engine_transcribe(engine):
    np.random.seed(11)  # silent breaker retries sample; pin their keys
    res = engine.asr(_audio(3.5, 550.0), context="", language="English",
                     chunk_size_sec=2.0, memory_chunks=1, temperature=0.0)
    _check("engine_transcribe", {
        "text": res.text,
        "prefill_tokens": res.performance["prefill_tokens"],
        "decode_tokens": res.performance["decode_tokens"],
        "n_align_items": len(res.alignment.items) if res.alignment else 0,
    })


def test_golden_engine_with_context_language(engine):
    np.random.seed(11)
    res = engine.asr(_audio(1.5, 330.0), context="golden test context",
                     language="Chinese", chunk_size_sec=2.0, temperature=0.0)
    _check("engine_context", {
        "text": res.text,
        "prefill_tokens": res.performance["prefill_tokens"],
    })


def test_golden_aligner(engine):
    ares = engine.aligner.align(_audio(1.2, 660.0), "hello world again",
                                language="English", offset_sec=0.5)
    _check("aligner", {
        "items": [
            {"text": it.text, "start": round(it.start_time, 3), "end": round(it.end_time, 3)}
            for it in ares.items
        ],
    })


def test_golden_streaming(engine):
    from qwen3_asr_gguf_tpu.runtime.streaming import StreamingTranscriber

    st = StreamingTranscriber(engine, language="English", temperature=0.0,
                              chunk_size_sec=1.0)
    state = st.init_state()
    texts = []
    audio = _audio(2.5, 550.0)
    for off in range(0, len(audio), 8000):
        st.feed(state, audio[off : off + 8000])
        texts.append(state.text)
    st.finish(state)
    texts.append(state.text)
    _check("streaming", {"texts": texts})


@pytest.fixture(scope="module")
def q4k_dir(tmp_path_factory):
    # q4_k-storable tiny shapes (256-divisible dims; plain "tiny" falls
    # back to f16 tensors the int8/int4 loaders reject)
    import qwen3_asr_gguf_tpu.models.configs as C

    C.PRESETS["tiny-256"] = C.ThinkerConfig(
        audio=C.AudioEncoderConfig(
            num_mel_bins=128, d_model=64, encoder_layers=1,
            encoder_attention_heads=4, encoder_ffn_dim=128,
            downsample_hidden_size=32, output_dim=256,
        ),
        text=C.TextDecoderConfig(
            vocab_size=512, hidden_size=256, num_layers=2, num_heads=4,
            num_kv_heads=2, head_dim=64, intermediate_size=512,
        ),
    )
    d = tmp_path_factory.mktemp("golden_q4k_ckpt")
    make_synthetic_checkpoint(str(d), "tiny-256", quant="q4_k", seed=0)
    return str(d)


@pytest.mark.parametrize("precision", ["int8", "int4"])
def test_golden_quantized_engine(q4k_dir, precision):
    """Golden traces for the QUANTIZED engines (VERDICT r2 weak #8: the
    int8/int4 paths asserted almost nothing — a numerical regression in the
    kernel/interpret path would have passed the suite). Greedy decode on a
    fixed-seed q4_k checkpoint is deterministic per precision."""
    engine = QwenASREngine(ASREngineConfig(
        model_dir=q4k_dir,
        llm_fn="qwen3_asr_llm.q4_k.gguf",
        precision=precision,
        chunk_size=2.0,
        n_ctx=512,
        verbose=False,
        max_new_tokens=16,
        decode_block=8,
    ))
    np.random.seed(11)
    res = engine.asr(_audio(3.5, 550.0), context="", language="English",
                     chunk_size_sec=2.0, memory_chunks=1, temperature=0.0)
    _check(f"engine_{precision}", {
        "text": res.text,
        "prefill_tokens": res.performance["prefill_tokens"],
        "decode_tokens": res.performance["decode_tokens"],
    })
