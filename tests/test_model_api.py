"""High-level Qwen3ASRModel API + low-energy splitting tests."""

import numpy as np
import pytest

from qwen3_asr_gguf_tpu.audio.split import find_low_energy_cut, split_audio_into_chunks
from qwen3_asr_gguf_tpu.export.convert import make_synthetic_checkpoint
from qwen3_asr_gguf_tpu.runtime.model_api import ASRResult, Qwen3ASRModel

SR = 16_000


def test_low_energy_cut_prefers_silence():
    # loud | silence at 2.0-2.2s | loud ; nominal cut at 1.9s, search 0.5s
    audio = np.ones(SR * 4, np.float32) * 0.5
    audio[int(2.0 * SR) : int(2.2 * SR)] = 0.001
    cut = find_low_energy_cut(audio, int(1.9 * SR), search=SR // 2)
    assert 2.0 * SR <= cut <= 2.2 * SR


def test_split_audio_into_chunks():
    audio = np.random.default_rng(0).standard_normal(SR * 10).astype(np.float32) * 0.1
    audio[int(4.8 * SR) : int(5.2 * SR)] = 0.0  # quiet seam near 5 s
    pieces = split_audio_into_chunks(audio, chunk_sec=5.0, search_sec=1.0)
    assert len(pieces) == 2
    total = sum(len(p) for p, _ in pieces)
    assert total == len(audio)
    # second piece offset aligns with first piece length
    assert abs(pieces[1][1] * SR - len(pieces[0][0])) < 1
    # cut landed inside the quiet seam
    assert 4.3 * SR <= len(pieces[0][0]) <= 5.7 * SR


def test_split_short_audio_passthrough():
    audio = np.zeros(SR, np.float32)
    pieces = split_audio_into_chunks(audio, chunk_sec=5.0)
    assert len(pieces) == 1 and pieces[0][1] == 0.0


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    d = tmp_path_factory.mktemp("api_ckpt")
    make_synthetic_checkpoint(str(d), "tiny", quant="f16")
    return Qwen3ASRModel.from_pretrained(
        str(d), precision="f32", n_ctx=512, chunk_size=2.0,
        llm_fn="qwen3_asr_llm.f16.gguf", max_new_tokens=10, decode_block=8,
    )


def test_transcribe_batch_inputs(model):
    a1 = (np.sin(2 * np.pi * 440 * np.arange(SR) / SR) * 0.3).astype(np.float32)
    a2 = (np.sin(2 * np.pi * 330 * np.arange(SR) / SR) * 0.3).astype(np.float32)
    out = model.transcribe([a1, (a2, SR)], language="English", temperature=0.0)
    assert len(out) == 2
    assert all(isinstance(r, ASRResult) for r in out)
    assert out[0].language == "English"


def test_transcribe_too_short_is_empty(model):
    out = model.transcribe(np.zeros(100, np.float32))
    assert out[0].text == ""


def test_transcribe_long_audio_splits(model):
    audio = (np.sin(2 * np.pi * 440 * np.arange(SR * 7) / SR) * 0.3).astype(np.float32)
    audio[3 * SR : int(3.5 * SR)] = 0.0
    out = model.transcribe(audio, language="English", max_chunk_sec=3.0)
    assert len(out) == 1
    assert isinstance(out[0].text, str)


def test_language_auto_detection_parses_protocol(model):
    """With language=None the engine builds the prompt WITHOUT the forced
    <asr_text> and parses `language X<asr_text>body` output (reference
    qwen3_asr.py:454-465, utils.py:403-470)."""
    from qwen3_asr_gguf_tpu.schema import DecodeResult

    eng = model.engine

    # 1. prompt shape: auto mode stops at "assistant\n" (no <asr_text>)
    ids_auto, _ = eng._build_prompt_ids(4, "", "", None, detect_language=True)
    ids_forced, _ = eng._build_prompt_ids(4, "", "", "English")
    assert eng.ID_ASR_TEXT not in ids_auto.tolist()
    assert eng.ID_ASR_TEXT in ids_forced.tolist()

    # 2. end-to-end parse: synthetic decode emitting the protocol
    def fake_safe_decode(ids, mask, embd, rollback_num, is_last, temperature,
                         reuse=None, max_new_tokens=None):
        r = DecodeResult()
        r.text = "language English<asr_text>hi there"
        r.n_prefill = int(len(ids))
        r.n_generate = 5
        return r, None

    orig = eng._safe_decode
    eng._safe_decode = fake_safe_decode
    try:
        res = model.transcribe(np.zeros(SR, np.float32) * 0.0 + 0.01)
    finally:
        eng._safe_decode = orig
    assert res[0].language == "English"
    assert res[0].text == "hi there"


def test_language_forced_passthrough(model):
    from qwen3_asr_gguf_tpu.schema import DecodeResult

    eng = model.engine

    def fake_safe_decode(ids, mask, embd, rollback_num, is_last, temperature,
                         reuse=None, max_new_tokens=None):
        r = DecodeResult()
        r.text = "plain body"
        r.n_prefill = int(len(ids))
        r.n_generate = 2
        return r, None

    orig = eng._safe_decode
    eng._safe_decode = fake_safe_decode
    try:
        res = model.transcribe(np.full(SR, 0.01, np.float32), language="zh")
    finally:
        eng._safe_decode = orig
    assert res[0].language == "Chinese"
    assert res[0].text == "plain body"
