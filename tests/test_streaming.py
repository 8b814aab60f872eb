"""Streaming transcriber tests (tiny synthetic checkpoint)."""

import numpy as np
import pytest

from qwen3_asr_gguf_tpu.export.convert import make_synthetic_checkpoint
from qwen3_asr_gguf_tpu.runtime.engine import QwenASREngine
from qwen3_asr_gguf_tpu.runtime.streaming import StreamingTranscriber
from qwen3_asr_gguf_tpu.schema import ASREngineConfig



pytestmark = pytest.mark.slow  # compile-heavy; fast lane: -m "not slow"


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_ckpt")
    make_synthetic_checkpoint(str(d), "tiny", quant="f16")
    return QwenASREngine(ASREngineConfig(
        model_dir=str(d), llm_fn="qwen3_asr_llm.f16.gguf", precision="f32",
        chunk_size=2.0, n_ctx=512, verbose=False, max_new_tokens=8, decode_block=8,
    ))


def _audio(seconds, freq=440.0):
    t = np.arange(int(16000 * seconds)) / 16000
    return (np.sin(2 * np.pi * freq * t) * 0.3).astype(np.float32)


def test_prewarm_compiles_ladder(engine):
    """prewarm() must run the (mel bucket, prompt bucket) ladder without
    touching a live session's state or leaving max_new_tokens clamped."""
    from qwen3_asr_gguf_tpu.runtime.streaming import StreamingTranscriber

    st = StreamingTranscriber(engine, language="English", temperature=0.0,
                              chunk_size_sec=1.0)
    saved = engine.config.max_new_tokens
    st.prewarm(max_sec=3.0)
    assert engine.config.max_new_tokens == saved
    state = st.init_state()
    st.feed(state, np.zeros(16_000, np.float32))
    assert isinstance(state.text, str)


def test_stream_chunking(engine):
    st = StreamingTranscriber(engine, chunk_size_sec=1.0, unfixed_chunk_num=1,
                              unfixed_token_num=2, language="English")
    state = st.init_state()
    # feed 0.6s pieces: chunk boundary crossed on the 2nd feed
    st.feed(state, _audio(0.6))
    assert state.chunks_seen == 0
    st.feed(state, _audio(0.6))
    assert state.chunks_seen == 1
    assert isinstance(state.text, str)
    text_after_1 = state.text
    st.feed(state, _audio(1.0))
    assert state.chunks_seen == 2
    final = st.finish(state)
    assert isinstance(final, str)
    assert state.finished
    with pytest.raises(RuntimeError):
        st.feed(state, _audio(0.1))


def test_stream_prefix_rollback(engine):
    st = StreamingTranscriber(engine, chunk_size_sec=1.0, unfixed_chunk_num=1,
                              unfixed_token_num=2, language="English")
    state = st.init_state()
    st.feed(state, _audio(1.0))
    toks_round1 = list(state.tokens)
    # second chunk: prefix must be round1 tokens minus the last 2
    prefix = st._prefix_text(state)
    if len(toks_round1) > 2:
        expect = engine.model.decode(toks_round1[:-2]).rstrip("�")
        assert prefix == expect
    else:
        assert prefix == ""


def test_stream_first_chunks_unprefixed(engine):
    st = StreamingTranscriber(engine, chunk_size_sec=1.0, unfixed_chunk_num=3,
                              unfixed_token_num=2, language="English")
    state = st.init_state()
    st.feed(state, _audio(1.0))
    st.feed(state, _audio(1.0))
    assert state.chunks_seen == 2
    assert st._prefix_text(state) == ""  # still inside unfixed window


def test_finish_flushes_tail(engine):
    st = StreamingTranscriber(engine, chunk_size_sec=2.0, language="English")
    state = st.init_state()
    st.feed(state, _audio(0.7))  # below one chunk
    assert state.chunks_seen == 0
    st.finish(state)
    assert state.chunks_seen == 1  # tail decoded without padding


def test_stream_prefix_trims_to_ctx_budget(engine):
    """A session whose carried transcript outgrows n_ctx must trim the
    decode prompt (oldest text first) instead of overflowing — regression
    for the prompt-of-N-exceeds-n_ctx crash at long accumulations. The
    transcript itself keeps the full history."""
    st = StreamingTranscriber(engine, chunk_size_sec=1.0, unfixed_chunk_num=1,
                              unfixed_token_num=0, language="English",
                              temperature=0.0)
    state = st.init_state()
    state.accum = _audio(1.0)
    state.chunks_seen = 2
    # fabricate an oversized carried transcript (> n_ctx tokens)
    state.tokens = [100 + (i % 50) for i in range(engine.config.n_ctx + 200)]
    st._decode_accum(state)  # must not raise
    assert len(state.tokens) >= engine.config.n_ctx + 200  # history kept
    assert state.text  # transcript includes the full carried prefix


def test_stream_language_autodetect(engine):
    """language=None streams in auto mode: prompt omits <asr_text>, the
    emitted protocol fills state.language and state.text holds the clean
    body (reference qwen3_asr.py:759-761)."""
    from qwen3_asr_gguf_tpu.schema import DecodeResult

    st = StreamingTranscriber(engine, chunk_size_sec=1.0, language=None)
    seen_ids = []

    def fake_safe_decode(ids, mask, embd, rollback_num=0, is_last_chunk=True,
                         temperature=0.0, reuse=None, max_new_tokens=None):
        seen_ids.append(np.asarray(ids))
        r = DecodeResult()
        r.text = "language English<asr_text>hello"
        r.stable_tokens = engine.model.tokenize("language English") + [
            engine.ID_ASR_TEXT
        ] + engine.model.tokenize("hello")
        r.n_prefill = int(len(ids))
        r.n_generate = len(r.stable_tokens)
        return r, None

    orig = engine._safe_decode
    engine._safe_decode = fake_safe_decode
    try:
        state = st.init_state()
        st.feed(state, _audio(1.0))
    finally:
        engine._safe_decode = orig
    assert state.language == "English"
    assert state.text == "hello"
    # the auto prompt must not force <asr_text>
    assert engine.ID_ASR_TEXT not in seen_ids[0].tolist()
