"""Composed-oracle end-to-end parity: engine.asr vs the REFERENCE torch model.

Module-level gates (test_encoder/test_decoder) prove each stage matches its
torch oracle, but composition bugs — prompt layout off-by-one, audio splice
ordering, length-formula drift — live BETWEEN stages. This test runs the
reference's own composed semantics end to end:

    torch mel -> Qwen3ASRAudioEncoder tower -> masked_scatter merge ->
    thinker greedy generate with eos [im_end, endoftext]
    (/root/reference/qwen_asr/core/transformers_backend/
     modeling_qwen3_asr.py:1158-1204 forward, :1099-1133 get_audio_features)

against `QwenASREngine.asr` on the SAME tiny real-architecture weights,
converted through our production `export/convert.convert_hf_checkpoint`
(exercising the HF->model-dir toolchain on a real torch checkpoint, not a
synthetic one), and asserts transcript equality — single-chunk and
multi-chunk with carried memory (reference chunk loop, asr.py:269-404).

Prompt layout mirrored from the reference engine (asr.py:80-104):
  [im_start] tk("system\\n{ctx}") [im_end] [im_start] tk("user\\n")
  [audio_start] AUDIO [audio_end] [im_end] [im_start]
  tk("assistant\\nlanguage {L}") [asr_text] tk(prefix)
One deliberate divergence is mirrored on the oracle side: the carried
prefix rides as RAW TOKENS (our engine) rather than re-tokenized text (the
reference decodes+re-encodes, which mangles split multibyte sequences —
see engine.trim_prefix_tokens).
"""

from __future__ import annotations

import importlib
import sys
import types
from pathlib import Path

import numpy as np
import pytest

from qwen3_asr_gguf_tpu.runtime.engine import QwenASREngine
from qwen3_asr_gguf_tpu.schema import ASREngineConfig


pytestmark = pytest.mark.slow  # compile-heavy; fast lane: -m "not slow"
REF_TB = "/root/reference/qwen_asr/core/transformers_backend"

# synthetic-512 tokenizer special ids (text/tokenizer.build_synthetic_tokenizer:
# 256 byte tokens, then specials in declaration order)
IM_START, IM_END, EOT = 256, 257, 258
AUDIO_START, AUDIO_END, AUDIO_PAD, ASR_TEXT = 259, 260, 261, 262

CHUNK_SEC = 2.0
MAX_NEW = 12
ROLLBACK = 5
SR = 16_000


def _load_ref_modeling():
    """Import the reference torch modeling without executing the qwen_asr
    package __init__ (it imports nagisa/librosa, absent here)."""
    torch = pytest.importorskip("torch")
    if "ref_tb" not in sys.modules:
        pkg = types.ModuleType("ref_tb")
        pkg.__path__ = [REF_TB]
        sys.modules["ref_tb"] = pkg
    try:
        modeling = importlib.import_module("ref_tb.modeling_qwen3_asr")
        config_mod = importlib.import_module("ref_tb.configuration_qwen3_asr")
    except Exception as e:  # transformers-version drift
        pytest.skip(f"reference modeling not importable: {e!r}")
    return torch, modeling, config_mod


@pytest.fixture(scope="module")
def oracle_setup(tmp_path_factory):
    torch, modeling, config_mod = _load_ref_modeling()

    audio_cfg = dict(
        num_mel_bins=128, d_model=64, encoder_layers=2,
        encoder_attention_heads=4, encoder_ffn_dim=128,
        downsample_hidden_size=32, output_dim=48,
        # HF semantics: conv chunks are 2*n_window frames; the modeling's
        # hard-coded %100 length formula requires n_window=50 (as shipped
        # checkpoints set) — our converter doubles it on import
        n_window=50, n_window_infer=400, conv_chunksize=500,
        max_source_positions=1500,
    )
    text_cfg = dict(
        vocab_size=512, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=96, rms_norm_eps=1e-6, rope_theta=5e6,
        tie_word_embeddings=False,
        # interleaved-mrope sections scaled to head_dim 16 (real ckpts use
        # [24,20,20] at head_dim 128); ASR uses 3 identical planes, so the
        # interleave is a no-op either way (modeling_qwen3_asr.py:800-817)
        rope_scaling={"rope_type": "default", "mrope_section": [4, 2, 2]},
    )
    cfg = config_mod.Qwen3ASRThinkerConfig(
        audio_config=audio_cfg, text_config=text_cfg,
        audio_token_id=AUDIO_PAD, audio_start_token_id=AUDIO_START,
    )
    torch.manual_seed(7)
    model = modeling.Qwen3ASRThinkerForConditionalGeneration(cfg)
    model.eval()

    hf_dir = tmp_path_factory.mktemp("oracle_hf")
    model.save_pretrained(str(hf_dir), safe_serialization=True)

    from qwen3_asr_gguf_tpu.export.convert import convert_hf_checkpoint

    model_dir = tmp_path_factory.mktemp("oracle_model")
    convert_hf_checkpoint(str(hf_dir), str(model_dir), quant="f16")

    engine = QwenASREngine(ASREngineConfig(
        model_dir=str(model_dir), llm_fn="qwen3_asr_llm.f16.gguf",
        precision="f32", chunk_size=CHUNK_SEC, n_ctx=512, verbose=False,
        max_new_tokens=MAX_NEW, decode_block=8, enable_aligner=False,
    ))
    # the f16 GGUF rung rounds decoder weights to half precision; the torch
    # oracle must score with the SAME rounded weights or near-margin greedy
    # tokens flip on storage noise rather than composition bugs
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(p.to(torch.float16).to(torch.float32))
    return torch, model, engine


def _audio(seconds: float, seed: int = 3) -> np.ndarray:
    t = np.arange(int(SR * seconds)) / SR
    rng = np.random.default_rng(seed)
    y = sum(
        a * np.sin(2 * np.pi * f * t + p)
        for a, f, p in zip([0.4, 0.2, 0.1], [220.0, 550.0, 1320.0],
                           rng.uniform(0, 6, 3))
    )
    return (y * (0.5 + 0.5 * np.sin(2 * np.pi * 1.3 * t))).astype(np.float32)


def _prompt_ids(engine, n_audio: int, prefix_tokens: list[int],
                language: str) -> list[int]:
    """Reference prompt layout (asr.py:80-104) with raw-token prefix carry."""
    tk = engine.model.tokenize
    return (
        [IM_START] + tk("system\nYou are a helpful assistant.") + [IM_END]
        + [IM_START] + tk("user\n") + [AUDIO_START]
        + [AUDIO_PAD] * n_audio
        + [AUDIO_END, IM_END, IM_START] + tk(f"assistant\nlanguage {language}")
        + [ASR_TEXT] + list(prefix_tokens)
    )


def _oracle_generate(torch, model, mels: list[np.ndarray],
                     prompt_ids: list[int], max_new: int) -> list[int]:
    """Greedy decode by full recompute each step (tiny model): the composed
    reference forward — tower on each mel, masked_scatter at AUDIO_PAD
    positions, thinker logits — with eos {im_end, endoftext} stop."""
    feats = torch.tensor(np.stack(mels), dtype=torch.float32)  # [n, 128, T]
    fam = torch.ones(feats.shape[0], feats.shape[2], dtype=torch.long)
    ids = list(prompt_ids)
    out_tokens: list[int] = []
    with torch.no_grad():
        for _ in range(max_new):
            t_ids = torch.tensor([ids], dtype=torch.long)
            out = model(
                input_ids=t_ids, input_features=feats,
                feature_attention_mask=fam,
                attention_mask=torch.ones_like(t_ids),
            )
            tok = int(out.logits[0, -1].argmax())
            if tok in (IM_END, EOT):
                break
            ids.append(tok)
            out_tokens.append(tok)
    return out_tokens


def _mel(engine, audio: np.ndarray) -> np.ndarray:
    from qwen3_asr_gguf_tpu.audio.mel import log_mel_np

    return log_mel_np(audio, engine.encoder.frontend.filters)


def test_single_chunk_transcript_matches_reference(oracle_setup):
    torch, model, engine = oracle_setup
    audio = _audio(CHUNK_SEC)
    mel = _mel(engine, audio)
    n_audio = engine.encoder.valid_tokens(len(audio))

    oracle_toks = _oracle_generate(
        torch, model, [mel],
        _prompt_ids(engine, n_audio, [], "English"), MAX_NEW,
    )
    expected = engine.model.decode(oracle_toks)

    res = engine.asr(audio, context="", language="English",
                     chunk_size_sec=CHUNK_SEC, temperature=0.0)
    assert res.text == expected, (res.text, expected, oracle_toks)


def test_multi_chunk_memory_matches_reference(oracle_setup):
    """Two exact chunks: chunk 1's prompt carries chunk 0's audio embedding
    AND its stable (rollback-trimmed) tokens — the full memory/prefix
    composition of the reference chunk loop (asr.py:269-393)."""
    torch, model, engine = oracle_setup
    audio = _audio(2 * CHUNK_SEC, seed=11)
    c0, c1 = audio[: int(SR * CHUNK_SEC)], audio[int(SR * CHUNK_SEC):]
    mel0, mel1 = _mel(engine, c0), _mel(engine, c1)
    n0 = engine.encoder.valid_tokens(len(c0))
    n1 = engine.encoder.valid_tokens(len(c1))

    toks0 = _oracle_generate(
        torch, model, [mel0], _prompt_ids(engine, n0, [], "English"), MAX_NEW,
    )
    stable0 = toks0[: max(0, len(toks0) - ROLLBACK)]
    toks1 = _oracle_generate(
        torch, model, [mel0, mel1],
        _prompt_ids(engine, n0 + n1, stable0, "English"), MAX_NEW,
    )
    expected = engine.model.decode(stable0) + engine.model.decode(toks1)

    res = engine.asr(audio, context="", language="English",
                     chunk_size_sec=CHUNK_SEC, memory_chunks=1,
                     temperature=0.0, rollback_num=ROLLBACK)
    assert res.text == expected, (res.text, expected)


def test_three_chunk_exact_memory_reuse_matches_reference(oracle_setup):
    """Three chunks: chunk 2's prompt drops chunk 0 from the memory deque
    (memory_num=1) and carries [chunk-1 audio | chunk-1 stable tokens].
    With exact header-only KV reuse this must equal the reference recompute
    — the case the old RoPE-rebase approximation got wrong."""
    torch, model, engine = oracle_setup
    audio = _audio(3 * CHUNK_SEC, seed=23)
    n = int(SR * CHUNK_SEC)
    chunks = [audio[i * n : (i + 1) * n] for i in range(3)]
    mels = [_mel(engine, c) for c in chunks]
    na = [engine.encoder.valid_tokens(len(c)) for c in chunks]

    toks0 = _oracle_generate(
        torch, model, [mels[0]], _prompt_ids(engine, na[0], [], "English"),
        MAX_NEW,
    )
    stable0 = toks0[: max(0, len(toks0) - ROLLBACK)]
    toks1 = _oracle_generate(
        torch, model, [mels[0], mels[1]],
        _prompt_ids(engine, na[0] + na[1], stable0, "English"), MAX_NEW,
    )
    stable1 = toks1[: max(0, len(toks1) - ROLLBACK)]
    toks2 = _oracle_generate(
        torch, model, [mels[1], mels[2]],
        _prompt_ids(engine, na[1] + na[2], stable1, "English"), MAX_NEW,
    )
    expected = (engine.model.decode(stable0) + engine.model.decode(stable1)
                + engine.model.decode(toks2))

    res = engine.asr(audio, context="", language="English",
                     chunk_size_sec=CHUNK_SEC, memory_chunks=1,
                     temperature=0.0, rollback_num=ROLLBACK)
    assert res.text == expected, (res.text, expected)


def test_multi_chunk_no_prefix_reuse_matches_reference(oracle_setup):
    """Same two-chunk parity with kv_prefix_reuse disabled: the from-scratch
    full-prompt path must compose identically (reference recomputes every
    chunk prompt, asr.py:269-393)."""
    torch, model, engine = oracle_setup
    audio = _audio(2 * CHUNK_SEC, seed=11)
    c0, c1 = audio[: int(SR * CHUNK_SEC)], audio[int(SR * CHUNK_SEC):]
    n0 = engine.encoder.valid_tokens(len(c0))
    n1 = engine.encoder.valid_tokens(len(c1))

    toks0 = _oracle_generate(
        torch, model, [_mel(engine, c0)],
        _prompt_ids(engine, n0, [], "English"), MAX_NEW,
    )
    stable0 = toks0[: max(0, len(toks0) - ROLLBACK)]
    toks1 = _oracle_generate(
        torch, model, [_mel(engine, c0), _mel(engine, c1)],
        _prompt_ids(engine, n0 + n1, stable0, "English"), MAX_NEW,
    )
    expected = engine.model.decode(stable0) + engine.model.decode(toks1)

    import dataclasses

    old_cfg = engine.config
    engine.config = dataclasses.replace(old_cfg, kv_prefix_reuse=False)
    try:
        res = engine.asr(audio, context="", language="English",
                         chunk_size_sec=CHUNK_SEC, memory_chunks=1,
                         temperature=0.0, rollback_num=ROLLBACK)
    finally:
        engine.config = old_cfg
    assert res.text == expected, (res.text, expected)
