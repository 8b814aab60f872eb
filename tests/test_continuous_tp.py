"""Tensor-parallel ContinuousBatcher on the virtual CPU mesh.

VERDICT r4 ask #6: the serving stack (batched rows decode) gets a mesh
variant — shard_map over Megatron tiles with psums at o_proj/down_proj and
kv-head-sharded row caches (decoder.forward_step_rows tp_axis), matching
the reference's only serving-scale story (vLLM TP,
qwen_asr/core/vllm_backend/). Greedy transcripts must equal the
single-device batcher exactly.
"""

import numpy as np
import pytest

import jax

pytestmark = [
    pytest.mark.slow,  # compile-heavy; fast lane: -m "not slow"
    pytest.mark.skipif(
        len(jax.devices()) < 2, reason="needs >= 2 virtual devices"
    ),
]

from qwen3_asr_gguf_tpu.export.convert import make_synthetic_checkpoint
from qwen3_asr_gguf_tpu.runtime.continuous import ContinuousBatcher
from qwen3_asr_gguf_tpu.runtime.engine import QwenASREngine
from qwen3_asr_gguf_tpu.schema import ASREngineConfig


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cb_tp_ckpt")
    make_synthetic_checkpoint(str(d), "tiny", quant="f16")
    return str(d)


def _engine(ckpt_dir, mesh_shape=None):
    return QwenASREngine(ASREngineConfig(
        model_dir=ckpt_dir, llm_fn="qwen3_asr_llm.f16.gguf", precision="f32",
        chunk_size=2.0, n_ctx=256, verbose=False, max_new_tokens=8,
        decode_block=8, mesh_shape=mesh_shape,
    ))


def _audios():
    rng = np.random.default_rng(0)
    t = np.arange(16000) / 16000
    return [
        (np.sin(2 * np.pi * f * t) * 0.3
         + rng.standard_normal(len(t)) * 0.01).astype(np.float32)
        for f in (220.0, 330.0, 440.0)
    ]


def _run(batcher, audios):
    outs = [
        batcher.submit(a, language="English", temperature=0.0, timeout=300.0)
        for a in audios
    ]
    return [o.text for o in outs]


def test_tp_batcher_matches_single_device(ckpt_dir):
    audios = _audios()

    eng_ref = _engine(ckpt_dir)
    cb_ref = ContinuousBatcher(eng_ref, max_batch=4, block=8, max_new_tokens=8)
    try:
        ref = _run(cb_ref, audios)
    finally:
        cb_ref.close()

    eng_tp = _engine(ckpt_dir, mesh_shape={"data": 4, "model": 2})
    assert eng_tp.generator.mesh is not None
    cb_tp = ContinuousBatcher(eng_tp, max_batch=4, block=8, max_new_tokens=8)
    assert cb_tp._tp == 2
    try:
        got = _run(cb_tp, audios)
    finally:
        cb_tp.close()

    assert ref == got and all(isinstance(t, str) for t in ref)
