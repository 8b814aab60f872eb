"""Sharded (tensor-parallel) INFERENCE on the virtual CPU mesh.

VERDICT r2 #2: `mesh_shape` must drive real sharded prefill + decode, and
sharded greedy tokens must equal the single-device run (same math, XLA
inserts the collectives — parallel/sharding.py Megatron specs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qwen3_asr_gguf_tpu.models import decoder as dec
from qwen3_asr_gguf_tpu.models.configs import PRESETS
from qwen3_asr_gguf_tpu.parallel.sharding import make_mesh
from qwen3_asr_gguf_tpu.runtime.generate import Generator

CFG = PRESETS["tiny"].text


def _prompt(rng, t=24):
    return (rng.standard_normal((t, CFG.hidden_size)) * 0.1).astype(np.float32)


def _run_greedy(gen: Generator, embd: np.ndarray, steps=2) -> list:
    st = gen.start(embd, temperature=0.0, seed=7)
    toks = []
    for _ in range(steps):
        t, st, fin = gen.decode_block(st, temperature=0.0)
        toks.extend(t)
        if fin:
            break
    return toks


@pytest.fixture(scope="module")
def params():
    return jax.device_get(dec.init_params(CFG, jax.random.key(0)))


def test_sharded_generator_matches_single_device(params, rng):
    embd = _prompt(rng)
    ref = _run_greedy(
        Generator(params, CFG, n_ctx=128, block=8, cache_dtype=jnp.float32), embd
    )
    mesh = make_mesh({"model": 2}, devices=jax.devices()[:2])
    got = _run_greedy(
        Generator(params, CFG, n_ctx=128, block=8, cache_dtype=jnp.float32, mesh=mesh),
        embd,
    )
    assert ref == got and len(ref) > 0


def test_sharded_spliced_prefill_matches(params, rng):
    """The engine's device-splice prefill path under TP."""
    t = 20
    ids = np.zeros(t, np.int32)
    ids[:4] = [1, 2, 3, 4]
    ids[16:] = [5, 6, 7, 8]
    mask = np.zeros(t, bool)
    mask[4:16] = True
    audio = jnp.asarray((rng.standard_normal((12, CFG.hidden_size)) * 0.1).astype(np.float32))

    def run(gen):
        st = gen.start_spliced(ids, mask, audio, temperature=0.0, seed=3)
        toks, st, _ = gen.decode_block(st, temperature=0.0)
        return toks

    ref = run(Generator(params, CFG, n_ctx=128, block=8, cache_dtype=jnp.float32))
    mesh = make_mesh({"model": 2}, devices=jax.devices()[:2])
    got = run(Generator(params, CFG, n_ctx=128, block=8, cache_dtype=jnp.float32, mesh=mesh))
    assert ref == got and len(ref) > 0


def test_engine_mesh_shape_runs(tmp_path_factory):
    """ASREngineConfig.mesh_shape is live: the engine TP-shards the decoder
    and transcribes on the mesh (data axis idle for single-stream)."""
    from qwen3_asr_gguf_tpu.export.convert import make_synthetic_checkpoint
    from qwen3_asr_gguf_tpu.runtime.engine import QwenASREngine
    from qwen3_asr_gguf_tpu.schema import ASREngineConfig

    d = tmp_path_factory.mktemp("mesh_ckpt")
    make_synthetic_checkpoint(str(d), "tiny", quant="f16")
    cfg = ASREngineConfig(
        model_dir=str(d), llm_fn="qwen3_asr_llm.f16.gguf", precision="f32",
        chunk_size=2.0, n_ctx=512, verbose=False, max_new_tokens=8,
        decode_block=8, mesh_shape={"data": 4, "model": 2},
    )
    engine = QwenASREngine(cfg)
    assert engine.generator.mesh is not None
    t = np.arange(16000) / 16000
    audio = (np.sin(2 * np.pi * 440 * t) * 0.3).astype(np.float32)
    res = engine.asr(audio, context="", language="English",
                     chunk_size_sec=2.0, temperature=0.0)
    assert isinstance(res.text, str)

    # sharded weights really live on the mesh, split over `model`
    from jax.sharding import PartitionSpec as P

    lm = engine.generator.params["lm_head"]
    arr = lm.q if hasattr(lm, "q") else lm
    assert len(arr.sharding.device_set) == 8
    assert arr.sharding.spec == P("model", None)
