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


pytestmark = pytest.mark.slow  # compile-heavy; fast lane: -m "not slow"
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


def _pack_int4_params(rng, cfg):
    """Decoder params with PACKED Q4KMXUWeight layer projections + lm_head
    (the engine's int4 load layout, stacked [L, ...] container fields)."""
    from qwen3_asr_gguf_tpu.formats import quants as q
    from qwen3_asr_gguf_tpu.ops.pallas_q4k import Q4KMXUWeight, pack_q4k_mxu

    def pack_stack(shapes):
        fields = [[], [], [], []]
        for n, k in shapes:
            w = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
            parts = pack_q4k_mxu(q.pack_q4_direct(w))
            for f, p in zip(fields, parts):
                f.append(p)
        return Q4KMXUWeight(*(jnp.asarray(np.stack(f)) for f in fields))

    d, hq, hkv, hd, m, L = (cfg.hidden_size, cfg.num_heads, cfg.num_kv_heads,
                            cfg.head_dim, cfg.intermediate_size, cfg.num_layers)
    layers = {
        "q_proj": pack_stack([(hq * hd, d)] * L),
        "k_proj": pack_stack([(hkv * hd, d)] * L),
        "v_proj": pack_stack([(hkv * hd, d)] * L),
        "o_proj": pack_stack([(d, hq * hd)] * L),
        "gate_proj": pack_stack([(m, d)] * L),
        "up_proj": pack_stack([(m, d)] * L),
        "down_proj": pack_stack([(d, m)] * L),
        "attn_norm": jnp.ones((L, d), jnp.float32),
        "mlp_norm": jnp.ones((L, d), jnp.float32),
        "q_norm": jnp.ones((L, hd), jnp.float32),
        "k_norm": jnp.ones((L, hd), jnp.float32),
    }

    def one_head():
        from qwen3_asr_gguf_tpu.ops.pallas_q4k import from_packed_q4

        w = (rng.standard_normal((cfg.vocab_size, d)) * 0.1).astype(np.float32)
        return from_packed_q4(q.pack_q4_direct(w))

    return {
        "embed": jnp.asarray((rng.standard_normal((cfg.vocab_size, d)) * 0.1)
                             .astype(np.float32)),
        "layers": layers,
        "final_norm": jnp.ones((d,), jnp.float32),
        "lm_head": one_head(),
    }


def test_int4_tp_decode_matches_single_device(rng):
    """Packed int4 TP (VERDICT r3 #5): the shard_map decode step over
    Megatron-sharded Q4KMXUWeight tiles — psums at o_proj/down_proj, vocab
    all_gather — is token-exact vs the single-device packed path. Geometry
    chosen so K splits land on whole 256 superblocks at model=4."""
    import dataclasses

    from qwen3_asr_gguf_tpu.models.configs import TextDecoderConfig
    from qwen3_asr_gguf_tpu.parallel.sharding import int4_tp_supported

    # geometry where every projection rides the PACKED kernel on BOTH
    # sides (single-device AND each model=4 shard: local N stays a BN=512
    # tile, K splits stay pick_subk-able) — the packed kernel quantizes
    # activations in-kernel, so a projection that switches to the dense
    # fallback on one side only would differ in rounding, not sharding
    cfg = TextDecoderConfig(
        vocab_size=512, hidden_size=512, num_layers=2, num_heads=16,
        num_kv_heads=16, head_dim=128, intermediate_size=2048,
    )
    assert int4_tp_supported(cfg, 4)
    params = _pack_int4_params(rng, cfg)
    embd = (rng.standard_normal((20, cfg.hidden_size)) * 0.1).astype(np.float32)

    ref_gen = Generator(params, cfg, n_ctx=128, block=8, cache_dtype=jnp.float32)
    assert ref_gen._tp_axis is None
    ref = _run_greedy(ref_gen, embd, steps=1)

    mesh = make_mesh({"data": 2, "model": 4})
    tp_gen = Generator(params, cfg, n_ctx=128, block=8,
                       cache_dtype=jnp.float32, mesh=mesh)
    assert tp_gen._tp_axis == "model"  # no int8 remap: containers sharded
    got = _run_greedy(tp_gen, embd, steps=1)
    # one block of greedy tokens: row-parallel splits change the K-step
    # tiling (pick_subk on K/4) and the psum tree order, so agreement is
    # exact-modulo-fp-ties — with random logits over 512 classes, longer
    # runs eventually hit a ~1e-7-gap tie and flip one token. 8 tokens at
    # fixed seeds are deterministic and pin the sharding correctness
    # (a layout/psum bug diverges at token 1, catastrophically).
    assert ref == got and len(ref) > 0, (ref, got)
