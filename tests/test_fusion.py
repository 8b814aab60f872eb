"""Fused qkv/gateup weights must be numerically identical to unfused."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qwen3_asr_gguf_tpu.models import decoder as dec
from qwen3_asr_gguf_tpu.models import params as P
from qwen3_asr_gguf_tpu.models.configs import TextDecoderConfig
from qwen3_asr_gguf_tpu.ops.qtensor import Q4Weight, quantize_dense

CFG = TextDecoderConfig(
    vocab_size=128, hidden_size=64, num_layers=2, num_heads=4, num_kv_heads=2,
    head_dim=16, intermediate_size=96,
)


def test_fused_dense_matches_unfused(rng):
    params = dec.init_params(CFG, jax.random.key(0))
    fused = P.fuse_layer_weights(params)
    assert "qkv_proj" in fused["layers"] and "q_proj" not in fused["layers"]

    embd = jnp.asarray(rng.standard_normal((9, CFG.hidden_size)).astype(np.float32))
    cache = dec.init_cache(CFG, 16, dtype=jnp.float32)
    h_ref, _ = dec.forward_prefill(params, CFG, embd, cache)
    h_fused, _ = dec.forward_prefill(fused, CFG, embd, cache)
    np.testing.assert_allclose(np.asarray(h_fused), np.asarray(h_ref), atol=1e-5)

    # step path too
    _, c1 = dec.forward_prefill(params, CFG, embd[:5], dec.init_cache(CFG, 16, dtype=jnp.float32))
    _, c2 = dec.forward_prefill(fused, CFG, embd[:5], dec.init_cache(CFG, 16, dtype=jnp.float32))
    s1, _ = dec.forward_step(params, CFG, embd[5], c1, jnp.int32(5))
    s2, _ = dec.forward_step(fused, CFG, embd[5], c2, jnp.int32(5))
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), atol=1e-5)


def test_fused_q4_matches_unfused(rng):
    cfg = TextDecoderConfig(
        vocab_size=64, hidden_size=128, num_layers=2, num_heads=4, num_kv_heads=2,
        head_dim=32, intermediate_size=128,
    )
    params = dec.init_params(cfg, jax.random.key(1))
    qlayers = dict(params["layers"])
    for name in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj", "o_proj", "down_proj"):
        w = np.asarray(params["layers"][name])
        qlayers[name] = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[quantize_dense(w[i]) for i in range(w.shape[0])]
        )
    qparams = dict(params, layers=qlayers)
    fused = P.fuse_layer_weights(qparams)
    assert isinstance(fused["layers"]["qkv_proj"], Q4Weight)

    embd = jnp.asarray(rng.standard_normal((7, cfg.hidden_size)).astype(np.float32))
    cache = dec.init_cache(cfg, 16, dtype=jnp.float32)
    h_ref, _ = dec.forward_prefill(qparams, cfg, embd, cache)
    h_fused, _ = dec.forward_prefill(fused, cfg, embd, cache)
    np.testing.assert_allclose(np.asarray(h_fused), np.asarray(h_ref), atol=1e-5)
