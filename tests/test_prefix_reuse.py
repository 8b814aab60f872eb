"""KV prefix reuse: suffix prefill on a reused cache + RoPE re-basing.

The engine keeps the [header | memory-audio] KV from the previous chunk in
the cache instead of re-prefilling it (reference recomputes everything each
chunk, asr.py:269-393). For chunk 2 this is mathematically exact: chunk 1's
current-audio block attended [header, itself], exactly what chunk 2's full
prompt would compute for its memory block at the same positions.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qwen3_asr_gguf_tpu.models import decoder as dec
from qwen3_asr_gguf_tpu.models.configs import TextDecoderConfig

CFG = TextDecoderConfig(
    vocab_size=512, hidden_size=64, num_layers=2, num_heads=4, num_kv_heads=2,
    head_dim=16, intermediate_size=128,
)


def test_forward_prefill_at_matches_full_prefill(rng):
    """Prefilling [prefix] then [suffix] at offset == one full prefill."""
    params = dec.init_params(CFG, jax.random.key(0))
    n_prefix, n_suffix = 18, 13
    t = n_prefix + n_suffix
    embd = jnp.asarray(rng.standard_normal((t, CFG.hidden_size)).astype(np.float32) * 0.1)

    cache_full = dec.init_cache(CFG, 64, dtype=jnp.float32)
    h_full, cache_full = dec.forward_prefill(params, CFG, embd, cache_full)

    cache = dec.init_cache(CFG, 64, dtype=jnp.float32)
    _, cache = dec.forward_prefill(params, CFG, embd[:n_prefix], cache)
    h_suf, cache = dec.forward_prefill_at(
        params, CFG, embd[n_prefix:], cache, jnp.int32(n_prefix), prefix_window=32
    )

    np.testing.assert_allclose(
        np.asarray(h_suf), np.asarray(h_full[n_prefix:]), atol=1e-5, rtol=1e-4
    )
    for l in range(CFG.num_layers):
        np.testing.assert_allclose(
            np.asarray(cache["k"][l][:t]), np.asarray(cache_full["k"][l][:t]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(cache["v"][l][:t]), np.asarray(cache_full["v"][l][:t]), atol=1e-5
        )


def test_forward_prefill_at_respects_length_padding(rng):
    """Bucket padding after the suffix must not change valid outputs."""
    params = dec.init_params(CFG, jax.random.key(1))
    n_prefix, n_valid, pad = 10, 7, 9
    embd_pre = jnp.asarray(rng.standard_normal((n_prefix, CFG.hidden_size)).astype(np.float32) * 0.1)
    suf = rng.standard_normal((n_valid, CFG.hidden_size)).astype(np.float32) * 0.1
    suf_padded = np.concatenate([suf, np.zeros((pad, CFG.hidden_size), np.float32)])

    cache = dec.init_cache(CFG, 64, dtype=jnp.float32)
    _, cache = dec.forward_prefill(params, CFG, embd_pre, cache)
    h1, _ = dec.forward_prefill_at(
        params, CFG, jnp.asarray(suf), cache, jnp.int32(n_prefix), prefix_window=16
    )

    cache2 = dec.init_cache(CFG, 64, dtype=jnp.float32)
    _, cache2 = dec.forward_prefill(params, CFG, embd_pre, cache2)
    h2, _ = dec.forward_prefill_at(
        params, CFG, jnp.asarray(suf_padded), cache2, jnp.int32(n_prefix),
        prefix_window=16, length=jnp.int32(n_valid),
    )
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2[:n_valid]), atol=1e-5)


def test_shift_kv_block_rebases_rope(rng):
    """Moving a KV block re-rotates keys to their new absolute positions."""
    n_ctx, block, src, dst = 64, 8, 20, 4
    hkv, hd = CFG.num_kv_heads, CFG.head_dim
    raw_k = rng.standard_normal((CFG.num_layers, block, hkv, hd)).astype(np.float32)
    raw_v = rng.standard_normal((CFG.num_layers, block, hkv, hd)).astype(np.float32)

    def rot(k, positions):
        cos, sin = dec.rope_cos_sin(jnp.asarray(positions, dtype=jnp.int32), hd, CFG.rope_theta)
        return jax.vmap(lambda kl: dec.apply_rope(kl, cos, sin))(jnp.asarray(k))

    cache = dec.init_cache(CFG, n_ctx, dtype=jnp.float32)
    k_at_src = rot(raw_k, np.arange(src, src + block))
    cache = {
        "k": [c.at[src : src + block].set(k_at_src[l]) for l, c in enumerate(cache["k"])],
        "v": [c.at[src : src + block].set(jnp.asarray(raw_v[l])) for l, c in enumerate(cache["v"])],
    }
    out = dec.shift_kv_block(CFG, cache, jnp.int32(src), jnp.int32(dst), block=block)

    expect_k = rot(raw_k, np.arange(dst, dst + block))
    for l in range(CFG.num_layers):
        np.testing.assert_allclose(
            np.asarray(out["k"][l][dst : dst + block]), np.asarray(expect_k[l]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out["v"][l][dst : dst + block]), raw_v[l], atol=1e-6
        )


def test_two_chunk_reuse_equals_recompute(rng):
    """End-to-end chunk-2 scenario: [hdr|audio1|audio2|suffix] full prefill
    vs reusing chunk 1's [hdr|audio1] KV and prefilling [audio2|suffix]."""
    params = dec.init_params(CFG, jax.random.key(2))
    n_hdr, a, n_suf = 6, 9, 4
    d = CFG.hidden_size
    hdr = rng.standard_normal((n_hdr, d)).astype(np.float32) * 0.1
    audio1 = rng.standard_normal((a, d)).astype(np.float32) * 0.1
    audio2 = rng.standard_normal((a, d)).astype(np.float32) * 0.1
    suf1 = rng.standard_normal((2, d)).astype(np.float32) * 0.1
    suf2 = rng.standard_normal((n_suf, d)).astype(np.float32) * 0.1

    # full chunk-2 prompt
    p2 = jnp.asarray(np.concatenate([hdr, audio1, audio2, suf2]))
    cache_full = dec.init_cache(CFG, 64, dtype=jnp.float32)
    h_full, _ = dec.forward_prefill(params, CFG, p2, cache_full)

    # chunk 1 prefill (its suffix beyond the audio gets overwritten later)
    p1 = jnp.asarray(np.concatenate([hdr, audio1, suf1]))
    cache = dec.init_cache(CFG, 64, dtype=jnp.float32)
    _, cache = dec.forward_prefill(params, CFG, p1, cache)
    # chunk 2 partial prefill from start = n_hdr + a
    h_suf, _ = dec.forward_prefill_at(
        params, CFG, jnp.asarray(np.concatenate([audio2, suf2])), cache,
        jnp.int32(n_hdr + a), prefix_window=16,
    )
    np.testing.assert_allclose(
        np.asarray(h_suf), np.asarray(h_full[n_hdr + a :]), atol=1e-5, rtol=1e-4
    )
