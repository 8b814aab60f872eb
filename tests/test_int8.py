"""Int8 MXU-path weight tests (fidelity + loader integration)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qwen3_asr_gguf_tpu.formats.quants import pack_q4_direct
from qwen3_asr_gguf_tpu.models import decoder as dec
from qwen3_asr_gguf_tpu.models import params as P
from qwen3_asr_gguf_tpu.models.configs import TextDecoderConfig
from qwen3_asr_gguf_tpu.ops.qtensor import Int8Weight, Q4Weight, int8_matmul, matmul, to_int8
from qwen3_asr_gguf_tpu.text.tokenizer import build_synthetic_tokenizer

QCFG = TextDecoderConfig(
    vocab_size=300, hidden_size=256, num_layers=2, num_heads=4, num_kv_heads=2,
    head_dim=64, intermediate_size=512,
)


def test_int8_matmul_fidelity(rng):
    w = rng.standard_normal((128, 256)).astype(np.float32) * 0.05
    x = rng.standard_normal((4, 256)).astype(np.float32)
    iw = to_int8(jnp.asarray(w))
    assert isinstance(iw, Int8Weight)
    out = np.asarray(int8_matmul(jnp.asarray(x), iw))
    ref = x @ w.T
    cos = (out.ravel() @ ref.ravel()) / (np.linalg.norm(out) * np.linalg.norm(ref))
    assert cos > 0.999, cos


def test_to_int8_from_q4(rng):
    w = rng.standard_normal((64, 256)).astype(np.float32)
    q4 = Q4Weight.from_packed(pack_q4_direct(w))
    iw = to_int8(q4)
    x = rng.standard_normal((2, 256)).astype(np.float32)
    out = np.asarray(matmul(jnp.asarray(x), iw))
    ref = np.asarray(matmul(jnp.asarray(x), q4, use_pallas=False))
    cos = (out.ravel() @ ref.ravel()) / (np.linalg.norm(out) * np.linalg.norm(ref))
    assert cos > 0.999  # int8 error is subordinate to the q4 content


def test_loader_int8_precision(tmp_path, rng):
    params = dec.init_params(QCFG, jax.random.key(0))
    tok = build_synthetic_tokenizer(QCFG.vocab_size)
    path = tmp_path / "m.gguf"
    P.save_decoder_gguf(str(path), QCFG, params, tok, quant="q4_k")

    cfg8, p8, _ = P.load_decoder_gguf(str(path), precision="int8")
    assert isinstance(p8["layers"]["q_proj"], Int8Weight)
    assert p8["layers"]["q_proj"].q.shape[0] == QCFG.num_layers
    assert isinstance(p8["lm_head"], Int8Weight)

    cfgd, pd, _ = P.load_decoder_gguf(str(path), precision="f32")
    ids = np.arange(16) % QCFG.vocab_size
    embd = dec.embed_tokens(pd, jnp.asarray(ids)).astype(jnp.float32)
    h_ref, _ = dec.forward_prefill(pd, cfgd, embd, None)
    h_int8, _ = dec.forward_prefill(p8, cfg8, embd, None)
    a, b = np.asarray(h_ref).ravel(), np.asarray(h_int8).ravel()
    cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.95, cos  # q4_k content + int8 requant + int8 activations

    # fused int8 still matches
    fused = P.fuse_layer_weights(p8)
    assert isinstance(fused["layers"]["qkv_proj"], Int8Weight)
    h_fused, _ = dec.forward_prefill(fused, cfg8, embd, None)
    np.testing.assert_allclose(np.asarray(h_fused), np.asarray(h_int8), atol=2e-2, rtol=2e-2)


def test_int8_sidecar_cache(tmp_path, rng):
    """Second load must come from the .int8 sidecar dir, bit-identically."""
    params = dec.init_params(QCFG, jax.random.key(3))
    tok = build_synthetic_tokenizer(QCFG.vocab_size)
    path = tmp_path / "m.gguf"
    P.save_decoder_gguf(str(path), QCFG, params, tok, quant="q4_k")

    _, p1, _ = P.load_decoder_gguf(str(path), precision="int8")
    sidecar = tmp_path / "m.gguf.int8" / "final_norm.npy"
    assert sidecar.exists()
    _, p2, _ = P.load_decoder_gguf(str(path), precision="int8")
    np.testing.assert_array_equal(
        np.asarray(p1["layers"]["q_proj"].q), np.asarray(p2["layers"]["q_proj"].q)
    )
    np.testing.assert_array_equal(
        np.asarray(p1["lm_head"].scale), np.asarray(p2["lm_head"].scale)
    )


def test_int8_kv_cache_close_to_bf16(rng):
    """int8 KV (per-slot-per-head scales) must track the exact-cache decode
    closely: cosine > 0.999 on step hidden states over a 24-token rollout."""
    import jax.numpy as jnp
    from qwen3_asr_gguf_tpu.models import decoder as dec
    from qwen3_asr_gguf_tpu.models.configs import TextDecoderConfig

    cfg = TextDecoderConfig(vocab_size=256, hidden_size=64, num_layers=2,
                            num_heads=4, num_kv_heads=2, head_dim=16,
                            intermediate_size=128)
    params = dec.init_params(cfg, jax.random.key(5))
    embd = rng.standard_normal((8, cfg.hidden_size)).astype(np.float32) * 0.1
    steps = rng.standard_normal((24, cfg.hidden_size)).astype(np.float32) * 0.1

    def rollout(cache_dtype):
        cache = dec.init_cache(cfg, 64, dtype=cache_dtype)
        _, cache = dec.forward_prefill(params, cfg, jnp.asarray(embd), cache)
        hs = []
        for i, e in enumerate(steps):
            h, cache = dec.forward_step(params, cfg, jnp.asarray(e), cache,
                                        jnp.int32(8 + i))
            hs.append(np.asarray(h))
        return np.stack(hs)

    h_exact = rollout(jnp.float32)
    h_q = rollout(jnp.int8)
    a, b = h_exact.ravel(), h_q.ravel()
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999, cos


def test_int8_kv_shift_rebases(rng):
    """shift_kv_block on an int8 cache dequantizes, rotates, requantizes."""
    import jax.numpy as jnp
    from qwen3_asr_gguf_tpu.models import decoder as dec
    from qwen3_asr_gguf_tpu.models.configs import TextDecoderConfig

    cfg = TextDecoderConfig(vocab_size=256, hidden_size=64, num_layers=2,
                            num_heads=4, num_kv_heads=2, head_dim=16,
                            intermediate_size=128)
    cache = dec.init_cache(cfg, 32, dtype=jnp.int8)
    raw = rng.standard_normal((2, 4, 2, 16)).astype(np.float32)

    def rot(k, positions):
        cos, sin = dec.rope_cos_sin(jnp.asarray(positions, dtype=jnp.int32), 16, cfg.rope_theta)
        return jax.vmap(lambda kl: dec.apply_rope(kl, cos, sin))(jnp.asarray(k))

    k_src = np.asarray(rot(raw, np.arange(10, 14)))
    for l in range(2):
        kq, ks = dec._quant_kv(jnp.asarray(k_src[l]))
        cache["k"][l] = cache["k"][l].at[10:14].set(kq)
        cache["k_s"][l] = cache["k_s"][l].at[10:14].set(ks)
        vq, vs = dec._quant_kv(jnp.asarray(raw[l]))
        cache["v"][l] = cache["v"][l].at[10:14].set(vq)
        cache["v_s"][l] = cache["v_s"][l].at[10:14].set(vs)

    out = dec.shift_kv_block(cfg, cache, jnp.int32(10), jnp.int32(2), block=4)
    expect = np.asarray(rot(raw, np.arange(2, 6)))
    for l in range(2):
        got = np.asarray(dec._dequant_kv(out["k"][l][2:6], out["k_s"][l][2:6], jnp.float32))
        np.testing.assert_allclose(got, expect[l], atol=0.05)


def test_fused_mlp_decode_step_matches_xla(rng):
    """forward_step_layers with fused_mlp=True (Pallas interpret on CPU)
    tracks the XLA int8 three-matmul path."""
    params = dec.init_params(QCFG, jax.random.key(2))
    p8 = {
        "embed": params["embed"],
        "layers": {
            k: (jax.vmap(to_int8)(v) if k.endswith("_proj") else v)
            for k, v in params["layers"].items()
        },
        "final_norm": params["final_norm"],
        "lm_head": to_int8(params["lm_head"]),
    }
    fused = P.fuse_layer_weights(p8)
    layers = dec.unstack_layers(fused["layers"], QCFG.num_layers)
    layers_split = dec.split_mlp_weights(layers)

    cache_a = dec.init_cache(QCFG, 64, jnp.float32)
    cache_b = dec.init_cache(QCFG, 64, jnp.float32)
    embd = jnp.asarray(rng.standard_normal(QCFG.hidden_size).astype(np.float32) * 0.1)
    pos = jnp.int32(0)
    h_ref, _ = dec.forward_step_layers(
        layers, fused["final_norm"], QCFG, embd, cache_a, pos, attn_window=64
    )
    h_fused, _ = dec.forward_step_layers(
        layers_split, fused["final_norm"], QCFG, embd, cache_b, pos,
        attn_window=64, fused_mlp=True,
    )
    a, b = np.asarray(h_ref).ravel(), np.asarray(h_fused).ravel()
    cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
    # per-tile activation requant differs slightly from per-row scale
    assert cos > 0.999, cos
