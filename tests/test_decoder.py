"""Text decoder parity tests.

Gate (SURVEY.md §7 stage 2): greedy logits of the JAX decoder match a
trusted reference implementation of the same architecture. We use
HuggingFace's torch Qwen3 (same arch as Qwen3-ASR's thinker text model:
RMSNorm, q/k head-dim norm, GQA, SwiGLU, rope_theta) as the oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qwen3_asr_gguf_tpu.models import decoder as dec
from qwen3_asr_gguf_tpu.models.configs import TextDecoderConfig

CFG = TextDecoderConfig(
    vocab_size=256,
    hidden_size=64,
    num_layers=3,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    intermediate_size=128,
    rope_theta=5_000_000.0,
)


def _torch_oracle():
    torch = pytest.importorskip("torch")
    from transformers.models.qwen3 import Qwen3Config, Qwen3ForCausalLM

    hf_cfg = Qwen3Config(
        vocab_size=CFG.vocab_size,
        hidden_size=CFG.hidden_size,
        num_hidden_layers=CFG.num_layers,
        num_attention_heads=CFG.num_heads,
        num_key_value_heads=CFG.num_kv_heads,
        head_dim=CFG.head_dim,
        intermediate_size=CFG.intermediate_size,
        rope_theta=CFG.rope_theta,
        rms_norm_eps=CFG.rms_norm_eps,
        tie_word_embeddings=False,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    model = Qwen3ForCausalLM(hf_cfg).eval()
    return torch, model


def _params_from_torch(model) -> dict:
    sd = {k: v.detach().numpy().astype(np.float32) for k, v in model.state_dict().items()}
    l = CFG.num_layers

    def stack(fmt):
        return jnp.asarray(np.stack([sd[fmt.format(i)] for i in range(l)]))

    layers = {
        "attn_norm": stack("model.layers.{}.input_layernorm.weight"),
        "q_proj": stack("model.layers.{}.self_attn.q_proj.weight"),
        "k_proj": stack("model.layers.{}.self_attn.k_proj.weight"),
        "v_proj": stack("model.layers.{}.self_attn.v_proj.weight"),
        "o_proj": stack("model.layers.{}.self_attn.o_proj.weight"),
        "q_norm": stack("model.layers.{}.self_attn.q_norm.weight"),
        "k_norm": stack("model.layers.{}.self_attn.k_norm.weight"),
        "mlp_norm": stack("model.layers.{}.post_attention_layernorm.weight"),
        "gate_proj": stack("model.layers.{}.mlp.gate_proj.weight"),
        "up_proj": stack("model.layers.{}.mlp.up_proj.weight"),
        "down_proj": stack("model.layers.{}.mlp.down_proj.weight"),
    }
    return {
        "embed": jnp.asarray(sd["model.embed_tokens.weight"]),
        "layers": layers,
        "final_norm": jnp.asarray(sd["model.norm.weight"]),
        "lm_head": jnp.asarray(sd["lm_head.weight"]),
    }


@pytest.fixture(scope="module")
def oracle():
    torch, model = _torch_oracle()
    return torch, model, _params_from_torch(model)


def test_prefill_logits_match_torch(oracle):
    torch, model, params = oracle
    T = 17
    rng = np.random.default_rng(3)
    ids = rng.integers(0, CFG.vocab_size, size=T)

    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids[None])).logits[0].numpy()

    embd = dec.embed_tokens(params, jnp.asarray(ids))
    cache = dec.init_cache(CFG, 32, dtype=jnp.float32)
    hidden, _ = dec.forward_prefill(params, CFG, embd, cache)
    logits = np.asarray(dec.lm_logits(params, hidden))

    np.testing.assert_allclose(logits, ref, atol=2e-4, rtol=2e-3)
    assert np.array_equal(logits.argmax(-1), ref.argmax(-1)), "greedy token mismatch"


def test_prefill_embeds_input_match_torch(oracle):
    """ASR feeds raw embeddings (audio embd spliced in) — check inputs_embeds path."""
    torch, model, params = oracle
    rng = np.random.default_rng(4)
    embd = rng.standard_normal((9, CFG.hidden_size)).astype(np.float32) * 0.5

    with torch.no_grad():
        ref = model(inputs_embeds=torch.tensor(embd[None])).logits[0].numpy()

    cache = dec.init_cache(CFG, 16, dtype=jnp.float32)
    hidden, _ = dec.forward_prefill(params, CFG, jnp.asarray(embd), cache)
    logits = np.asarray(dec.lm_logits(params, hidden))
    np.testing.assert_allclose(logits, ref, atol=2e-4, rtol=2e-3)


def test_step_matches_prefill(oracle):
    """Incremental decode over the KV cache == one-shot prefill."""
    _, _, params = oracle
    rng = np.random.default_rng(5)
    T = 12
    ids = rng.integers(0, CFG.vocab_size, size=T)
    embd = dec.embed_tokens(params, jnp.asarray(ids))

    cache = dec.init_cache(CFG, 16, dtype=jnp.float32)
    full_hidden, _ = dec.forward_prefill(params, CFG, embd, cache)

    # prefill the first 5, then step the rest one-by-one
    cache = dec.init_cache(CFG, 16, dtype=jnp.float32)
    _, cache = dec.forward_prefill(params, CFG, embd[:5], cache)
    outs = []
    for i in range(5, T):
        h, cache = dec.forward_step(params, CFG, embd[i], cache, jnp.int32(i))
        outs.append(np.asarray(h))
    np.testing.assert_allclose(
        np.stack(outs), np.asarray(full_hidden[5:]), atol=1e-4, rtol=1e-3
    )


def test_prefill_length_mask_ignores_padding(oracle):
    """Padded prefill (static bucket) must equal unpadded on the valid prefix."""
    _, _, params = oracle
    rng = np.random.default_rng(6)
    ids = rng.integers(0, CFG.vocab_size, size=10)
    embd = dec.embed_tokens(params, jnp.asarray(ids))
    cache = dec.init_cache(CFG, 32, dtype=jnp.float32)

    h_ref, _ = dec.forward_prefill(params, CFG, embd, cache)
    padded = jnp.concatenate([embd, jnp.ones((6, CFG.hidden_size), embd.dtype)], axis=0)
    h_pad, _ = dec.forward_prefill(params, CFG, padded, cache, length=10)
    np.testing.assert_allclose(np.asarray(h_pad[:10]), np.asarray(h_ref), atol=1e-5, rtol=1e-4)


def test_quantized_params_close(oracle):
    """q4_k-quantized matmuls stay within the reference fidelity ballpark."""
    from qwen3_asr_gguf_tpu.ops.qtensor import quantize_dense

    _, _, params = oracle
    qlayers = dict(params["layers"])
    for name in ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj"):
        w = np.asarray(params["layers"][name])
        qlayers[name] = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[quantize_dense(w[i]) for i in range(w.shape[0])],
        )
    qparams = dict(params, layers=qlayers)

    rng = np.random.default_rng(7)
    ids = rng.integers(0, CFG.vocab_size, size=20)
    embd = dec.embed_tokens(params, jnp.asarray(ids))
    cache = dec.init_cache(CFG, 32, dtype=jnp.float32)
    h_ref, _ = dec.forward_prefill(params, CFG, embd, cache)
    h_q, _ = dec.forward_prefill(qparams, CFG, embd, cache)

    a, b = np.asarray(h_ref).ravel(), np.asarray(h_q).ravel()
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.96, f"quantized cosine {cos}"


def test_forward_step_rows_matches_vmapped_steps(rng):
    """Batched rows decode step == per-row forward_step_layers (the
    serving path must not change the math, only the batching)."""
    params = dec.init_params(CFG, jax.random.key(4))
    layers = dec.unstack_layers(params["layers"], CFG.num_layers)
    b, s = 3, 32
    caches_rows = {
        "k": [jnp.zeros((b, s, CFG.num_kv_heads, CFG.head_dim), jnp.float32)
              for _ in range(CFG.num_layers)],
        "v": [jnp.zeros((b, s, CFG.num_kv_heads, CFG.head_dim), jnp.float32)
              for _ in range(CFG.num_layers)],
    }
    # seed each row's cache with random prior KV
    poss = jnp.asarray([5, 9, 2], jnp.int32)
    for l in range(CFG.num_layers):
        caches_rows["k"][l] = jnp.asarray(
            rng.standard_normal(caches_rows["k"][l].shape), jnp.float32) * 0.1
        caches_rows["v"][l] = jnp.asarray(
            rng.standard_normal(caches_rows["v"][l].shape), jnp.float32) * 0.1
    embd = jnp.asarray(rng.standard_normal((b, CFG.hidden_size)), jnp.float32) * 0.1

    h_rows, out_rows = dec.forward_step_rows(
        layers, params["final_norm"], CFG, embd, caches_rows, poss, attn_window=s
    )
    for r in range(b):
        cache_r = {
            "k": [caches_rows["k"][l][r] for l in range(CFG.num_layers)],
            "v": [caches_rows["v"][l][r] for l in range(CFG.num_layers)],
        }
        h1, out1 = dec.forward_step_layers(
            layers, params["final_norm"], CFG, embd[r], cache_r,
            jnp.int32(poss[r]), attn_window=s,
        )
        np.testing.assert_allclose(np.asarray(h_rows[r]), np.asarray(h1),
                                   rtol=2e-5, atol=2e-5)
        for l in range(CFG.num_layers):
            np.testing.assert_allclose(
                np.asarray(out_rows["k"][l][r]), np.asarray(out1["k"][l]),
                rtol=2e-5, atol=2e-5,
            )


def test_forward_step_rows_int8_kv_matches_per_row(rng):
    """int8-KV rows decode step == per-row forward_step_layers with an
    int8 cache. The rows body folds the per-(slot, head) scales into the
    attention dots instead of dequantizing the window (the serving-
    throughput lever at batch 64); the math is identical term-for-term,
    so only dot-ordering float noise separates the two paths."""
    params = dec.init_params(CFG, jax.random.key(6))
    layers = dec.unstack_layers(params["layers"], CFG.num_layers)
    b, s = 3, 32
    kv_rng = np.random.default_rng(11)
    caches_rows = {"k": [], "v": [], "k_s": [], "v_s": []}
    for _ in range(CFG.num_layers):
        dense_k = kv_rng.standard_normal(
            (b, s, CFG.num_kv_heads, CFG.head_dim)).astype(np.float32) * 0.1
        dense_v = kv_rng.standard_normal(
            (b, s, CFG.num_kv_heads, CFG.head_dim)).astype(np.float32) * 0.1
        kq, ks = dec._quant_kv(jnp.asarray(dense_k))
        vq, vs = dec._quant_kv(jnp.asarray(dense_v))
        caches_rows["k"].append(kq)
        caches_rows["v"].append(vq)
        caches_rows["k_s"].append(ks)
        caches_rows["v_s"].append(vs)
    poss = jnp.asarray([5, 9, 2], jnp.int32)
    embd = jnp.asarray(rng.standard_normal((b, CFG.hidden_size)), jnp.float32) * 0.1

    h_rows, out_rows = dec.forward_step_rows(
        layers, params["final_norm"], CFG, embd, caches_rows, poss, attn_window=s
    )
    assert out_rows["k"][0].dtype == jnp.int8
    for r in range(b):
        cache_r = {
            key: [caches_rows[key][l][r] for l in range(CFG.num_layers)]
            for key in caches_rows
        }
        h1, out1 = dec.forward_step_layers(
            layers, params["final_norm"], CFG, embd[r], cache_r,
            jnp.int32(poss[r]), attn_window=s,
        )
        np.testing.assert_allclose(np.asarray(h_rows[r]), np.asarray(h1),
                                   rtol=2e-3, atol=2e-3)
        for l in range(CFG.num_layers):
            # the newly written slot must hold the identical quantized KV
            np.testing.assert_array_equal(
                np.asarray(out_rows["k"][l][r][poss[r]]),
                np.asarray(out1["k"][l][poss[r]]),
            )
            np.testing.assert_allclose(
                np.asarray(out_rows["k_s"][l][r][poss[r]]),
                np.asarray(out1["k_s"][l][poss[r]]), rtol=1e-6,
            )
