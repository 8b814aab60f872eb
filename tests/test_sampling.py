"""Sampler chain tests (reference llama.cpp chain, llama.py:641-647)."""

import numpy as np
import jax
import jax.numpy as jnp

from qwen3_asr_gguf_tpu.ops import sampling


def test_topk_blocked_exact_vs_flat():
    rng = np.random.default_rng(0)
    for v in (151_936, 152_064, 5_000, 127):  # real vocab, padded, odd sizes
        logits = jnp.asarray(rng.standard_normal(v).astype(np.float32))
        k = min(50, v)
        vb, ib = sampling._topk_blocked(logits, k)
        vf, if_ = jax.lax.top_k(logits, k)
        np.testing.assert_allclose(np.asarray(vb), np.asarray(vf), rtol=0, atol=0)
        # indices must point at the same values (ties may permute)
        np.testing.assert_allclose(
            np.asarray(logits)[np.asarray(ib)], np.asarray(vf), rtol=0, atol=0
        )


def test_topk_blocked_adversarial_cluster():
    """All top values inside ONE block — the two-stage gather must still
    recover every one of them."""
    v = 151_936
    logits = np.full(v, -10.0, np.float32)
    logits[1000:1050] = np.arange(50, 0, -1, dtype=np.float32)  # one block span
    vb, ib = sampling._topk_blocked(jnp.asarray(logits), 50)
    assert set(np.asarray(ib).tolist()) == set(range(1000, 1050))


def test_sample_topk_respects_top1_at_low_temp():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal(151_936).astype(np.float32)
    logits[42] = 30.0  # dominates at any reasonable temperature
    tok = sampling.sample_topk_topp(
        jnp.asarray(logits), jax.random.key(0), jnp.float32(0.4)
    )
    assert int(tok) == 42


def test_sample_greedy():
    logits = np.zeros(1000, np.float32)
    logits[7] = 1.0
    assert int(sampling.sample_greedy(jnp.asarray(logits))) == 7
