"""Generation runtime tests (block decode, EOS latch, sparse logits)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qwen3_asr_gguf_tpu.models import decoder as dec
from qwen3_asr_gguf_tpu.models.configs import TextDecoderConfig
from qwen3_asr_gguf_tpu.runtime.generate import Generator, SparseLogitsRunner

CFG = TextDecoderConfig(
    vocab_size=128, hidden_size=32, num_layers=2, num_heads=4, num_kv_heads=2,
    head_dim=8, intermediate_size=64,
)


@pytest.fixture(scope="module")
def params():
    return dec.init_params(CFG, jax.random.key(0))


def _manual_greedy(params, embd, n_steps):
    """Step-by-step greedy reference using the raw model functions."""
    cache = dec.init_cache(CFG, 256, dtype=jnp.float32)
    hidden, cache = dec.forward_prefill(params, CFG, jnp.asarray(embd), cache)
    logits = dec.lm_logits(params, hidden[-1])
    toks = [int(jnp.argmax(logits))]
    pos = embd.shape[0]
    for _ in range(n_steps - 1):
        e = dec.embed_tokens(params, jnp.int32(toks[-1]))
        hidden, cache = dec.forward_step(params, CFG, e, cache, jnp.int32(pos))
        toks.append(int(jnp.argmax(dec.lm_logits(params, hidden))))
        pos += 1
    return toks


def test_block_decode_matches_manual_greedy(params, rng):
    gen = Generator(params, CFG, n_ctx=256, eos_ids=(127,), cache_dtype=jnp.float32,
                    bucket=16, block=8)
    embd = rng.standard_normal((11, CFG.hidden_size)).astype(np.float32) * 0.3

    state = gen.start(embd, temperature=0.0)
    out = []
    for _ in range(3):
        toks, state, finished = gen.decode_block(state, temperature=0.0)
        out.extend(toks)
        if finished:
            break

    manual = _manual_greedy(params, embd, len(out) + 1)
    # emitted tokens = sampled sequence (first from prefill), minus any EOS
    expect = [t for t in manual[: len(out)] if t != 127]
    assert out[: len(expect)] == expect


def test_eos_latch(params, rng):
    """After EOS is sampled, no further tokens are emitted."""
    gen = Generator(params, CFG, n_ctx=64, eos_ids=tuple(range(128)), cache_dtype=jnp.float32,
                    bucket=16, block=4)
    # every token is EOS -> prefill's sample is EOS -> nothing emitted
    embd = rng.standard_normal((5, CFG.hidden_size)).astype(np.float32)
    state = gen.start(embd, temperature=0.0)
    toks, state, finished = gen.decode_block(state, temperature=0.0)
    assert toks == []
    assert finished


def test_sampled_decode_reproducible(params, rng):
    gen = Generator(params, CFG, n_ctx=64, eos_ids=(127,), cache_dtype=jnp.float32,
                    bucket=16, block=8)
    embd = rng.standard_normal((7, CFG.hidden_size)).astype(np.float32)
    runs = []
    for _ in range(2):
        state = gen.start(embd, temperature=0.8, seed=42)
        toks, _, _ = gen.decode_block(state, temperature=0.8)
        runs.append(toks)
    assert runs[0] == runs[1]


def test_context_overflow_guard(params, rng):
    gen = Generator(params, CFG, n_ctx=32, eos_ids=(999,), cache_dtype=jnp.float32,
                    bucket=16, block=16)
    embd = rng.standard_normal((20, CFG.hidden_size)).astype(np.float32)
    state = gen.start(embd, temperature=0.0)
    toks, state, finished = gen.decode_block(state, temperature=0.0)
    assert finished  # 20 + 16 > 32: refuses to overflow, reports done
    assert toks == []


def test_sparse_logits_match_full_prefill(params, rng):
    runner = SparseLogitsRunner(params, CFG, cache_dtype=jnp.float32, bucket=16)
    embd = rng.standard_normal((23, CFG.hidden_size)).astype(np.float32) * 0.3
    positions = np.array([2, 7, 21], dtype=np.int32)

    out = runner.logits_at(embd, positions)

    cache = dec.init_cache(CFG, 32, dtype=jnp.float32)
    hidden, _ = dec.forward_prefill(params, CFG, jnp.asarray(embd), cache)
    ref = np.asarray(dec.lm_logits(params, hidden))[positions]
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-3)


def test_device_repetition_latch():
    """A degenerate model (constant logits -> same greedy token forever)
    must trip the on-device repetition latch (reference circuit breaker,
    asr.py:157-161) and exit the block after ~15 tokens, flagging abort."""
    params = dec.init_params(CFG, jax.random.key(3))
    # zero the lm_head: logits constant -> greedy always emits token 0,
    # which is never an EOS id
    params = dict(params, lm_head=jnp.zeros_like(params["lm_head"]))
    gen = Generator(params, CFG, n_ctx=256, block=64, cache_dtype=jnp.float32)
    embd = np.random.default_rng(0).standard_normal((16, CFG.hidden_size)).astype(np.float32)
    state = gen.start(embd, temperature=0.0)
    state, packed = gen.decode_block_dispatch(state, temperature=0.0)
    toks, finished, rep_aborted = gen.collect_block(packed)
    assert rep_aborted
    assert finished
    # exited early: ~16 emissions, far fewer than the 64-token block
    assert len(toks) < 32


def test_restart_at_matches_fresh_decode(params, rng):
    """A circuit-breaker retry re-seeds the decode loop at the last prompt
    position (Generator.restart_at) instead of prefilling; greedy, the
    re-seeded stream (minus the echoed prompt token) must exactly equal the
    fresh prefill+decode stream — the block's first step reproduces the
    prefill's final logits."""
    gen = Generator(params, CFG, n_ctx=256, eos_ids=(127,), cache_dtype=jnp.float32,
                    bucket=16, block=8)
    ids = np.asarray(rng.integers(1, 120, size=9), dtype=np.int32)
    mask = np.zeros(9, dtype=bool)
    embd_audio = jnp.zeros((1, CFG.hidden_size), jnp.float32)  # unused (mask all-False)

    def run(state):
        out = []
        for _ in range(2):
            toks, state, finished = gen.decode_block(state, temperature=0.0)
            out.extend(toks)
            if finished:
                break
        return out, state

    ref, failed_state = run(gen.start_spliced(ids, mask, embd_audio, temperature=0.0))

    # retry scenario: the failed attempt's cache holds prompt KV plus stale
    # generated KV beyond the prompt; restart at the last prompt position
    state = gen.restart_at(failed_state.cache, pos=len(ids) - 1,
                           last_token=int(ids[-1]))
    out, _ = run(state)
    assert out[0] == int(ids[-1])  # the block echoes its input token
    # the echo costs one slot, so the restarted stream is one token shorter
    assert len(out) >= 8
    assert out[1:] == ref[: len(out) - 1]
