"""Isolate the per-token cost of the sampling path vs greedy on TPU.

Measures, in a decode-block-like serial while_loop over K iterations with a
trivial carry dependency (so steps can't parallelize):
  - argmax over the 152k vocab (greedy)
  - current sample_topk_topp (blocked top-k + categorical + per-step split)
  - variants: hoisted-gumbel argmax, approx_max_k, component pieces
"""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

V = 152_064
BLOCK = 64

key = jax.random.key(0)
logits0 = jax.random.normal(key, (V,), dtype=jnp.float32) * 4.0


def timeit(fn, *args, n=20):
    fn(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / n


def serial_loop(sample_step):
    """while_loop of BLOCK steps; logits perturbed by the previous token so
    the chain is serial like real decode."""
    def body(carry):
        i, tok, key = carry
        logits = logits0 + (tok % 7).astype(jnp.float32) * 0.01
        tok, key = sample_step(logits, key, i)
        return (i + 1, tok, key)

    def cond(carry):
        return carry[0] < BLOCK

    @jax.jit
    def run(key):
        _, tok, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0), key))
        return tok

    return run


def greedy_step(logits, key, i):
    return jnp.argmax(logits).astype(jnp.int32), key

from qwen3_asr_gguf_tpu.ops.sampling import sample_topk_topp, _topk_blocked

def current_step(logits, key, i):
    key, sub = jax.random.split(key)
    return sample_topk_topp(logits, sub, jnp.float32(0.4)).astype(jnp.int32), key

# hoisted gumbel: noise precomputed for the whole block outside the loop
gumbel_block = jax.random.gumbel(jax.random.key(1), (BLOCK, 50), dtype=jnp.float32)

def gumbel_step(logits, key, i):
    vals, idx = _topk_blocked(logits, 50)
    choice = jnp.argmax(vals / 0.4 + gumbel_block[i])
    return idx[choice].astype(jnp.int32), key

def approx_step(logits, key, i):
    vals, idx = jax.lax.approx_max_k(logits, 50)
    choice = jnp.argmax(vals / 0.4 + gumbel_block[i])
    return idx[choice].astype(jnp.int32), key

def approx_exact_step(logits, key, i):
    vals, idx = jax.lax.approx_max_k(logits, 50, recall_target=0.999)
    choice = jnp.argmax(vals / 0.4 + gumbel_block[i])
    return idx[choice].astype(jnp.int32), key

def split_only_step(logits, key, i):
    key, sub = jax.random.split(key)
    return (jnp.argmax(logits) + jax.random.randint(sub, (), 0, 2)).astype(jnp.int32), key

for name, step in [
    ("greedy", greedy_step),
    ("current(topk_topp+split)", current_step),
    ("blocked_topk+hoisted_gumbel", gumbel_step),
    ("approx_max_k+gumbel", approx_step),
    ("approx_max_k(r.999)+gumbel", approx_exact_step),
    ("greedy+split_only", split_only_step),
]:
    run = serial_loop(step)
    dt = timeit(run, key)
    print(f"{name:32s} {dt/BLOCK*1e6:8.1f} us/tok")
