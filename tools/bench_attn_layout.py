"""Attention-read microbenchmark: is the decode attention HBM-bound or
paying for layout (window transpose + f32 casts)?

28 layers x one decode-token attention over a win-slot cache, serial loop.
  A. production: cache [S, H, hd], transpose to [H, S, hd], f32-cast einsum
  B. same layout, bf16 operands with preferred_element_type=f32
  C. head-major cache [H, S, hd] (no transpose), bf16 operands
Byte floor per token: L * win * 2(K+V) * H*hd * 2B.
"""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from qwen3_asr_gguf_tpu import enable_compilation_cache

enable_compilation_cache()

L, S, H, HD = 28, 2048, 8, 128
G = 2  # q heads per kv head
WIN = 1536
BLOCK = 32
scale = HD ** -0.5


def report(name, fn, *args):
    r = fn(*args)
    jax.block_until_ready(r)
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        times.append(time.perf_counter() - t0)
    ms = min(times) / BLOCK * 1e3
    gb = L * WIN * 2 * H * HD * 2 / 1e9
    print(f"{name:22s} {ms:7.3f} ms/tok  ({gb/ms*1e3:6.0f} GB/s eff)", flush=True)


key = jax.random.key(0)
cache_sm = [jax.random.normal(jax.random.fold_in(key, l), (S, H, HD), jnp.bfloat16) for l in range(L)]
vcache_sm = [jax.random.normal(jax.random.fold_in(key, 100 + l), (S, H, HD), jnp.bfloat16) for l in range(L)]
cache_hm = [jnp.transpose(c, (1, 0, 2)) for c in cache_sm]
vcache_hm = [jnp.transpose(c, (1, 0, 2)) for c in vcache_sm]
q0 = jax.random.normal(key, (1, H * G, HD), jnp.bfloat16)
kv0 = jax.random.normal(key, (1, H, HD), jnp.bfloat16)


def attn_f32(q, kg, vg, mask):
    """production _gqa_attention math: f32 cast before einsum."""
    qg = q.reshape(1, H, G, HD).transpose(1, 2, 0, 3)
    scores = jnp.einsum("hgtd,hsd->hgts", qg.astype(jnp.float32), kg.astype(jnp.float32)) * scale
    scores = jnp.where(mask[None, None], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hgts,hsd->hgtd", probs, vg.astype(jnp.float32))
    return out.astype(jnp.bfloat16)


def attn_bf16(q, kg, vg, mask):
    qg = q.reshape(1, H, G, HD).transpose(1, 2, 0, 3)
    scores = jnp.einsum("hgtd,hsd->hgts", qg, kg, preferred_element_type=jnp.float32) * scale
    scores = jnp.where(mask[None, None], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hgts,hsd->hgtd", probs.astype(vg.dtype), vg,
                     preferred_element_type=jnp.float32)
    return out.astype(jnp.bfloat16)


@jax.jit
def run_a(caches, vcaches, q0, kv0):
    def body(c):
        i, acc, caches, vcaches = c
        pos = 931 + i
        mask = (jnp.arange(WIN, dtype=jnp.int32) <= pos)[None, :]
        bump = acc.astype(jnp.bfloat16) * 1e-6
        new, newv = [], []
        for l in range(L):
            kc = jax.lax.dynamic_update_slice(caches[l], kv0 + bump, (pos, 0, 0))
            vc = jax.lax.dynamic_update_slice(vcaches[l], kv0 + bump, (pos, 0, 0))
            kg = kc[:WIN].transpose(1, 0, 2)
            vg = vc[:WIN].transpose(1, 0, 2)
            out = attn_f32(q0 + bump, kg, vg, mask)
            acc = acc + out.astype(jnp.float32).sum()
            new.append(kc); newv.append(vc)
        return (i + 1, acc, new, newv)
    i, acc, caches, vcaches = jax.lax.while_loop(lambda c: c[0] < BLOCK, body, (0, jnp.float32(0), caches, vcaches))
    return acc


@jax.jit
def run_b(caches, vcaches, q0, kv0):
    def body(c):
        i, acc, caches, vcaches = c
        pos = 931 + i
        mask = (jnp.arange(WIN, dtype=jnp.int32) <= pos)[None, :]
        bump = acc.astype(jnp.bfloat16) * 1e-6
        new, newv = [], []
        for l in range(L):
            kc = jax.lax.dynamic_update_slice(caches[l], kv0 + bump, (pos, 0, 0))
            vc = jax.lax.dynamic_update_slice(vcaches[l], kv0 + bump, (pos, 0, 0))
            kg = kc[:WIN].transpose(1, 0, 2)
            vg = vc[:WIN].transpose(1, 0, 2)
            out = attn_bf16(q0 + bump, kg, vg, mask)
            acc = acc + out.astype(jnp.float32).sum()
            new.append(kc); newv.append(vc)
        return (i + 1, acc, new, newv)
    i, acc, caches, vcaches = jax.lax.while_loop(lambda c: c[0] < BLOCK, body, (0, jnp.float32(0), caches, vcaches))
    return acc


@jax.jit
def run_c(caches, vcaches, q0, kv0):
    kvh = jnp.transpose(kv0, (1, 0, 2))  # [H, 1, hd]
    def body(c):
        i, acc, caches, vcaches = c
        pos = 931 + i
        mask = (jnp.arange(WIN, dtype=jnp.int32) <= pos)[None, :]
        bump = acc.astype(jnp.bfloat16) * 1e-6
        new, newv = [], []
        for l in range(L):
            kc = jax.lax.dynamic_update_slice(caches[l], kvh + bump, (0, pos, 0))
            vc = jax.lax.dynamic_update_slice(vcaches[l], kvh + bump, (0, pos, 0))
            kg = kc[:, :WIN]  # [H, WIN, hd] — no transpose
            vg = vc[:, :WIN]
            out = attn_bf16(q0 + bump, kg, vg, mask)
            acc = acc + out.astype(jnp.float32).sum()
            new.append(kc); newv.append(vc)
        return (i + 1, acc, new, newv)
    i, acc, caches, vcaches = jax.lax.while_loop(lambda c: c[0] < BLOCK, body, (0, jnp.float32(0), caches, vcaches))
    return acc


report("A sm-layout f32-cast", run_a, cache_sm, vcache_sm, q0, kv0)
report("B sm-layout bf16", run_b, cache_sm, vcache_sm, q0, kv0)
report("C head-major bf16", run_c, cache_hm, vcache_hm, q0, kv0)
