"""Rows-attention A/B at serving shapes: pallas int8-KV kernel vs the
XLA q8 twin vs bf16 KV (the serving decode wall; VERDICT r4 ask #3).

Usage: python tools/bench_attn_rows.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import time, os
import jax, jax.numpy as jnp, numpy as np
from qwen3_asr_gguf_tpu.models import decoder as dec
from qwen3_asr_gguf_tpu.ops.pallas_attn import gqa_rows_q8_attention

B, HQ, HKV, D, S = 64, 16, 8, 128, 1024
WIN = 1024
rng = np.random.default_rng(0)
kq, ks = dec._quant_kv(jnp.asarray(rng.standard_normal((B,S,HKV,D)).astype(np.float32)*0.3))
vq, vs = dec._quant_kv(jnp.asarray(rng.standard_normal((B,S,HKV,D)).astype(np.float32)*0.3))
kb = jnp.asarray(rng.standard_normal((B,S,HKV,D)), jnp.bfloat16)*0.3
vb = jnp.asarray(rng.standard_normal((B,S,HKV,D)), jnp.bfloat16)*0.3
q = jnp.asarray(rng.standard_normal((B,HQ,D)), jnp.bfloat16)*0.3
poss = jnp.asarray(rng.integers(800, 1000, B), jnp.int32)
mask = jnp.arange(WIN, dtype=jnp.int32)[None,:] <= poss[:,None]
scale = D**-0.5

kernel = jax.jit(lambda q,k,ks,v,vs,p: gqa_rows_q8_attention(q,k,ks,v,vs,p,scale,WIN))
xla_q8 = jax.jit(lambda q,k,ks,v,vs: dec._gqa_attention_rows_q8(q,k[:, :WIN],ks[:, :WIN],v[:, :WIN],vs[:, :WIN],mask,scale))
xla_bf = jax.jit(lambda q,k,v: dec._gqa_attention_rows(q,k[:, :WIN],v[:, :WIN],mask,scale))

def bench(name, f, *a):
    o = f(*a); o.block_until_ready()
    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*a)
    o.block_until_ready()
    dt = (time.perf_counter()-t0)/n*1e3
    print(f"{name}: {dt:.3f} ms/call")
    return o, dt

ok, tk = bench("pallas rows q8", kernel, q, kq, ks, vq, vs, poss)
oq, tq = bench("xla rows q8   ", xla_q8, q, kq, ks, vq, vs)
ob, tb = bench("xla rows bf16 ", xla_bf, q, kb, vb)
err = float(jnp.max(jnp.abs(ok.astype(jnp.float32)-oq.astype(jnp.float32))))
print(f"kernel vs xla-q8 max abs diff: {err:.5f}")
# 28-layer projection of the attention term per decode step
print(f"per-step attention x28: pallas {tk*28:.1f} ms, xla-q8 {tq*28:.1f} ms, bf16 {tb*28:.1f} ms")
