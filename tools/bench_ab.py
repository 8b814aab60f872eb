"""Interleaved A/B of decode-step designs, min-of-rounds (tunnel timing is
noisy; comparing variants across processes is unreliable).

A: production decode_block (lax.scan layers, window-sliced cache xs)
D: unrolled layers, per-layer cache arrays, window slice per layer
E: D + int8 KV cache (scales folded into attention)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

WIN = 1536
ITERS = 24


def main() -> None:
    import jax
    import jax.numpy as jnp

    from qwen3_asr_gguf_tpu import enable_compilation_cache
    enable_compilation_cache()

    from qwen3_asr_gguf_tpu.models import params as P
    from qwen3_asr_gguf_tpu.models import decoder as dec
    from qwen3_asr_gguf_tpu.ops.qtensor import matmul, Int8Weight

    ckpt = REPO / ".bench_cache" / "qwen3-asr-1.7b" / "qwen3_asr_llm.q4_k.gguf"
    print("loading decoder (int8)...", flush=True)
    cfg, dp, _ = P.load_decoder_gguf(str(ckpt), precision="int8")
    dp = P.fuse_layer_weights(dp)
    L = cfg.num_layers
    rng = np.random.default_rng(0)
    embd = jnp.asarray(rng.standard_normal((2048,)).astype(np.float32) * 0.05)
    pos = jnp.int32(1300)

    def unstack(layers):
        keys = list(layers.keys())
        return [
            {k: (Int8Weight(q=layers[k].q[l], scale=layers[k].scale[l])
                 if isinstance(layers[k], Int8Weight) else layers[k][l])
             for k in keys}
            for l in range(L)
        ]

    layer_list = jax.jit(unstack)(dp["layers"])
    jax.block_until_ready(jax.tree.leaves(layer_list)[-1])

    # ---- A: production forward_step --------------------------------------
    cache_a = dec.init_cache(cfg, 2048)

    @jax.jit
    def step_a(params, embd, cache, pos):
        h, cache = dec.forward_step(params, cfg, embd, cache, pos, attn_window=WIN)
        return dec.lm_logits(params, h, cfg.lm_head_dim)[:8], cache

    # ---- D: unrolled, per-layer cache -------------------------------------
    ks_d = [jnp.zeros((2048, 8, 128), jnp.bfloat16) for _ in range(L)]
    vs_d = [jnp.zeros((2048, 8, 128), jnp.bfloat16) for _ in range(L)]

    @jax.jit
    def step_d(layer_list, lm_head, final_norm, embd, ks, vs, pos):
        scale = cfg.head_dim ** -0.5
        cos, sin = dec.rope_cos_sin(pos[None], cfg.head_dim, cfg.rope_theta)
        valid = jnp.concatenate(
            [jnp.arange(WIN, dtype=jnp.int32) < pos, jnp.ones((1,), bool)]
        )[None, :]
        h = embd[None, :]
        new_ks, new_vs = [], []
        for layer, k_c, v_c in zip(layer_list, ks, vs):
            attn_in = dec.rms_norm(h, layer["attn_norm"], cfg.rms_norm_eps)
            q, k, v = dec._layer_qkv(layer, cfg, attn_in, cos, sin)
            k_all = jnp.concatenate([k_c[:WIN].astype(k.dtype), k], axis=0)
            v_all = jnp.concatenate([v_c[:WIN].astype(v.dtype), v], axis=0)
            attn = dec._gqa_attention(q, k_all, v_all, valid, scale)
            h = h + matmul(attn.reshape(1, -1), layer["o_proj"])
            mlp_in = dec.rms_norm(h, layer["mlp_norm"], cfg.rms_norm_eps)
            h = h + dec._mlp(layer, mlp_in)
            new_ks.append(k)
            new_vs.append(v)
        h = dec.rms_norm(h, final_norm, cfg.rms_norm_eps)
        return matmul(h, lm_head)[:, :8], new_ks, new_vs

    # ---- E: D with int8 KV -------------------------------------------------
    ks_e = [jnp.zeros((2048, 8, 128), jnp.int8) for _ in range(L)]
    vs_e = [jnp.zeros((2048, 8, 128), jnp.int8) for _ in range(L)]
    ksc = [jnp.ones((2048, 8), jnp.float32) for _ in range(L)]
    vsc = [jnp.ones((2048, 8), jnp.float32) for _ in range(L)]

    @jax.jit
    def step_e(layer_list, lm_head, final_norm, embd, ks, vs, kscale, vscale, pos):
        scale = cfg.head_dim ** -0.5
        cos, sin = dec.rope_cos_sin(pos[None], cfg.head_dim, cfg.rope_theta)
        valid = jnp.concatenate(
            [jnp.arange(WIN, dtype=jnp.int32) < pos, jnp.ones((1,), bool)]
        )[None, :]
        h = embd[None, :]
        for layer, k_c, v_c, k_s, v_s in zip(layer_list, ks, vs, kscale, vscale):
            attn_in = dec.rms_norm(h, layer["attn_norm"], cfg.rms_norm_eps)
            q, k, v = dec._layer_qkv(layer, cfg, attn_in, cos, sin)
            # dequant int8 window on the fly (VPU) then normal attention
            kw = k_c[:WIN].astype(jnp.float32)
            kq = (kw * k_s[:WIN, :, None]).astype(jnp.bfloat16)
            vq = (v_c[:WIN].astype(jnp.float32) * v_s[:WIN, :, None]).astype(jnp.bfloat16)
            k_all = jnp.concatenate([kq, k.astype(jnp.bfloat16)], axis=0)
            v_all = jnp.concatenate([vq, v.astype(jnp.bfloat16)], axis=0)
            attn = dec._gqa_attention(q, k_all, v_all, valid, scale)
            h = h + matmul(attn.reshape(1, -1), layer["o_proj"])
            mlp_in = dec.rms_norm(h, layer["mlp_norm"], cfg.rms_norm_eps)
            h = h + dec._mlp(layer, mlp_in)
        h = dec.rms_norm(h, final_norm, cfg.rms_norm_eps)
        return matmul(h, lm_head)[:, :8]

    # ---- D2: unrolled weights, STACKED cache with static per-layer index ----
    cache_d2 = dec.init_cache(cfg, 2048)

    @jax.jit
    def step_d2(layer_list, lm_head, final_norm, embd, cache, pos):
        scale = cfg.head_dim ** -0.5
        cos, sin = dec.rope_cos_sin(pos[None], cfg.head_dim, cfg.rope_theta)
        valid = jnp.concatenate(
            [jnp.arange(WIN, dtype=jnp.int32) < pos, jnp.ones((1,), bool)]
        )[None, :]
        h = embd[None, :]
        new_ks, new_vs = [], []
        for l, layer in enumerate(layer_list):
            attn_in = dec.rms_norm(h, layer["attn_norm"], cfg.rms_norm_eps)
            q, k, v = dec._layer_qkv(layer, cfg, attn_in, cos, sin)
            k_all = jnp.concatenate([cache["k"][l, :WIN].astype(k.dtype), k], axis=0)
            v_all = jnp.concatenate([cache["v"][l, :WIN].astype(v.dtype), v], axis=0)
            attn = dec._gqa_attention(q, k_all, v_all, valid, scale)
            h = h + matmul(attn.reshape(1, -1), layer["o_proj"])
            mlp_in = dec.rms_norm(h, layer["mlp_norm"], cfg.rms_norm_eps)
            h = h + dec._mlp(layer, mlp_in)
            new_ks.append(k)
            new_vs.append(v)
        ks = jnp.stack(new_ks)
        vs = jnp.stack(new_vs)
        cache = {
            "k": jax.lax.dynamic_update_slice(cache["k"], ks.astype(cache["k"].dtype), (0, pos, 0, 0)),
            "v": jax.lax.dynamic_update_slice(cache["v"], vs.astype(cache["v"].dtype), (0, pos, 0, 0)),
        }
        h = dec.rms_norm(h, final_norm, cfg.rms_norm_eps)
        return matmul(h, lm_head)[:, :8], cache

    def sync(x):
        return float(np.asarray(x).ravel()[0])

    def run_a():
        nonlocal cache_a
        out, cache_a = step_a(dp, embd, cache_a, pos)
        return out

    def run_d():
        out, _, _ = step_d(layer_list, dp["lm_head"], dp["final_norm"], embd, ks_d, vs_d, pos)
        return out

    def run_e():
        return step_e(layer_list, dp["lm_head"], dp["final_norm"], embd, ks_e, vs_e, ksc, vsc, pos)

    def run_d2():
        nonlocal cache_d2
        out, cache_d2 = step_d2(layer_list, dp["lm_head"], dp["final_norm"], embd, cache_d2, pos)
        return out

    variants = [("A scan", run_a), ("D unrolled", run_d),
                ("D2 unrolled-stackedcache", run_d2), ("E unrolled+int8kv", run_e)]
    # warm compile
    for name, fn in variants:
        sync(fn())
        print(f"{name} compiled", flush=True)

    best = {name: 1e9 for name, _ in variants}
    for rnd in range(4):
        for name, fn in variants:
            sync(fn())
            t0 = time.time()
            for _ in range(ITERS):
                out = fn()
            sync(out)
            dt = (time.time() - t0) / ITERS
            best[name] = min(best[name], dt)
    for name, _ in variants:
        print(f"{name}: {best[name]*1000:.2f} ms/tok ({1/best[name]:.0f} tok/s)", flush=True)


if __name__ == "__main__":
    main()
