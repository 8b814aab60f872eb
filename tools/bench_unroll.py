"""Test: does lax.scan over stacked weights copy per-layer slices?

Compares, at 1.7B int8 decode shapes:
  B. weights-only matvec stream, lax.scan over stacked [L, ...] weights
  C. same compute, Python-unrolled over 28 unstacked per-layer dicts
  D. full decode step, unrolled + per-layer cache list (no cache slicing)

If C >> B in GB/s, the decode path should store unstacked weights.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


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
    x = jnp.asarray(rng.standard_normal((1, 2048)).astype(np.float32) * 0.05)

    def sync(v):
        return float(np.asarray(v).ravel()[0])

    def bench(fn, *args, iters=30):
        out = fn(*args)
        sync(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        return (time.time() - t0) / iters

    # B: scan over stacked (existing behavior)
    def wo_scan(params, x):
        def layer_fn(h, layer):
            a = matmul(h, layer["qkv_proj"])
            h = h + matmul(a[:, :2048], layer["o_proj"])
            g = matmul(h, layer["gateup_proj"])
            h = h + matmul(g[:, :6144], layer["down_proj"])
            return h, None
        h, _ = jax.lax.scan(layer_fn, x, params["layers"])
        return matmul(h, params["lm_head"])

    dt = bench(jax.jit(wo_scan), dp, x)
    print(f"B scan-stacked weights-only: {dt*1000:.2f} ms ({1.72/dt:.0f} GB/s)", flush=True)

    # C: unrolled over unstacked per-layer dicts
    def unstack(layers):
        keys = list(layers.keys())
        out = []
        for l in range(L):
            out.append({
                k: (Int8Weight(q=layers[k].q[l], scale=layers[k].scale[l])
                    if isinstance(layers[k], Int8Weight) else layers[k][l])
                for k in keys
            })
        return out

    layer_list = jax.jit(unstack)(dp["layers"])
    jax.block_until_ready(jax.tree.leaves(layer_list)[0])

    def wo_unrolled(layer_list, lm_head, x):
        h = x
        for layer in layer_list:
            a = matmul(h, layer["qkv_proj"])
            h = h + matmul(a[:, :2048], layer["o_proj"])
            g = matmul(h, layer["gateup_proj"])
            h = h + matmul(g[:, :6144], layer["down_proj"])
        return matmul(h, lm_head)

    dt = bench(jax.jit(wo_unrolled), layer_list, dp["lm_head"], x)
    print(f"C unrolled-unstacked weights-only: {dt*1000:.2f} ms ({1.72/dt:.0f} GB/s)", flush=True)

    # D: full unrolled step with per-layer cache arrays
    win = 1536
    k_list = [jnp.zeros((2048, 8, 128), jnp.bfloat16) for _ in range(L)]
    v_list = [jnp.zeros((2048, 8, 128), jnp.bfloat16) for _ in range(L)]
    pos = jnp.int32(1300)
    embd = jnp.asarray(rng.standard_normal((2048,)).astype(np.float32) * 0.05)

    @jax.jit
    def step_unrolled(layer_list, lm_head, final_norm, embd, ks, vs, pos):
        scale = cfg.head_dim ** -0.5
        cos, sin = dec.rope_cos_sin(pos[None], cfg.head_dim, cfg.rope_theta)
        valid = jnp.concatenate(
            [jnp.arange(win, dtype=jnp.int32) < pos, jnp.ones((1,), bool)]
        )[None, :]
        h = embd[None, :]
        new_ks, new_vs = [], []
        for layer, k_c, v_c in zip(layer_list, ks, vs):
            attn_in = dec.rms_norm(h, layer["attn_norm"], cfg.rms_norm_eps)
            q, k, v = dec._layer_qkv(layer, cfg, attn_in, cos, sin)
            k_all = jnp.concatenate([k_c[:win].astype(k.dtype), k], axis=0)
            v_all = jnp.concatenate([v_c[:win].astype(v.dtype), v], axis=0)
            attn = dec._gqa_attention(q, k_all, v_all, valid, scale)
            h = h + matmul(attn.reshape(1, -1), layer["o_proj"])
            mlp_in = dec.rms_norm(h, layer["mlp_norm"], cfg.rms_norm_eps)
            h = h + dec._mlp(layer, mlp_in)
            new_ks.append(k)
            new_vs.append(v)
        h = dec.rms_norm(h, final_norm, cfg.rms_norm_eps)
        return matmul(h, lm_head)

    dt = bench(step_unrolled, layer_list, dp["lm_head"], dp["final_norm"], embd, k_list, v_list, pos)
    print(f"D unrolled full step (win {win}): {dt*1000:.2f} ms ({1/dt:.0f} tok/s)", flush=True)


if __name__ == "__main__":
    main()
