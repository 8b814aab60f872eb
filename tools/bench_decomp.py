"""Decompose the int4 decode step cost on TPU: which piece eats the ms/tok.

Variants (serial while_loop, BLOCK steps, carry-dependent so no overlap):
  full        : production step (28L + lm_head) + sample(T=0.4)
  full_greedy : same + argmax
  no_lmhead   : 28L only, tok = argmax over hidden[:64]
  mv_only     : 28L matvecs only (no attention, no cache write)
  attn_only   : 28L attention only (fixed q; cache read + attention math)
  lm_only     : lm_head matvec + sample only
All at win=1536 unless noted.
"""
import sys, time
from pathlib import Path
REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

def out(msg):
    print(msg, flush=True)
    with open("/tmp/decomp_results.txt", "a") as f:
        f.write(msg + "\n")

def main():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from qwen3_asr_gguf_tpu import enable_compilation_cache
    enable_compilation_cache()
    from qwen3_asr_gguf_tpu.models import params as P
    from qwen3_asr_gguf_tpu.models import decoder as dec
    from qwen3_asr_gguf_tpu.ops.sampling import sample_greedy, sample_topk_topp
    from qwen3_asr_gguf_tpu.ops.qtensor import matmul

    ckpt = REPO / ".bench_cache" / "qwen3-asr-1.7b" / "qwen3_asr_llm.q4_k.gguf"
    out("loading decoder (int4)...")
    cfg, params, _ = P.load_decoder_gguf(str(ckpt), precision="int4")
    params = P.fuse_layer_weights(params)
    layers_list = jax.jit(lambda ls: dec.unstack_layers(ls, cfg.num_layers))(params["layers"])
    cache = jax.jit(lambda: dec.init_cache(cfg, 2048, jnp.bfloat16))()
    out(f"cfg: L={cfg.num_layers} d={cfg.hidden_size} heads={cfg.num_heads}/{cfg.num_kv_heads} hd={cfg.head_dim} inter={cfg.intermediate_size} V={cfg.lm_head_dim}")

    BLOCK = 32
    WIN = 1536
    POS0 = 931

    def timeloop(build_body, label, n_rounds=4):
        """build_body: (carry)->(carry); carry=(i, tok, cache, key)."""
        def cond(c):
            return c[0] < BLOCK
        @jax.jit
        def run(cache, key):
            c = jax.lax.while_loop(cond, build_body, (jnp.int32(0), jnp.int32(11), cache, key))
            return c[1], c[2]
        key = jax.random.key(0)
        t0 = time.perf_counter()
        tok, cache2 = run(cache, key)
        tok.block_until_ready()
        out(f"{label:14s} compile+first {time.perf_counter()-t0:.1f}s")
        times = []
        for _ in range(n_rounds):
            t0 = time.perf_counter()
            tok, _ = run(cache, key)
            tok.block_until_ready()
            times.append(time.perf_counter() - t0)
        out(f"{label:14s} {min(times)/BLOCK*1e3:7.3f} ms/tok")

    def step_hidden(tok, cache, pos):
        embd = dec.embed_tokens(params, tok)
        return dec.forward_step_layers(
            layers_list, params["final_norm"], cfg, embd, cache, pos, attn_window=WIN
        )

    # --- full sampled ---
    def body_full(c):
        i, tok, cache, key = c
        h, cache = step_hidden(tok, cache, POS0 + i)
        logits = dec.lm_logits(params, h, cfg.lm_head_dim)
        key, sub = jax.random.split(key)
        tok = sample_topk_topp(logits, sub, jnp.float32(0.4)).astype(jnp.int32)
        return (i + 1, tok, cache, key)
    timeloop(body_full, "full_T0.4")

    # --- full greedy ---
    def body_greedy(c):
        i, tok, cache, key = c
        h, cache = step_hidden(tok, cache, POS0 + i)
        logits = dec.lm_logits(params, h, cfg.lm_head_dim)
        tok = sample_greedy(logits).astype(jnp.int32)
        return (i + 1, tok, cache, key)
    timeloop(body_greedy, "full_greedy")

    # --- no lm_head ---
    def body_nolm(c):
        i, tok, cache, key = c
        h, cache = step_hidden(tok, cache, POS0 + i)
        tok = jnp.argmax(h[:64]).astype(jnp.int32)
        return (i + 1, tok, cache, key)
    timeloop(body_nolm, "no_lmhead")

    # --- lm_head + sample only ---
    h_fixed = jnp.ones((cfg.hidden_size,), jnp.bfloat16) * 0.01
    def body_lm(c):
        i, tok, cache, key = c
        h = h_fixed * (1.0 + tok.astype(jnp.bfloat16) * 1e-6)
        logits = dec.lm_logits(params, h, cfg.lm_head_dim)
        key, sub = jax.random.split(key)
        tok = sample_topk_topp(logits, sub, jnp.float32(0.4)).astype(jnp.int32)
        return (i + 1, tok, cache, key)
    timeloop(body_lm, "lm_only")

    # --- matvecs only (no attention/cache) ---
    def body_mv(c):
        i, tok, cache, key = c
        h = dec.embed_tokens(params, tok)[None, :]
        for layer in layers_list:
            attn_in = dec.rms_norm(h, layer["attn_norm"], cfg.rms_norm_eps)
            qkv = matmul(attn_in, layer["qkv_proj"])
            fake_attn = qkv[:, : cfg.num_heads * cfg.head_dim]
            h = h + matmul(fake_attn, layer["o_proj"])
            mlp_in = dec.rms_norm(h, layer["mlp_norm"], cfg.rms_norm_eps)
            h = h + dec._mlp(layer, mlp_in)
        tok = jnp.argmax(h[0, :64]).astype(jnp.int32)
        return (i + 1, tok, cache, key)
    timeloop(body_mv, "mv_only")

    # --- attention only (cache read + attn math + write) ---
    q_fixed = jnp.ones((1, cfg.num_heads, cfg.head_dim), jnp.bfloat16)
    kv_fixed = jnp.ones((1, cfg.num_kv_heads, cfg.head_dim), jnp.bfloat16)
    def body_attn(c):
        i, tok, cache, key = c
        pos = POS0 + i
        valid = (jnp.arange(WIN, dtype=jnp.int32) <= pos)[None, :]
        scale = cfg.head_dim ** -0.5
        acc = jnp.zeros((), jnp.float32)
        newc = {"k": [], "v": []}
        bump = tok.astype(jnp.bfloat16) * 1e-6
        for l in range(cfg.num_layers):
            k_c = jax.lax.dynamic_update_slice(cache["k"][l], kv_fixed + bump, (pos, 0, 0))
            v_c = jax.lax.dynamic_update_slice(cache["v"][l], kv_fixed + bump, (pos, 0, 0))
            newc["k"].append(k_c); newc["v"].append(v_c)
            attn = dec._gqa_attention(q_fixed + bump, k_c[:WIN], v_c[:WIN], valid, scale)
            acc = acc + attn.astype(jnp.float32).sum()
        tok = (acc.astype(jnp.int32) % 64)
        return (i + 1, tok, newc, key)
    timeloop(body_attn, "attn_only")

    out("done")

main()
