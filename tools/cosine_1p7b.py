"""Record the int4-kernel-vs-dense hidden-state cosine at REAL 1.7B shapes
(VERDICT r2 #7: kernel-vs-oracle was only tested on small interpret-mode
shapes; this measures the production path on hardware).

Runs one decode step (28 layers + lm_head) twice on the same inputs:
  A. production: q4k_matvec kernel path (packed weights)
  B. reference:  dense bf16 dequant of the SAME packed weights
and reports hidden-state and logits cosine. Writes docs-ready numbers.
"""
import sys, time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from qwen3_asr_gguf_tpu import enable_compilation_cache
    enable_compilation_cache()
    from qwen3_asr_gguf_tpu.models import decoder as dec
    from qwen3_asr_gguf_tpu.models import params as P
    from qwen3_asr_gguf_tpu.ops.pallas_q4k import Q4KMXUWeight, dequant_mxu

    ckpt = REPO / ".bench_cache" / "qwen3-asr-1.7b" / "qwen3_asr_llm.q4_k.gguf"
    print("loading decoder (int4)...", flush=True)
    cfg, params, _ = P.load_decoder_gguf(str(ckpt), precision="int4")
    params = P.fuse_layer_weights(params)
    layers = jax.jit(lambda ls: dec.unstack_layers(ls, cfg.num_layers))(params["layers"])

    @jax.jit
    def densify(layers):
        return [
            {k: dequant_mxu(v, dtype=jnp.bfloat16) if isinstance(v, Q4KMXUWeight) else v
             for k, v in layer.items()}
            for layer in layers
        ]

    layers_dense = densify(layers)
    params_dense = dict(params, lm_head=jax.jit(
        lambda w: dequant_mxu(w, dtype=jnp.bfloat16))(params["lm_head"]))

    cache_a = jax.jit(lambda: dec.init_cache(cfg, 2048, jnp.bfloat16))()
    cache_b = jax.jit(lambda: dec.init_cache(cfg, 2048, jnp.bfloat16))()
    tok = jnp.asarray(11, jnp.int32)
    pos = jnp.int32(931)

    @jax.jit
    def step(params, layers, cache):
        embd = dec.embed_tokens(params, tok)
        h, cache = dec.forward_step_layers(
            layers, params["final_norm"], cfg, embd, cache, pos, attn_window=1536
        )
        logits = dec.lm_logits(params, h, cfg.lm_head_dim)
        return h.astype(jnp.float32), logits

    @jax.jit
    def cos(a, b):
        a, b = a.ravel(), b.ravel()
        return jnp.vdot(a, b) / jnp.maximum(jnp.linalg.norm(a) * jnp.linalg.norm(b), 1e-30)

    h_k, lg_k = step(params, layers, cache_a)
    h_d, lg_d = step(params_dense, layers_dense, cache_b)
    c_h = float(cos(h_k, h_d))
    c_l = float(cos(lg_k, lg_d))
    same_argmax = bool(jnp.argmax(lg_k) == jnp.argmax(lg_d))
    print(f"hidden-state cosine (kernel vs dense, 1.7B, 28L step): {c_h:.6f}")
    print(f"logits cosine: {c_l:.6f}  argmax equal: {same_argmax}")


main()
