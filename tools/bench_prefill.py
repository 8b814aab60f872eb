"""Prefill + encoder design A/B on the real TPU: lax.scan over stacked
weights vs Python-unrolled per-layer weights, at bench shapes.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    from qwen3_asr_gguf_tpu import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from qwen3_asr_gguf_tpu.models import params as P
    from qwen3_asr_gguf_tpu.models import decoder as dec
    from qwen3_asr_gguf_tpu.models import encoder as enc
    from qwen3_asr_gguf_tpu.ops.qtensor import matmul

    ckpt = REPO / ".bench_cache" / "qwen3-asr-1.7b"
    cfg, dp, _ = P.load_decoder_gguf(str(ckpt / "qwen3_asr_llm.q4_k.gguf"), precision="int8")
    dp = P.fuse_layer_weights(dp)
    layer_list = jax.jit(lambda ls: dec.unstack_layers(ls, cfg.num_layers))(dp["layers"])
    jax.block_until_ready(jax.tree.leaves(layer_list)[-1])
    rng = np.random.default_rng(0)

    def sync(x):
        leaf = jax.tree.leaves(x)[0]
        np.asarray(leaf.ravel()[:1])

    def timeit(label, fn, n=4):
        out = fn()
        sync(out)
        best = 1e9
        for _ in range(n):
            t0 = time.time()
            out = fn()
            sync(out)
            best = min(best, time.time() - t0)
        print(f"{label}: {best*1000:.1f} ms", flush=True)

    T = 640
    embd = jnp.asarray(rng.standard_normal((T, 2048)).astype(np.float32) * 0.05)

    # A: production forward_prefill (scan over stacked), no cache
    @jax.jit
    def prefill_scan(params, e):
        h, _ = dec.forward_prefill(params, cfg, e, None, length=579)
        return h[-1]

    timeit("prefill scan-stacked (640)", lambda: prefill_scan(dp, embd))

    # B: unrolled prefill over layer_list
    @jax.jit
    def prefill_unrolled(layers, final_norm, e):
        t = e.shape[0]
        scale = cfg.head_dim ** -0.5
        positions = jnp.arange(t, dtype=jnp.int32)
        cos, sin = dec.rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
        mask = (positions[:, None] >= positions[None, :]) & (positions[None, :] < 579)
        h = e
        for layer in layers:
            attn_in = dec.rms_norm(h, layer["attn_norm"], cfg.rms_norm_eps)
            q, k, v = dec._layer_qkv(layer, cfg, attn_in, cos, sin)
            attn = dec._gqa_attention(q, k, v, mask, scale)
            h = h + matmul(attn.reshape(t, -1), layer["o_proj"])
            mlp_in = dec.rms_norm(h, layer["mlp_norm"], cfg.rms_norm_eps)
            h = h + dec._mlp(layer, mlp_in)
        h = dec.rms_norm(h, final_norm, cfg.rms_norm_eps)
        return h[-1]

    timeit("prefill unrolled (640)", lambda: prefill_unrolled(layer_list, dp["final_norm"], embd))

    # encoder
    ecfg, ep = P.load_encoder_safetensors(str(ckpt / "qwen3_asr_encoder.safetensors"), as_numpy=True)
    ep_q = P.quantize_encoder_params(ep)
    ep_q = jax.device_put(ep_q)
    ep_bf = jax.device_put(
        {k: (np.asarray(v, np.float32) if not isinstance(v, dict) else v) for k, v in ep.items()}
    )
    mel = jnp.asarray(rng.standard_normal((128, 4000)).astype(np.float32))

    @jax.jit
    def enc_q(params, m):
        h = enc.conv_frontend(params, ecfg, m)
        return enc.backend_transformer(params, ecfg, h)[-1]

    timeit("encoder int4-pallas scan (40s)", lambda: enc_q(ep_q, mel))

    @jax.jit
    def enc_b(params, m):
        h = enc.conv_frontend(params, ecfg, m)
        return enc.backend_transformer(params, ecfg, h)[-1]

    timeit("encoder f32->bf16 scan (40s)", lambda: enc_b(ep_bf, mel))


if __name__ == "__main__":
    main()
