"""Interleaved A/B of the decode BLOCK loop construct on the real TPU.

Suspicion: switching the K-step block from lax.scan to lax.while_loop
(for on-device EOS exit) broke XLA's cross-iteration weight-prefetch
pipelining, costing several ms/tok. Variants, same step math:

  A. lax.scan, fixed `block` steps (no early exit)
  B. lax.while_loop with EOS latch (production decode_block)
  C. single jitted step called `block` times from host (dispatch-bound ref)

Usage: python tools/bench_block_ab.py [--block 64] [--iters 3]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

WIN = 2048


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--block", type=int, default=64)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qwen3_asr_gguf_tpu import enable_compilation_cache
    enable_compilation_cache()

    from functools import partial

    from qwen3_asr_gguf_tpu.models import decoder as dec
    from qwen3_asr_gguf_tpu.models import params as P
    from qwen3_asr_gguf_tpu.ops.sampling import sample_greedy

    ckpt = REPO / ".bench_cache" / "qwen3-asr-1.7b" / "qwen3_asr_llm.q4_k.gguf"
    print("loading decoder (int8)...", flush=True)
    cfg, params, _ = P.load_decoder_gguf(str(ckpt), precision="int8")
    params = P.fuse_layer_weights(params)
    layers_list = jax.jit(lambda ls: dec.unstack_layers(ls, cfg.num_layers))(params["layers"])
    eos = jnp.asarray([151645, 151643], dtype=jnp.int32)
    block = args.block

    def step(params, layers_list, cache, pos, tok):
        embd = dec.embed_tokens(params, tok)
        hidden, cache = dec.forward_step_layers(
            layers_list, params["final_norm"], cfg, embd, cache, pos, attn_window=WIN
        )
        logits = dec.lm_logits(params, hidden, cfg.lm_head_dim)
        return cache, sample_greedy(logits).astype(jnp.int32)

    @partial(jax.jit, donate_argnames=("cache",))
    def block_scan(params, layers_list, cache, pos0, tok0):
        def body(carry, _):
            cache, pos, tok = carry
            cache, nxt = step(params, layers_list, cache, pos, tok)
            return (cache, pos + 1, nxt), tok

        (cache, pos, tok), emitted = jax.lax.scan(
            body, (cache, pos0, tok0), None, length=block
        )
        return cache, pos, tok, emitted

    @partial(jax.jit, donate_argnames=("cache",))
    def block_while(params, layers_list, cache, pos0, tok0):
        emitted0 = jnp.full((block,), -1, jnp.int32)

        def cond(c):
            i, cache, pos, tok, done, em = c
            return (i < block) & jnp.logical_not(done)

        def body(c):
            i, cache, pos, tok, done, em = c
            cache, nxt = step(params, layers_list, cache, pos, tok)
            em = em.at[i].set(tok)
            done = jnp.any(nxt == eos)
            return (i + 1, cache, pos + 1, nxt, done, em)

        i, cache, pos, tok, done, em = jax.lax.while_loop(
            cond, body, (jnp.int32(0), cache, pos0, tok0, jnp.bool_(False), emitted0)
        )
        return cache, pos, tok, em

    @partial(jax.jit, donate_argnames=("cache",))
    def one_step(params, layers_list, cache, pos, tok):
        return step(params, layers_list, cache, pos, tok)

    def fresh():
        c = jax.jit(lambda: dec.init_cache(cfg, 2048, jnp.bfloat16))()
        return c, jnp.int32(1540), jnp.int32(42)

    # warm compiles
    print("compiling variants...", flush=True)
    c, p, t = fresh()
    c, p, t, em = block_scan(params, layers_list, c, p, t)
    np.asarray(em[:1])
    c, p, t = fresh()
    c, p, t, em = block_while(params, layers_list, c, p, t)
    np.asarray(em[:1])
    c, p, t = fresh()
    c, nxt = one_step(params, layers_list, c, p, t)
    np.asarray(nxt)

    results: dict[str, float] = {}
    for r in range(args.rounds):
        for name, fn in [("scan", block_scan), ("while", block_while)]:
            c, p, t = fresh()
            jax.block_until_ready(c["k"][0])
            t0 = time.time()
            c, p, t, em = fn(params, layers_list, c, p, t)
            np.asarray(em[:1])
            dt = (time.time() - t0) / block
            results[name] = min(results.get(name, 9e9), dt)
            print(f"round {r} {name}: {dt*1000:.2f} ms/tok", flush=True)
        # host-loop single steps
        c, p, t = fresh()
        jax.block_until_ready(c["k"][0])
        t0 = time.time()
        for i in range(block):
            c, t = one_step(params, layers_list, c, p + i, t)
        np.asarray(t)
        dt = (time.time() - t0) / block
        results["host-loop"] = min(results.get("host-loop", 9e9), dt)
        print(f"round {r} host-loop: {dt*1000:.2f} ms/tok", flush=True)

    print({k: f"{v*1000:.2f} ms/tok" for k, v in results.items()})


if __name__ == "__main__" and "--production" not in sys.argv:
    main()


def bench_production() -> None:
    """Time the production Generator.decode_block in-process (same harness
    that shows the raw while-loop at ~3.2 ms/tok). Precision via
    QWEN3_BENCH_PREC (int8 default; int4 = q4_k MXU matvec kernel)."""
    import os

    import jax
    import jax.numpy as jnp

    from qwen3_asr_gguf_tpu import enable_compilation_cache
    enable_compilation_cache()

    from qwen3_asr_gguf_tpu.models import params as P
    from qwen3_asr_gguf_tpu.runtime.generate import Generator

    prec = os.environ.get("QWEN3_BENCH_PREC", "int8")
    ckpt = REPO / ".bench_cache" / "qwen3-asr-1.7b" / "qwen3_asr_llm.q4_k.gguf"
    print(f"loading decoder ({prec})...", flush=True)
    cfg, params, _ = P.load_decoder_gguf(str(ckpt), precision=prec)
    params = P.fuse_layer_weights(params)
    gen = Generator(params, cfg, n_ctx=2048, block=64)
    print(f"fused_mlp={gen.fused_mlp}", flush=True)

    rng = np.random.default_rng(0)
    embd = rng.standard_normal((1540, 2048)).astype(np.float32) * 0.05
    state = gen.start(embd, temperature=0.0)
    print("prefill done", flush=True)
    # warm (compiles win=2048 block)
    toks, st, fin = gen.decode_block(state, temperature=0.0)
    print("warm block done", flush=True)
    for r in range(6):
        t0 = time.time()
        toks, st, fin = gen.decode_block(st, temperature=0.0)
        dt = (time.time() - t0) / gen.block
        print(f"block {r}: {dt*1000:.2f} ms/tok (pos {st.pos}, fin {fin})", flush=True)


if __name__ == "__main__" and "--production" in sys.argv:
    bench_production()
    sys.exit(0)
