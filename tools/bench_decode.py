"""Decode-step microbenchmark on the real TPU.

Isolates the per-token cost of the decode hot loop at 1.7B shapes:
  - full decode_block (what the engine runs), per attn_window bucket
  - weights-only matvec stream (the HBM speed-of-light comparator)

Usage: python tools/bench_decode.py [--block 64]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def fetch_scalar(x) -> float:
    """Reliable sync point on axon: fetch one tiny value."""
    return float(np.asarray(x).ravel()[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--block", type=int, default=64)
    ap.add_argument("--pos", type=int, default=1300)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qwen3_asr_gguf_tpu import enable_compilation_cache
    enable_compilation_cache()

    from qwen3_asr_gguf_tpu.models import params as P
    from qwen3_asr_gguf_tpu.runtime.generate import Generator

    ckpt = REPO / ".bench_cache" / "qwen3-asr-1.7b" / "qwen3_asr_llm.q4_k.gguf"
    print("loading decoder (int8)...", flush=True)
    t0 = time.time()
    cfg, dec_params, tok = P.load_decoder_gguf(str(ckpt), precision="int8")
    dec_params = P.fuse_layer_weights(dec_params)
    print(f"loaded in {time.time()-t0:.1f}s", flush=True)

    gen = Generator(dec_params, cfg, n_ctx=2048, block=args.block)

    # --- full decode block ---------------------------------------------
    rng = np.random.default_rng(0)
    embd = rng.standard_normal((1408, 2048)).astype(np.float32) * 0.05
    state = gen.start(embd[: args.pos], temperature=0.0)
    print("prefill done", flush=True)

    # keep every timed block in the SAME attn-window bucket (a bucket change
    # mid-loop puts a compile inside the timing)
    assert (args.pos + args.block) // 512 == (args.pos + 6 * args.block) // 512 or args.pos >= 1536, (
        "pos+blocks crosses a 512 window bucket; pick pos so the window is stable"
    )
    for label, window in [("full 2048", 2048)]:
        # warm compile
        toks, st, fin = gen.decode_block(state, temperature=0.0)
        t0 = time.time()
        n = 0
        st2 = st
        for _ in range(4):
            toks, st2, fin = gen.decode_block(st2, temperature=0.0)
            n += args.block
        dt = time.time() - t0
        print(f"decode_block[{label}]: {dt/n*1000:.2f} ms/tok  ({n/dt:.0f} tok/s)", flush=True)

    # --- weights-only matvec stream --------------------------------------
    from qwen3_asr_gguf_tpu.ops.qtensor import matmul

    layers = dec_params["layers"]

    def weights_only(params, x):
        def layer_fn(h, layer):
            a = matmul(h, layer["qkv_proj"])
            h = h + matmul(a[:, :2048], layer["o_proj"])
            g = matmul(h, layer["gateup_proj"])
            h = h + matmul(g[:, :6144], layer["down_proj"])
            return h, None

        h, _ = jax.lax.scan(layer_fn, x, params["layers"])
        return matmul(h, params["lm_head"])  # lm_head read included

    wo = jax.jit(weights_only)
    x = jnp.asarray(rng.standard_normal((1, 2048)).astype(np.float32))
    out = wo(dec_params, x)
    fetch_scalar(out[0, :1])
    t0 = time.time()
    iters = 40
    for _ in range(iters):
        out = wo(dec_params, x)
    fetch_scalar(out[0, :1])
    dt = (time.time() - t0) / iters
    gb = 1.72  # int8 weight bytes incl lm_head
    print(f"weights-only: {dt*1000:.2f} ms/tok ({1/dt:.0f} tok/s, ~{gb/dt:.0f} GB/s realized)", flush=True)

    # --- no-lm-head variant ----------------------------------------------
    def weights_only_nohead(params, x):
        def layer_fn(h, layer):
            a = matmul(h, layer["qkv_proj"])
            h = h + matmul(a[:, :2048], layer["o_proj"])
            g = matmul(h, layer["gateup_proj"])
            h = h + matmul(g[:, :6144], layer["down_proj"])
            return h, None

        h, _ = jax.lax.scan(layer_fn, x, params["layers"])
        return h

    wo2 = jax.jit(weights_only_nohead)
    out = wo2(dec_params, x)
    fetch_scalar(out[0, :1])
    t0 = time.time()
    for _ in range(iters):
        out = wo2(dec_params, x)
    fetch_scalar(out[0, :1])
    dt = (time.time() - t0) / iters
    print(f"weights-only (no lm_head): {dt*1000:.2f} ms/tok ({1.41/dt:.0f} GB/s realized)", flush=True)


if __name__ == "__main__":
    main()
