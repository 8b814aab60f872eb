"""Per-op device profile of the serving decode block (rows body).

Drives ContinuousBatcher._decode_block directly with the exact bench_serve
shapes (default: 1.7B int8, bf16 KV, batch 64, block 16, win 256) so the
program is a compile-cache HIT — the trace costs no new compiles. Prints
the xplane per-op aggregation (shared parser with profile_block.py).

Usage: python tools/profile_serve_block.py [--prec int8] [--kv bf16]
       [--batch 64] [--block 16] [--win 256] [--n-ctx 1024]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import numpy as np

from profile_block import parse_xspace  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prec", default="int8")
    ap.add_argument("--kv", default="bf16")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--block", type=int, default=16)
    ap.add_argument("--win", type=int, default=256)
    ap.add_argument("--n-ctx", type=int, default=1024)
    ap.add_argument("--pos0", type=int, default=180, help="row positions at trace")
    args = ap.parse_args()

    os.environ.setdefault(
        "QWEN3_ASR_TPU_COMPILE_CACHE", str(REPO / ".bench_cache" / "xla")
    )
    import jax
    import jax.numpy as jnp

    from qwen3_asr_gguf_tpu import enable_compilation_cache

    enable_compilation_cache()
    from qwen3_asr_gguf_tpu.runtime.continuous import ContinuousBatcher
    from qwen3_asr_gguf_tpu.runtime.engine import QwenASREngine
    from qwen3_asr_gguf_tpu.schema import ASREngineConfig

    ckpt = REPO / ".bench_cache" / "qwen3-asr-1.7b"
    t0 = time.time()
    engine = QwenASREngine(ASREngineConfig(
        model_dir=str(ckpt), llm_fn="qwen3_asr_llm.q4_k.gguf",
        precision=args.prec, n_ctx=args.n_ctx, chunk_size=40.0, verbose=False,
        max_new_tokens=32, enable_aligner=False, kv_cache_dtype=args.kv,
    ))
    print(f"engine init {time.time()-t0:.1f}s", flush=True)
    cb = ContinuousBatcher(engine, max_batch=args.batch, block=args.block,
                           max_new_tokens=32)

    b = args.batch
    poss = jnp.asarray(np.full(b, args.pos0, np.int32))
    temps = jnp.asarray(np.full(b, 1e-6, np.float32))
    greedy = jnp.asarray(np.ones(b, bool))
    host_dones = jnp.asarray(np.zeros(b, bool))
    dones_dev = jnp.zeros(b, bool)
    toks, keys, caches = cb.toks, cb.keys, cb.caches

    def run():
        nonlocal caches, toks, keys, dones_dev
        caches, toks, keys, dones_dev, packed = cb._decode_block(
            cb.dec_params, cb.layers_list, caches, poss, toks, keys,
            dones_dev, host_dones, temps, greedy, args.win,
        )
        return packed

    t0 = time.time()
    packed = run()
    jax.block_until_ready(packed)
    print(f"warm call {time.time()-t0:.1f}s", flush=True)
    times = []
    for _ in range(5):
        t0 = time.time()
        packed = run()
        jax.block_until_ready(packed)
        times.append(time.time() - t0)
    best = min(times)
    print(f"block best {best*1e3:.1f} ms -> {best/args.block*1e3:.2f} ms/step "
          f"(runs {' '.join(f'{t*1e3:.0f}' for t in sorted(times))})", flush=True)

    tracedir = "/tmp/jaxtrace_serve"
    os.system(f"rm -rf {tracedir}")
    with jax.profiler.trace(tracedir):
        packed = run()
        jax.block_until_ready(packed)

    agg, count, total = parse_xspace(tracedir)
    nstep = args.block
    print(f"\ntotal device op time: {total/1e3:.2f} ms over {nstep} steps "
          f"= {total/1e3/nstep:.3f} ms/step")
    print(f"{'op':60s} {'ms total':>9s} {'us/step':>8s} {'n':>6s}")
    for name, us in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{name[:60]:60s} {us/1e3:9.2f} {us/nstep:8.1f} {count[name]:6d}")

    cb.close()
    engine.shutdown()


if __name__ == "__main__":
    main()
