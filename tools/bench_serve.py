"""Concurrent serving throughput benchmark (tech-report comparator).

Drives the ContinuousBatcher with N concurrent short requests at 1.7B
int8 shapes and reports s-audio/s + latency percentiles (upstream bars,
BASELINE.md: 0.6B @128 -> 1136 s-audio/s; 1.7B @128 -> 980).

Usage: python tools/bench_serve.py [--requests 64] [--concurrency 32]
       [--batch 8] [--audio-sec 10]
"""

from __future__ import annotations

import argparse
import sys
import threading
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--concurrency", type=int, default=32)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--block", type=int, default=16)
    ap.add_argument("--audio-sec", type=float, default=10.0)
    ap.add_argument("--max-new", type=int, default=32)
    ap.add_argument("--n-ctx", type=int, default=1024)
    ap.add_argument("--prec", default="int8")
    ap.add_argument("--kv", default="bf16", choices=["bf16", "int8", "f32"],
                    help="KV cache dtype (int8 halves attention HBM reads)")
    ap.add_argument("--repeat", type=int, default=3,
                    help="measured repetitions (median reported); the remote "
                         "runtime's execution speed swings ~2x between runs")
    args = ap.parse_args()

    import os
    os.environ.setdefault(
        "QWEN3_ASR_TPU_COMPILE_CACHE", str(REPO / ".bench_cache" / "xla")
    )
    from qwen3_asr_gguf_tpu import enable_compilation_cache
    enable_compilation_cache()

    from qwen3_asr_gguf_tpu.runtime.continuous import ContinuousBatcher
    from qwen3_asr_gguf_tpu.runtime.engine import QwenASREngine
    from qwen3_asr_gguf_tpu.schema import ASREngineConfig

    import jax
    on_tpu = jax.default_backend() == "tpu"
    ckpt = REPO / ".bench_cache" / ("qwen3-asr-1.7b" if on_tpu else "tiny")
    if not (ckpt / "qwen3_asr_llm.q4_k.gguf").exists():
        from qwen3_asr_gguf_tpu.export.convert import make_synthetic_checkpoint
        make_synthetic_checkpoint(str(ckpt), "qwen3-asr-1.7b" if on_tpu else "tiny",
                                  quant="q4_k")

    t0 = time.time()
    engine = QwenASREngine(ASREngineConfig(
        model_dir=str(ckpt), llm_fn="qwen3_asr_llm.q4_k.gguf",
        precision=args.prec if on_tpu else "f32",
        n_ctx=args.n_ctx, chunk_size=40.0, verbose=False,
        max_new_tokens=args.max_new, enable_aligner=False,
        kv_cache_dtype=args.kv,
    ))
    print(f"engine init {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    cb = ContinuousBatcher(engine, max_batch=args.batch, block=args.block,
                           max_new_tokens=args.max_new)

    rng = np.random.default_rng(0)
    n_samples = int(args.audio_sec * 16_000)
    audios = [
        (np.sin(2 * np.pi * (200 + 50 * i) * np.arange(n_samples) / 16_000) * 0.3).astype(np.float32)
        for i in range(8)
    ]

    # deterministic program-set warmup: every cohort width's encode/prefill/
    # scatter plus every decode window (thread-raced submits could split a
    # width and leave its programs to load inside the measured run)
    t0 = time.time()
    for attempt in range(3):
        try:
            cb.prewarm(audio_secs=(args.audio_sec,), language="Chinese")
            break
        except Exception as e:
            # the remote compile service drops connections under load;
            # compiled programs persist, so a retry resumes the prewarm
            if attempt == 2:
                raise
            print(f"prewarm failed ({type(e).__name__}: {e}) — retrying in 20s",
                  file=sys.stderr, flush=True)
            time.sleep(20.0)
    print(f"warmup {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    latencies: list = []
    total_audio = args.requests * args.audio_sec
    walls = []
    for rep in range(args.repeat):
        latencies = []
        lat_lock = threading.Lock()
        sem = threading.Semaphore(args.concurrency)
        threads = []

        st0 = dict(cb.stats)  # snapshot: warmup compile time stays out of deltas
        t_start = time.time()

        def one(i):
            with sem:
                t0 = time.time()
                cb.submit(audios[i % len(audios)], language="Chinese",
                          temperature=0.0, timeout=2400.0)
                with lat_lock:
                    latencies.append(time.time() - t0)

        for i in range(args.requests):
            th = threading.Thread(target=one, args=(i,))
            th.start()
            threads.append(th)
        for th in threads:
            th.join(timeout=600)
        wall = time.time() - t_start
        walls.append(wall)

        lat = np.asarray(sorted(latencies))
        print(
            f"[rep {rep+1}/{args.repeat}] requests={args.requests} conc={args.concurrency} "
            f"batch={args.batch} audio={args.audio_sec:.0f}s wall={wall:.2f}s",
            file=sys.stderr, flush=True)
        print(
            f"throughput {total_audio/wall:.0f} s-audio/s | latency p50 {lat[len(lat)//2]:.2f}s "
            f"p95 {lat[int(len(lat)*0.95)]:.2f}s | completed {cb.stats['completed']}",
            file=sys.stderr, flush=True)
        st = cb.stats
        print(
            "phase timers: "
            f"admit(overlapped) {st['t_admit']-st0['t_admit']:.2f}s/"
            f"{st['n_cohorts']-st0['n_cohorts']}cohorts "
            f"(enc {st.get('t_admit_enc', 0)-st0.get('t_admit_enc', 0):.2f}s "
            f"prefill {st.get('t_admit_prefill', 0)-st0.get('t_admit_prefill', 0):.2f}s) "
            f"scatter {st.get('t_scatter', 0)-st0.get('t_scatter', 0):.2f}s "
            f"dispatch {st['t_dispatch']-st0['t_dispatch']:.2f}s/"
            f"{st['n_blocks']-st0['n_blocks']}blocks "
            f"fetch-wait {st['t_fetch']-st0['t_fetch']:.2f}s",
            file=sys.stderr, flush=True)

    # median wall across repeats: the remote runtime's block execution time
    # swings up to 2x between runs minutes apart; a single sample is noise
    walls.sort()
    wall_med = walls[len(walls) // 2]
    if args.repeat > 1:
        print(f"median of {args.repeat}: wall {wall_med:.2f}s -> "
              f"{total_audio/wall_med:.0f} s-audio/s "
              f"(runs {' '.join(f'{w:.2f}' for w in walls)})",
              file=sys.stderr, flush=True)
    import json
    print(json.dumps({
        "metric": "serve_throughput_s_audio_per_s",
        "value": round(total_audio / wall_med, 1),
        "unit": "s-audio/s",
        "vs_baseline": round(total_audio / wall_med / 980.0, 3),
    }))
    cb.close()


if __name__ == "__main__":
    main()
