"""Headline benchmark: RTF on a ~50 s utterance, Qwen3-ASR-1.7B shapes,
int4 encoder + q4_k decoder (the reference's published configuration:
README.md RTF 0.052 GPU / 0.390 CPU on 50.20 s Chinese audio).

Prints ONE JSON line:
  {"metric": ..., "value": RTF, "unit": "rtf", "vs_baseline": speedup}

vs_baseline = reference_gpu_rtf / our_rtf  (>1 means faster than the
reference's RTX-5050 DML+Vulkan pipeline).

No public weights ship with the reference, so the weights are synthetic
(random, quantized) at the real architecture shapes — identical FLOP/byte
workload. Generation length is capped to the reference workload's ~191
output tokens (96/chunk x 2 chunks) since random weights never emit EOS.
The synthetic checkpoint is cached in .bench_cache/ across rounds.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

BASELINE_RTF_GPU = 0.052  # reference README.md:49
REPO = Path(__file__).parent


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def get_audio(seconds: float = 50.2) -> np.ndarray:
    """~50.2 s clip matching the reference's benchmark length (README.md:49);
    the repo's test_audio.wav is ~16 s, so it is tiled to length."""
    ref_wav = Path("/root/reference/test_audio.wav")
    if ref_wav.exists():
        from qwen3_asr_gguf_tpu.audio.io import load_audio

        audio = load_audio(str(ref_wav))
        reps = int(np.ceil(seconds * 16_000 / len(audio)))
        audio = np.tile(audio, reps)[: int(seconds * 16_000)]
        log(f"using reference test_audio.wav tiled to {len(audio)/16000:.2f} s")
        return audio
    t = np.arange(int(16_000 * seconds)) / 16_000
    return (np.sin(2 * np.pi * 220 * t) * np.sin(2 * np.pi * 3 * t) * 0.3).astype(np.float32)


def main() -> None:
    # persistent compile cache INSIDE the repo: driver rounds keep the repo
    # tree, so warm rounds skip the remote compile service entirely; home
    # caches have not reliably survived between rounds (BENCH_r01->r02
    # warmup only fell 246 -> 106 s)
    os.environ.setdefault(
        "QWEN3_ASR_TPU_COMPILE_CACHE", str(REPO / ".bench_cache" / "xla")
    )
    # seed the repo cache from the legacy home cache once, so relocating the
    # cache does not force a cold recompile of every program
    repo_cache = Path(os.environ["QWEN3_ASR_TPU_COMPILE_CACHE"])
    # run the cache from tmpfs: this VM's page cache is capped (~1 GB) and
    # its disk reads at 15-60 MB/s, so warmup re-reads ~240 MB of cached
    # executables from disk every round. Mirror repo->tmpfs at start and
    # copy new entries back at exit (the repo copy is what survives rounds).
    shm = Path("/dev/shm")
    if repo_cache.is_dir() and shm.is_dir() and os.access(shm, os.W_OK):
        import atexit
        import shutil

        ram_cache = shm / "qwen3_asr_cache" / "xla"
        try:
            ram_cache.mkdir(parents=True, exist_ok=True)
            have = {p.name for p in ram_cache.iterdir()}
            for f in repo_cache.iterdir():
                if f.is_file() and f.name not in have:
                    shutil.copy2(f, ram_cache / f.name)

            def _sync_back():
                keep = {p.name for p in repo_cache.iterdir()}
                for f in ram_cache.iterdir():
                    if f.is_file() and f.name not in keep:
                        try:
                            shutil.copy2(f, repo_cache / f.name)
                        except OSError:
                            pass

            atexit.register(_sync_back)
            os.environ["QWEN3_ASR_TPU_COMPILE_CACHE"] = str(ram_cache)
        except OSError:
            pass
    home_cache = Path.home() / ".cache" / "qwen3_asr_tpu_xla"
    if home_cache.is_dir():
        repo_cache.mkdir(parents=True, exist_ok=True)
        import shutil

        for f in home_cache.iterdir():
            dst = repo_cache / f.name
            if f.is_file() and not dst.exists():
                try:
                    shutil.copy2(f, dst)
                except OSError:
                    break
    # native codec library: a fresh machine starts without the gitignored
    # .so, and the NumPy fallback turns the one-time checkpoint/sidecar
    # quantization from ~1 min (C++) into ~20+ min on a 1-core host. The
    # build itself is ~10 s — always worth it here.
    from qwen3_asr_gguf_tpu import native as _native

    if not os.environ.get("QWEN3_ASR_TPU_NO_NATIVE") and not _native.available():
        try:
            t0 = time.time()
            # verbose=False: cmake/ninja progress on stdout would break the
            # one-JSON-line stdout contract the driver parses
            _native.build(verbose=False)
            log(f"native codec library built in {time.time()-t0:.0f}s")
        except Exception as e:  # NumPy fallback still works, just slower
            log(f"native build skipped ({e!r}); using NumPy codecs")

    import logging

    import jax
    import qwen3_asr_gguf_tpu  # noqa: F401 — configures the package logger

    # engine init phase lines (INFO) go to stderr so the bench tail proves
    # where init time goes (VERDICT r2 weak #3)
    for h in logging.getLogger("qwen3_asr_gguf_tpu").handlers:
        h.setLevel(logging.INFO)

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    preset_name = "qwen3-asr-1.7b" if on_tpu else "tiny"
    log(f"backend={backend} preset={preset_name}")

    from qwen3_asr_gguf_tpu.export.convert import make_synthetic_checkpoint
    from qwen3_asr_gguf_tpu.runtime.engine import QwenASREngine
    from qwen3_asr_gguf_tpu.schema import AlignerConfig, ASREngineConfig

    cache = REPO / ".bench_cache" / preset_name
    llm_fn = "qwen3_asr_llm.q4_k.gguf"
    aligner_preset = "qwen3-forced-aligner-0.6b" if on_tpu else "tiny"
    if not (cache / llm_fn).exists():
        log("building synthetic ASR checkpoint (cached for future rounds)...")
        t0 = time.time()
        make_synthetic_checkpoint(str(cache), preset_name, quant="q4_k")
        log(f"checkpoint built in {time.time()-t0:.1f}s")
    if not (cache / "qwen3_aligner_llm.q4_k.gguf").exists():
        log("building synthetic aligner checkpoint...")
        t0 = time.time()
        make_synthetic_checkpoint(str(cache), aligner_preset, quant="q4_k",
                                  aligner=True, seed=1)
        log(f"aligner checkpoint built in {time.time()-t0:.1f}s")

    # int4: decode streams 4-bit weights through the q4_k MXU matvec kernel
    # (2.4 vs 3.25 ms/tok at the block level vs int8 on v5e)
    precision = os.environ.get("QWEN3_BENCH_PREC", "int4") if on_tpu else "f32"
    t0 = time.time()
    # aligner enabled: the reference's headline 2.59 s wall INCLUDES forced
    # alignment (README align total 0.83 s), so ours must too
    engine = QwenASREngine(
        ASREngineConfig(
            model_dir=str(cache),
            llm_fn=llm_fn,
            precision=precision,
            n_ctx=2048,
            chunk_size=40.0,
            memory_num=1,
            verbose=False,
            max_new_tokens=96,
            decode_block=96,  # ONE dispatch+fetch per chunk (device exits at EOS)
            # bf16 KV: measured faster than int8 KV at single-stream decode
            # (the per-layer dequant ops cost more than the saved bandwidth
            # at win<=1536); int8 remains the serving option (cache memory)
            kv_cache_dtype=os.environ.get("QWEN3_BENCH_KV", "bf16"),
            enable_aligner=True,
            align_config=AlignerConfig(
                model_dir=str(cache),
                llm_fn="qwen3_aligner_llm.q4_k.gguf",
                # the aligner is prefill-only (NAR sparse logits): int8 rides
                # the MXU prefill path; int4's dense-dequant fallback has no
                # matvec to win on
                precision="int8" if on_tpu else precision,
                n_ctx=2048,
            ),
        )
    )
    log(f"engine init {time.time()-t0:.2f}s")

    audio = get_audio()
    duration = len(audio) / 16_000

    # warmup: one full-length pass compiles every program shape the timed
    # runs hit (a 41 s warmup left run 1 paying a fresh c1-prefill compile)
    from qwen3_asr_gguf_tpu import compile_cache_entries

    n_cache0 = compile_cache_entries()
    t0 = time.time()
    engine.asr(audio, context="", language="Chinese", temperature=0.4)
    # second warmup: sampled transcripts vary run to run, so the aligner can
    # hit a neighboring (prompt, positions) bucket the first pass missed
    engine.asr(audio, context="", language="Chinese", temperature=0.4)
    n_new = compile_cache_entries() - n_cache0
    log(f"warmup (compile) {time.time()-t0:.1f}s | compile cache: "
        f"{n_cache0} entries, {n_new} new persisted")

    results = []
    for _ in range(5 if on_tpu else 1):
        t0 = time.time()
        res = engine.asr(audio, context="", language="Chinese", temperature=0.4)
        wall = time.time() - t0
        results.append((wall, res.performance))

    # headline = MEDIAN of 5 (VERDICT r3 weak #5: best-of-5 met the 0.01
    # target only on the luckiest run); min is logged alongside for context
    ordered = sorted(results, key=lambda r: r[0])
    wall, perf = ordered[len(ordered) // 2]
    wall_min = ordered[0][0]
    rtf = wall / duration
    pre_tps = perf["prefill_tokens"] / perf["prefill_time"] if perf["prefill_time"] else 0
    gen_tps = perf["decode_tokens"] / perf["decode_time"] if perf["decode_time"] else 0
    log(
        f"wall median {wall:.2f}s (min {wall_min:.2f}s, rtf_min "
        f"{wall_min / duration:.5f}) audio {duration:.2f}s | prefill "
        f"{perf['prefill_tokens']}tok "
        f"@ {pre_tps:.0f}tok/s | generate {perf['decode_tokens']}tok @ {gen_tps:.0f}tok/s "
        f"| encode wait {perf['wait_time']:.2f}s | prefill {perf['prefill_time']:.2f}s "
        f"decode {perf['decode_time']:.2f}s align "
        f"{perf['align_enc_time'] + perf['align_dec_time']:.2f}s"
    )

    print(json.dumps({
        "metric": f"rtf_50s_{preset_name}_int4_q4k",
        "value": round(rtf, 5),
        "unit": "rtf",
        "vs_baseline": round(BASELINE_RTF_GPU / rtf, 3) if rtf > 0 else 0.0,
    }), flush=True)

    # One-time synchronous q4k bitcast-layout self-check AFTER the metric is
    # out: the engine's background check (ops/pallas_q4k.self_check_async)
    # never finishes inside a short-lived process, so its pass-marker would
    # never land. Paying the standalone compile once here (post-measurement,
    # compile queue idle) records the marker; every later process skips it.
    if on_tpu:
        from qwen3_asr_gguf_tpu.ops import pallas_q4k

        try:
            if not pallas_q4k._self_check_marker().exists():
                log("running one-time q4k self-check (records pass marker)...")
                t0 = time.time()
                pallas_q4k._SELF_CHECK_DONE = False
                pallas_q4k.self_check()
                log(f"q4k self-check passed in {time.time() - t0:.0f}s")
        except Exception as e:
            log(f"q4k self-check FAILED: {e!r}")
            raise


if __name__ == "__main__":
    main()
