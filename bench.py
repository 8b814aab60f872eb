"""Headline benchmarks, driver-visible.

Emits one JSON metric line per scenario (stdout), HEADLINE LAST:
  1. serve_throughput_s_audio_per_s  — continuous batching, 128 x 10 s
  2. stream_ttft_s                   — live-mic streaming first-token latency
  3. stream_p95_chunk_latency_s      — per 2 s chunk decode latency
  4. rtf_50s_qwen3-asr-0.6b_int4_q4k — 0.6B single-stream RTF
  5. rtf_50s_qwen3-asr-1.7b_int4_q4k — the headline: 1.7B single-stream RTF

The headline scenario matches the reference's published configuration
(README.md RTF 0.052 GPU / 0.390 CPU on 50.20 s Chinese audio, int4
encoder + q4_k decoder, forced alignment ON). vs_baseline for each line
is reference_bar / ours oriented so >1 means we beat the reference
(see BASELINE.md for the bars' provenance).

A regression guard compares the headline RTF against the newest
BENCH_r*.json in the repo and prints a loud delta line to stderr
(VERDICT r4 weak #1: the round-4 slowdown landed silently).

No public weights ship with the reference, so the weights are synthetic
(random, quantized) at the real architecture shapes — identical FLOP/byte
workload. Generation length is capped to the reference workload's ~191
output tokens (96/chunk x 2 chunks) since random weights never emit EOS.
Synthetic checkpoints are cached in .bench_cache/ across rounds.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

BASELINE_RTF_GPU = 0.052  # reference README.md:49 (1.7B, RTX-5050 DML+Vulkan)
BASELINE_RTF_06B = 0.00923  # tech report :102 (0.6B bs=1, vLLM on GPU)
BASELINE_SERVE = 980.0  # tech report :102 (1.7B @128 concurrency, s-audio/s)
BASELINE_TTFT = 0.105  # tech report :102 (92-105 ms offline TTFT)
REPO = Path(__file__).parent

METRICS: list[dict] = []  # printed at exit, headline LAST


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(metric: str, value: float, unit: str, vs_baseline: float) -> None:
    METRICS.append({
        "metric": metric, "value": value, "unit": unit,
        "vs_baseline": vs_baseline,
    })


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


def setup_caches() -> None:
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
            # JSON-lines stdout contract the driver parses
            _native.build(verbose=False)
            log(f"native codec library built in {time.time()-t0:.0f}s")
        except Exception as e:  # NumPy fallback still works, just slower
            log(f"native build skipped ({e!r}); using NumPy codecs")


def ensure_checkpoint(preset_name: str, *, aligner: str | None = None) -> Path:
    from qwen3_asr_gguf_tpu.export.convert import make_synthetic_checkpoint

    cache = REPO / ".bench_cache" / preset_name
    if not (cache / "qwen3_asr_llm.q4_k.gguf").exists():
        log(f"building synthetic checkpoint {preset_name} (cached for future rounds)...")
        t0 = time.time()
        make_synthetic_checkpoint(str(cache), preset_name, quant="q4_k")
        log(f"checkpoint built in {time.time()-t0:.1f}s")
    if aligner and not (cache / "qwen3_aligner_llm.q4_k.gguf").exists():
        log("building synthetic aligner checkpoint...")
        t0 = time.time()
        make_synthetic_checkpoint(
            str(cache), aligner, quant="q4_k", aligner=True, seed=1,
        )
        log(f"aligner checkpoint built in {time.time()-t0:.1f}s")
    return cache


def _asr_with_retry(engine, audio, tries: int = 3) -> None:
    """One warmup ASR pass, retried on transient device/service errors."""
    for attempt in range(tries):
        try:
            engine.asr(audio, context="", language="Chinese", temperature=0.4)
            return
        except Exception as e:
            if attempt == tries - 1:
                raise
            log(f"warmup pass failed ({type(e).__name__}: {e}) — "
                f"retry {attempt + 1}/{tries - 1} in 20s")
            time.sleep(20.0)


def rtf_scenario(preset_name: str, audio: np.ndarray, *, on_tpu: bool,
                 runs: int, baseline: float, headline: bool,
                 aligner_dir: Path | None = None) -> float:
    """Single-stream RTF with forced alignment ON (the reference's headline
    2.59 s wall INCLUDES alignment, README align total 0.83 s).

    `aligner_dir`: reuse an already-built aligner checkpoint from another
    scenario's dir (it is the same 0.6B aligner whatever the ASR preset)."""
    from qwen3_asr_gguf_tpu import compile_cache_entries
    from qwen3_asr_gguf_tpu.runtime.engine import QwenASREngine
    from qwen3_asr_gguf_tpu.schema import AlignerConfig, ASREngineConfig

    cache = ensure_checkpoint(
        preset_name,
        aligner=None if aligner_dir is not None
        else ("qwen3-forced-aligner-0.6b" if on_tpu else "tiny"),
    )
    aligner_dir = aligner_dir or cache
    # int4: decode streams 4-bit weights through the q4_k MXU matvec kernel
    # (2.4 vs 3.25 ms/tok at the block level vs int8 on v5e)
    precision = os.environ.get("QWEN3_BENCH_PREC", "int4") if on_tpu else "f32"
    duration = len(audio) / 16_000

    t0 = time.time()
    engine = QwenASREngine(
        ASREngineConfig(
            model_dir=str(cache),
            llm_fn="qwen3_asr_llm.q4_k.gguf",
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
                model_dir=str(aligner_dir),
                llm_fn="qwen3_aligner_llm.q4_k.gguf",
                # the aligner is prefill-only (NAR sparse logits): int8 rides
                # the MXU prefill path; int4's dense-dequant fallback has no
                # matvec to win on
                precision="int8" if on_tpu else precision,
                n_ctx=2048,
            ),
        )
    )
    init_s = time.time() - t0
    log(f"engine init {init_s:.2f}s")

    # warmup: one full-length pass compiles every program shape the timed
    # runs hit (a 41 s warmup left run 1 paying a fresh c1-prefill compile);
    # second pass: sampled transcripts vary run to run, so the aligner can
    # hit a neighboring (prompt, positions) bucket the first pass missed.
    # Retried: the remote compile service drops connections under load
    # ("response body closed before all bytes were read", observed killing
    # a serve prewarm mid-round) — already-compiled programs persist in the
    # cache, so a retry resumes where the failed pass stopped.
    n_cache0 = compile_cache_entries()
    t0 = time.time()
    _asr_with_retry(engine, audio)
    _asr_with_retry(engine, audio)
    n_new = compile_cache_entries() - n_cache0
    log(f"warmup (compile) {time.time()-t0:.1f}s | compile cache: "
        f"{n_cache0} entries, {n_new} new persisted")

    results = []
    attempts = 0
    while len(results) < (runs if on_tpu else 1) and attempts < runs + 3:
        attempts += 1
        t0 = time.time()
        try:
            res = engine.asr(audio, context="", language="Chinese", temperature=0.4)
        except Exception as e:  # transient device/service hiccup: drop the run
            log(f"timed run failed ({type(e).__name__}: {e}) — retrying")
            time.sleep(10.0)
            continue
        wall = time.time() - t0
        results.append((wall, res.performance))
    if not results:
        raise RuntimeError(f"all {attempts} timed runs failed")

    # headline = MEDIAN (VERDICT r3 weak #5: best-of-5 met the 0.01 target
    # only on the luckiest run); min is logged alongside for context
    ordered = sorted(results, key=lambda r: r[0])
    wall, perf = ordered[len(ordered) // 2]
    wall_min = ordered[0][0]
    rtf = wall / duration
    pre_tps = perf["prefill_tokens"] / perf["prefill_time"] if perf["prefill_time"] else 0
    gen_tps = perf["decode_tokens"] / perf["decode_time"] if perf["decode_time"] else 0
    log(
        f"[{preset_name}] wall median {wall:.2f}s (min {wall_min:.2f}s, rtf_min "
        f"{wall_min / duration:.5f}) audio {duration:.2f}s | init {init_s:.2f}s | prefill "
        f"{perf['prefill_tokens']}tok "
        f"@ {pre_tps:.0f}tok/s | generate {perf['decode_tokens']}tok @ {gen_tps:.0f}tok/s "
        f"| encode wait {perf['wait_time']:.2f}s | prefill {perf['prefill_time']:.2f}s "
        f"decode {perf['decode_time']:.2f}s align "
        f"{perf['align_enc_time'] + perf['align_dec_time']:.2f}s"
    )
    emit(
        f"rtf_50s_{preset_name}_int4_q4k", round(rtf, 5), "rtf",
        round(baseline / rtf, 3) if rtf > 0 else 0.0,
    )
    if headline and on_tpu:
        guard_regression(rtf)
    engine.shutdown()
    return rtf


def guard_regression(rtf: float) -> None:
    """Loud stderr delta vs the newest recorded round artifact (the round-4
    RTF regression landed silently; VERDICT r4 weak #1)."""
    try:
        arts = sorted(REPO.glob("BENCH_r*.json"))
        if not arts:
            return
        prev = json.loads(arts[-1].read_text())
        prev_val = (prev.get("parsed") or {}).get("value")
        if not prev_val:
            return
        delta = 100.0 * (rtf - prev_val) / prev_val
        tag = "REGRESSION" if delta > 3.0 else ("improved" if delta < -3.0 else "flat")
        log(f"=== headline vs {arts[-1].name}: {prev_val:.5f} -> {rtf:.5f} "
            f"({delta:+.1f}%) [{tag}] ===")
        if delta > 3.0:
            log("=== RTF REGRESSION: investigate before shipping this round ===")
    except Exception as e:
        log(f"regression guard skipped ({e!r})")


def subprocess_probe(name: str, cmd: list[str], timeout: float) -> None:
    """Run a probe script; forward its stderr tail and JSON metric lines."""
    log(f"--- probe: {name} ---")
    try:
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, *cmd], cwd=str(REPO), timeout=timeout,
            capture_output=True, text=True,
            env={**os.environ, "QWEN3_ENGINE_TRACE": "0"},
        )
        for line in proc.stderr.strip().splitlines()[-6:]:
            log(f"[{name}] {line}")
        got = 0
        for line in proc.stdout.strip().splitlines():
            try:
                m = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(m, dict) and "metric" in m:
                METRICS.append(m)
                got += 1
        log(f"[{name}] rc={proc.returncode} wall={time.time()-t0:.1f}s "
            f"metrics={got}")
    except subprocess.TimeoutExpired:
        log(f"[{name}] TIMEOUT after {timeout:.0f}s — metric skipped")
    except Exception as e:
        log(f"[{name}] FAILED ({e!r}) — metric skipped")


def fidelity_evidence(timeout: float = 1500.0) -> None:
    """Per-round hardware fidelity bars next to the perf numbers
    (VERDICT r4 ask #8): int4-kernel-vs-dense cosine at real 1.7B shapes
    and the q4_k perplexity delta. stderr only — bars, not benchmarks."""
    log("--- fidelity evidence (1.7B shapes, hardware) ---")
    try:
        proc = subprocess.run(
            [sys.executable, "tools/cosine_1p7b.py"], cwd=str(REPO),
            timeout=timeout, capture_output=True, text=True,
        )
        for line in proc.stdout.strip().splitlines()[-3:]:
            log(f"[fidelity] {line}")
    except Exception as e:
        log(f"[fidelity] cosine probe skipped ({e!r})")
    # decoder perplexity delta, int4 (q4_k repack) vs f32, at 1.7B shapes
    # (reference bar: q4_k PPL +8.7% vs fp16, README.md:154-157). SURVEY.md
    # is the corpus: long, stable across rounds, tokenizes to >3 windows.
    try:
        llm = REPO / ".bench_cache" / "qwen3-asr-1.7b" / "qwen3_asr_llm.q4_k.gguf"
        proc = subprocess.run(
            [sys.executable, "-m", "qwen3_asr_gguf_tpu.cli.perplexity",
             "--llm", str(llm), "--text", str(REPO / "SURVEY.md"),
             "--precision", "int4", "--compare", "f32",
             "--window", "512", "--max-tokens", "1536"],
            cwd=str(REPO), timeout=timeout, capture_output=True, text=True,
        )
        for line in proc.stdout.strip().splitlines()[-3:]:
            log(f"[fidelity] {line}")
        if proc.returncode != 0:
            log(f"[fidelity] ppl probe rc={proc.returncode}: "
                f"{proc.stderr.strip().splitlines()[-1] if proc.stderr.strip() else ''}")
    except Exception as e:
        log(f"[fidelity] ppl probe skipped ({e!r})")


def main() -> None:
    setup_caches()

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

    audio = get_audio()

    # headline scenario runs FIRST (clean device, no probe residue)...
    rtf_scenario(preset_name, audio, on_tpu=on_tpu, runs=5,
                 baseline=BASELINE_RTF_GPU, headline=True)
    headline_metric = METRICS.pop()  # ...but prints LAST

    if on_tpu and not os.environ.get("QWEN3_BENCH_HEADLINE_ONLY"):
        # secondary scenarios (VERDICT r4 asks #4/#5): driver-visible
        # serving + streaming + 0.6B numbers, each bounded and skippable.
        # The 0.6B scenario must never take the already-measured headline
        # down with it (a RESOURCE_EXHAUSTED here once zeroed a whole run).
        try:
            rtf_scenario("qwen3-asr-0.6b", audio, on_tpu=True, runs=3,
                         baseline=BASELINE_RTF_06B, headline=False,
                         aligner_dir=REPO / ".bench_cache" / preset_name)
        except Exception as e:
            log(f"[0.6b] FAILED ({e!r}) — metric skipped")
        subprocess_probe(
            "stream", ["tools/bench_stream.py", "--seconds", "20"],
            timeout=1500,
        )
        subprocess_probe(
            "serve",
            ["tools/bench_serve.py", "--requests", "128", "--concurrency",
             "128", "--batch", "64", "--audio-sec", "10"],
            timeout=1800,
        )
        fidelity_evidence()

    METRICS.append(headline_metric)
    for m in METRICS:
        print(json.dumps(m), flush=True)

    # One-time synchronous q4k bitcast-layout self-check AFTER the metrics
    # are out: the engine's background check (ops/pallas_q4k.self_check_async)
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
