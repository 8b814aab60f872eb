"""Qwen3-ASR-GGUF-TPU: a TPU-native (JAX/XLA/Pallas) speech-recognition framework.

A from-scratch rebuild of the capabilities of the Qwen3-ASR-GGUF hybrid
pipeline (ONNX encoder + llama.cpp GGUF decoder; see reference
qwen_asr_gguf/inference/asr.py) as a single TPU-first JAX program:

- mel frontend, audio encoder and Qwen3 decoder all run as jitted XLA
  programs with Pallas kernels on the hot paths;
- q4_k / int4 weight-only quantization executes as fused dequant-matmuls
  straight from packed HBM buffers;
- the reference's multiprocess 3-stage pipeline (encode i+1 | decode i |
  align i-1) becomes asynchronous device dispatch;
- scaling beyond one chip uses jax.sharding Meshes (tensor/data parallel)
  instead of host IPC.

Public API mirrors the reference product stack: `QwenASREngine`,
`ASREngineConfig`, `QwenForcedAligner`, `TranscribeResult`, exporters and
the OpenAI-compatible server.
"""

from __future__ import annotations

import logging
import os
import sys
from pathlib import Path

__version__ = "0.1.0"

_LOGGER_NAME = "qwen3_asr_gguf_tpu"


def setup_logging(log_dir: str | None = None, level: int = logging.INFO) -> logging.Logger:
    """Root logger writing ``logs/latest.log`` (reference: qwen_asr_gguf/__init__.py:23-54)."""
    logger = logging.getLogger(_LOGGER_NAME)
    if logger.handlers:
        return logger
    logger.setLevel(level)
    fmt = logging.Formatter("%(asctime)s [%(levelname)s] %(name)s: %(message)s")

    stream = logging.StreamHandler(sys.stderr)
    stream.setLevel(logging.WARNING)
    stream.setFormatter(fmt)
    logger.addHandler(stream)

    if log_dir is None:
        log_dir = os.environ.get("QWEN3_ASR_TPU_LOG_DIR", "logs")
    try:
        Path(log_dir).mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(Path(log_dir) / "latest.log", mode="w", encoding="utf-8")
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    except OSError:
        pass  # read-only filesystem: stream handler only
    return logger


logger = setup_logging()


_compile_cache_dir: str | None = None


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache (compiles of the big decode/prefill
    programs cost minutes through a remote compile service; cache them
    across processes). Called by the engine/bench; safe to call repeatedly."""
    global _compile_cache_dir
    import jax

    if jax.default_backend() != "tpu":
        # XLA:CPU cache entries are AOT-compiled for the build machine's
        # exact CPU features; loading one on a different host can SIGILL /
        # terminate (observed: a ~/.cache dir carried across machines
        # aborted engine init). Only the TPU programs are portable enough
        # to persist — CPU runs recompile.
        return
    cache_dir = path or os.environ.get(
        "QWEN3_ASR_TPU_COMPILE_CACHE", str(Path.home() / ".cache" / "qwen3_asr_tpu_xla")
    )
    try:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # persist EVERY program: each compile — even a trivial jit(reshape)
        # — pays a ~0.4 s remote compile-service round trip on this
        # platform, and a 50 s-audio warmup dispatches hundreds of small
        # eager-op programs (measured: the 1.0 s default left them all
        # uncached and warmup at 150-230 s/round; cache hits cost ~30 ms)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _compile_cache_dir = cache_dir
    except Exception:  # pragma: no cover - cache is best-effort
        logger.warning("could not enable persistent compilation cache", exc_info=True)


def compile_cache_entries() -> int:
    """Number of programs in the persistent compile cache (observability:
    a warm process should add ~0 new entries; a growing count across runs
    of the same workload means cache keys are churning)."""
    if _compile_cache_dir is None:
        return -1
    try:
        return sum(1 for p in Path(_compile_cache_dir).iterdir() if p.is_file())
    except OSError:
        return -1

# Re-exports (lazy-friendly: keep heavy jax imports out of package import).
from .schema import (  # noqa: E402
    ASREngineConfig,
    AlignerConfig,
    DecodeResult,
    ForcedAlignItem,
    ForcedAlignResult,
    TranscribeResult,
)

__all__ = [
    "ASREngineConfig",
    "AlignerConfig",
    "DecodeResult",
    "ForcedAlignItem",
    "ForcedAlignResult",
    "TranscribeResult",
    "QwenASREngine",
    "QwenForcedAligner",
    "setup_logging",
    "logger",
    "__version__",
]


def __getattr__(name: str):
    # Lazy imports so `import qwen3_asr_gguf_tpu` stays cheap (no jax import).
    if name == "QwenASREngine":
        from .runtime.engine import QwenASREngine

        return QwenASREngine
    if name == "QwenForcedAligner":
        from .runtime.aligner import QwenForcedAligner

        return QwenForcedAligner
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
