"""Hardware diagnostics: encoder RTF and device-memory report.

Analogue of the reference's test_dml_speed.py (per-device encoder RTF) and
test_vram.py (memory deltas while loading each model) on TPU.

  python -m qwen3_asr_gguf_tpu.cli.diagnostics --model-dir model/ [--seconds 40]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="qwen3_asr_gguf_tpu.cli.diagnostics")
    p.add_argument("--model-dir", required=True)
    p.add_argument("--encoder-fn", default="qwen3_asr_encoder.safetensors")
    p.add_argument("--seconds", type=float, default=40.0)
    p.add_argument("--int4", action="store_true", help="benchmark the int4 encoder")
    args = p.parse_args(argv)

    import jax

    from ..models import params as P
    from ..runtime.encoder_runner import EncoderRunner
    from ..utils.profiling import device_memory_report

    report: dict = {"backend": jax.default_backend(), "device": str(jax.devices()[0])}
    report["memory_baseline"] = device_memory_report()

    t0 = time.time()
    enc_cfg, enc_params = P.load_encoder_safetensors(
        os.path.join(args.model_dir, args.encoder_fn), as_numpy=True
    )
    if args.int4:
        enc_params = P.quantize_encoder_params(enc_params)
    runner = EncoderRunner(enc_params, enc_cfg)
    report["encoder_load_s"] = round(time.time() - t0, 2)
    report["memory_after_load"] = device_memory_report()

    audio = np.random.default_rng(0).standard_normal(
        int(16_000 * args.seconds)
    ).astype(np.float32) * 0.2
    _ = runner.encode(audio)  # compile
    times = []
    for _i in range(3):
        t0 = time.time()
        _ = runner.encode(audio)
        times.append(time.time() - t0)
    best = min(times)
    report["encoder_seconds_audio"] = args.seconds
    report["encoder_time_s"] = round(best, 4)
    report["encoder_rtf"] = round(best / args.seconds, 5)
    report["memory_peak"] = device_memory_report()

    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
