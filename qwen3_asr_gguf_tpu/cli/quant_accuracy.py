"""Quantization fidelity gate.

Analogue of the reference's test_quant_accuracy.py (:12-72): measures the
int4 encoder's cosine/MAE against the f32 master on real audio, and the
q4_k decoder's hidden-state cosine + greedy-token agreement against the
dense path. Bars follow the reference's published ones (encoder cosine
>= 0.96; decoder fidelity within a few percent).

  python -m qwen3_asr_gguf_tpu.cli.quant_accuracy --model-dir model/ [--audio a.wav]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def cosine(a: np.ndarray, b: np.ndarray) -> float:
    a, b = a.ravel().astype(np.float64), b.ravel().astype(np.float64)
    return float((a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="qwen3_asr_gguf_tpu.cli.quant_accuracy")
    p.add_argument("--model-dir", required=True)
    p.add_argument("--audio", default=None, help="wav file (default: synthetic 10 s)")
    p.add_argument("--llm-fn", default=None)
    p.add_argument("--encoder-fn", default="qwen3_asr_encoder.safetensors")
    p.add_argument("--seconds", type=float, default=10.0)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from ..audio.io import load_audio
    from ..models import params as P
    from ..models import decoder as dec
    from ..runtime.encoder_runner import EncoderRunner
    from .transcribe import _resolve_llm_fn
    import os

    if args.audio:
        audio = load_audio(args.audio)
    else:
        t = np.arange(int(16000 * args.seconds)) / 16000
        audio = (np.sin(2 * np.pi * 300 * t) * np.sin(2 * np.pi * 1.3 * t) * 0.4).astype(np.float32)

    report: dict = {}

    # encoder: f32 vs int4 -------------------------------------------------
    enc_cfg, enc_params = P.load_encoder_safetensors(
        os.path.join(args.model_dir, args.encoder_fn), as_numpy=True
    )
    ref, _ = EncoderRunner(enc_params, enc_cfg).encode(audio)
    for kind in ("int4", "int8"):
        enc_q = P.quantize_encoder_params(enc_params, kind=kind)
        got, _ = EncoderRunner(enc_q, enc_cfg).encode(audio)
        report[f"encoder_{kind}_cosine"] = round(cosine(ref, got), 5)
        report[f"encoder_{kind}_mae"] = round(float(np.abs(ref - got).mean()), 6)
    report["encoder_pass"] = report["encoder_int4_cosine"] >= 0.96

    # decoder: dense vs q4_k -------------------------------------------------
    llm_fn = args.llm_fn or _resolve_llm_fn(args.model_dir, "q4_k")
    llm = os.path.join(args.model_dir, llm_fn)
    cfg_q, params_q, tok = P.load_decoder_gguf(llm, precision="q4_k")
    cfg_d, params_d, _ = P.load_decoder_gguf(llm, precision="f32")

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg_q.vocab_size, size=64)
    embd = dec.embed_tokens(params_d, jnp.asarray(ids))
    h_d, _ = dec.forward_prefill(params_d, cfg_d, embd, None)
    h_q, _ = dec.forward_prefill(params_q, cfg_q, embd.astype(jnp.float32), None)
    logits_d = np.asarray(dec.lm_logits(params_d, h_d))
    logits_q = np.asarray(dec.lm_logits(params_q, h_q))
    report["decoder_hidden_cosine"] = round(cosine(np.asarray(h_d), np.asarray(h_q)), 5)
    agree = float((logits_d.argmax(-1) == logits_q.argmax(-1)).mean())
    report["decoder_greedy_agreement"] = round(agree, 4)
    report["decoder_pass"] = report["decoder_hidden_cosine"] >= 0.90

    print(json.dumps(report, indent=2))
    return 0 if report["encoder_pass"] and report["decoder_pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
