"""Decoder perplexity tool.

Analogue of llama.cpp's tools/perplexity (the reference's q4_k fidelity
bar, README "decoder PPL +8.7% vs fp16"): token-level perplexity of the
GGUF decoder over a text corpus, at one or two precisions, reporting the
relative delta.

  python -m qwen3_asr_gguf_tpu.cli.perplexity --llm model/qwen3_asr_llm.q4_k.gguf \
      --text corpus.txt [--compare f32] [--window 512]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def compute_ppl(llm_path: str, token_ids: np.ndarray, *, precision: str, window: int) -> float:
    import jax
    import jax.numpy as jnp

    from ..models import decoder as dec
    from ..models import params as P

    cfg, params, _ = P.load_decoder_gguf(llm_path, precision=precision)

    @jax.jit
    def window_nll(params, ids, valid):
        """NLL sum over the first `valid` predictions of a padded window."""
        embd = dec.embed_tokens(params, ids).astype(jnp.float32)
        hidden, _ = dec.forward_prefill(params, cfg, embd, None, length=valid + 1)
        logits = dec.lm_logits(params, hidden, cfg.lm_head_dim)
        logp = jax.nn.log_softmax(logits[:-1], axis=-1)
        nll = -jnp.take_along_axis(logp, ids[1:, None], axis=-1)[:, 0]
        mask = jnp.arange(nll.shape[0]) < valid
        return jnp.where(mask, nll, 0.0).sum()

    total_nll, total_n = 0.0, 0
    for start in range(0, len(token_ids) - 1, window):
        ids = token_ids[start : start + window + 1]
        if len(ids) < 2:
            break
        valid = len(ids) - 1
        if len(ids) < window + 1:
            ids = np.concatenate([ids, np.zeros(window + 1 - len(ids), ids.dtype)])
        total_nll += float(window_nll(params, jnp.asarray(ids), jnp.int32(valid)))
        total_n += valid
    return float(np.exp(total_nll / max(total_n, 1)))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="qwen3_asr_gguf_tpu.cli.perplexity")
    p.add_argument("--llm", required=True, help="decoder GGUF path")
    p.add_argument("--text", required=True, help="UTF-8 text corpus")
    p.add_argument("--precision", default="q4_k")
    p.add_argument("--compare", default=None, help="second precision (e.g. f32) for delta")
    p.add_argument("--window", type=int, default=512)
    p.add_argument("--max-tokens", type=int, default=16384)
    args = p.parse_args(argv)

    from ..formats import GGUFReader
    from ..text.tokenizer import BPETokenizer

    tok = BPETokenizer.from_gguf_kv(GGUFReader(args.llm).kv)
    with open(args.text, encoding="utf-8") as f:
        ids = np.asarray(tok.encode(f.read())[: args.max_tokens], dtype=np.int32)
    if len(ids) < 2:
        print("corpus too small", file=sys.stderr)
        return 2

    report = {"tokens": int(len(ids)), "window": args.window}
    report[f"ppl_{args.precision}"] = round(
        compute_ppl(args.llm, ids, precision=args.precision, window=args.window), 4
    )
    if args.compare:
        base = compute_ppl(args.llm, ids, precision=args.compare, window=args.window)
        report[f"ppl_{args.compare}"] = round(base, 4)
        report["delta_pct"] = round(
            100.0 * (report[f"ppl_{args.precision}"] - base) / base, 2
        )
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
