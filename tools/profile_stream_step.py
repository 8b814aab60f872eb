"""Phase-timing for one streaming _decode_accum step at various accumulated
lengths — finds where the 2 s p50 chunk latency lives (encode dispatch,
prompt build, prefill, decode block, fetch).

Usage: python tools/profile_stream_step.py [--seconds 30]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--max-new", type=int, default=16)
    args = ap.parse_args()

    from qwen3_asr_gguf_tpu import enable_compilation_cache
    enable_compilation_cache()

    import jax
    from qwen3_asr_gguf_tpu.runtime.engine import QwenASREngine
    from qwen3_asr_gguf_tpu.runtime.streaming import StreamingTranscriber
    from qwen3_asr_gguf_tpu.schema import ASREngineConfig

    on_tpu = jax.default_backend() == "tpu"
    ckpt = REPO / ".bench_cache" / ("qwen3-asr-1.7b" if on_tpu else "tiny")
    if not (ckpt / "qwen3_asr_llm.q4_k.gguf").exists():
        from qwen3_asr_gguf_tpu.export.convert import make_synthetic_checkpoint
        make_synthetic_checkpoint(str(ckpt), "qwen3-asr-1.7b" if on_tpu else "tiny",
                                  quant="q4_k")

    t0 = time.time()
    engine = QwenASREngine(ASREngineConfig(
        model_dir=str(ckpt), llm_fn="qwen3_asr_llm.q4_k.gguf",
        precision="int4" if on_tpu else "f32",
        n_ctx=2048, chunk_size=40.0, verbose=False,
        max_new_tokens=args.max_new, enable_aligner=False,
        decode_block=args.max_new,
    ))
    print(f"engine init {time.time()-t0:.1f}s", flush=True)

    st = StreamingTranscriber(engine, language="Chinese", temperature=0.0)

    for sec in (2, 10, 30):
        if sec > args.seconds:
            break
        n = int(sec * 16_000)
        accum = (np.sin(2 * np.pi * 300 * np.arange(n) / 16_000) * 0.3).astype(np.float32)
        for rep in range(3):
            state = st.init_state()
            state.accum = accum
            state.chunks_seen = sec // 2

            t0 = time.time()
            embd = engine.encoder.encode_async(state.accum)
            t_enc_disp = time.time() - t0

            n_audio = engine.encoder.valid_tokens(n)
            t0 = time.time()
            ids, mask = engine._build_prompt_ids(n_audio, "", "", "Chinese", False)
            t_prompt = time.time() - t0

            t0 = time.time()
            res, _ = engine._safe_decode(
                ids, mask, embd, rollback_num=0, is_last_chunk=True,
                temperature=0.0,
            )
            t_dec = time.time() - t0
            print(
                f"accum={sec:3d}s rep{rep} ids={len(ids)} enc_disp={t_enc_disp*1e3:7.1f}ms "
                f"prompt={t_prompt*1e3:6.1f}ms safe_decode={t_dec*1e3:7.1f}ms "
                f"(prefill={res.t_prefill*1e3:6.1f} gen={res.t_generate*1e3:7.1f} "
                f"ntok={len(res.stable_tokens)})",
                flush=True,
            )


if __name__ == "__main__":
    main()
