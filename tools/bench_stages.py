"""Per-stage wall profiling of the bench engine on the real TPU.

Times each device program the 50 s bench issues, with explicit syncs, to
attribute the gap between the stats-tracked spans and the measured wall.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    from qwen3_asr_gguf_tpu import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from qwen3_asr_gguf_tpu.runtime.engine import QwenASREngine
    from qwen3_asr_gguf_tpu.schema import AlignerConfig, ASREngineConfig
    from qwen3_asr_gguf_tpu.audio.io import load_audio

    ckpt = REPO / ".bench_cache" / "qwen3-asr-1.7b"
    t0 = time.time()
    engine = QwenASREngine(ASREngineConfig(
        model_dir=str(ckpt), llm_fn="qwen3_asr_llm.q4_k.gguf", precision="int8",
        n_ctx=2048, chunk_size=40.0, memory_num=1, verbose=False,
        max_new_tokens=96, decode_block=48, kv_cache_dtype="int8",
        enable_aligner=True,
        align_config=AlignerConfig(
            model_dir=str(ckpt), llm_fn="qwen3_aligner_llm.q4_k.gguf",
            precision="int8", n_ctx=2048,
        ),
    ))
    print(f"init {time.time()-t0:.1f}s", flush=True)

    audio = load_audio("/root/reference/test_audio.wav")
    audio = np.tile(audio, 4)[: 16_000 * 50]
    chunk = audio[: 16_000 * 40]

    def sync(x):
        leaf = min(jax.tree.leaves(x), key=lambda l: l.size)
        np.asarray(leaf if leaf.ndim == 0 else leaf.ravel()[:1])

    def timeit(label, fn, n=3):
        fn(); sync_out = fn()
        sync(sync_out)
        best = 1e9
        for _ in range(n):
            t0 = time.time()
            out = fn()
            sync(out)
            best = min(best, time.time() - t0)
        print(f"{label}: {best*1000:.1f} ms", flush=True)
        return best

    # 1. round-trip latency: trivial op + tiny fetch
    one = jnp.ones((1,))
    timeit("rtt tiny op+fetch", lambda: one + 1, n=5)

    # 2. ASR encode of one 40 s chunk
    timeit("asr encode 40s chunk", lambda: engine.encoder.encode_async(chunk))

    # 3. aligner encode of a 40 s window
    timeit("align encode 40s", lambda: engine.aligner.encoder.encode_async(chunk))

    # 4. full prefill chunk1-style (~560 tokens)
    embd = engine.encoder.encode_async(chunk)[:520]
    ids, mask = engine._build_prompt_ids(520, "", "", "Chinese")

    def prefill():
        return engine.generator.start_spliced(ids, mask, embd, temperature=0.0).last_token

    timeit(f"prefill full ({len(ids)} tok)", prefill)

    # 5. one decode block (48) — chain states (the cache is donated)
    holder = {"st": engine.generator.start_spliced(ids, mask, embd, temperature=0.0)}

    def block():
        s2, packed = engine.generator.decode_block_dispatch(holder["st"], 0.0)
        holder["st"] = s2
        return packed

    timeit("decode block 48", block)

    # 6. aligner prefill+argmax (~45 s window, ~100 words)
    words = "你好 世界 这是 一个 测试 " * 20
    def align():
        return engine.aligner.align(chunk, words, language="Chinese", offset_sec=0.0)
    t0 = time.time(); align(); print(f"align full call: {(time.time()-t0)*1000:.1f} ms", flush=True)
    t0 = time.time(); align(); print(f"align full call (warm): {(time.time()-t0)*1000:.1f} ms", flush=True)

    # 7. rebase op
    cache = st.cache

    def rebase():
        nonlocal cache
        cache = engine.generator.rebase_kv(cache, 536, 16, 520)
        return cache

    timeit("rebase 520 slots", rebase)


if __name__ == "__main__":
    main()
