"""Device-busy time of each serial stage the 50 s bench exposes.

The engine trace attributes WALL spans (c0.collect bundles encoder +
prefill + decode-block busy); this tool times each program with explicit
syncs so the serial-exposure budget is exact. Uses only programs the
bench already compiled (run bench.py first).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def t(fn, n=3):
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    from qwen3_asr_gguf_tpu import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from qwen3_asr_gguf_tpu.audio.io import load_audio
    from qwen3_asr_gguf_tpu.runtime.engine import QwenASREngine
    from qwen3_asr_gguf_tpu.schema import AlignerConfig, ASREngineConfig

    ckpt = REPO / ".bench_cache" / "qwen3-asr-1.7b"
    engine = QwenASREngine(ASREngineConfig(
        model_dir=str(ckpt), llm_fn="qwen3_asr_llm.q4_k.gguf", precision="int4",
        n_ctx=2048, chunk_size=40.0, memory_num=1, verbose=False,
        max_new_tokens=96, decode_block=96, kv_cache_dtype="bf16",
        enable_aligner=True,
        align_config=AlignerConfig(
            model_dir=str(ckpt), llm_fn="qwen3_aligner_llm.q4_k.gguf",
            precision="int8", n_ctx=2048,
        ),
    ))

    audio = load_audio("/root/reference/test_audio.wav")
    reps = int(np.ceil(50.2 * 16000 / len(audio)))
    audio = np.tile(audio, reps)[: int(50.2 * 16000)]
    c0 = audio[: 40 * 16000]

    # full pass to warm every program (compile cache should make this fast)
    t0 = time.time()
    engine.asr(audio, context="", language="Chinese", temperature=0.4)
    print(f"warm pass {time.time()-t0:.1f}s", flush=True)

    enc = engine.encoder

    def run_enc():
        e = enc.encode_async(c0)
        jax.block_until_ready(e)

    print(f"encoder(40s) busy      {t(run_enc)*1e3:7.1f} ms")

    # prompt embeddings for a c0-like prompt (826 tokens incl. audio)
    e_dev = enc.encode_async(c0)
    n_audio = enc.valid_tokens(len(c0))
    gen = engine.generator
    ids, amask = engine._build_prompt_ids(n_audio, "", "", "Chinese")
    print(f"prompt tokens          {len(ids):7d}")

    from qwen3_asr_gguf_tpu.runtime.generate import GenState

    def run_prefill():
        st = gen.start_spliced(np.asarray(ids, np.int32), np.asarray(amask, bool),
                               e_dev, temperature=0.4, seed=0)
        jax.block_until_ready(st.last_token)
        return st

    st0 = run_prefill()
    print(f"splice+prefill busy    {t(run_prefill)*1e3:7.1f} ms")

    def fresh_state():
        # the block jit donates the cache: re-clone it per dispatch
        cache = jax.tree.map(jnp.copy, st0.cache)
        st = GenState(cache=cache, pos=st0.pos, last_token=st0.last_token,
                      key=st0.key, done=st0.done)
        jax.block_until_ready(st.last_token)
        return st

    def run_block():
        st, packed = gen.decode_block_dispatch(fresh_state(), temperature=0.4,
                                               pos_bound=len(ids))
        jax.block_until_ready(packed)

    def timed_block(fn, temp):
        best = 1e9
        for _ in range(3):
            st = fresh_state()
            t0 = time.time()
            _, packed = gen.decode_block_dispatch(st, temperature=temp,
                                                  pos_bound=len(ids))
            jax.block_until_ready(packed)
            best = min(best, time.time() - t0)
        return best

    print(f"decode block busy      {timed_block(None, 0.4)*1e3:7.1f} ms   ({gen.block} tok)")
    print(f"decode block greedy    {timed_block(None, 0.0)*1e3:7.1f} ms   ({gen.block} tok)")

    # aligner stages on the final 10.2 s window
    if engine.aligner is not None:
        al = engine.aligner
        tail = audio[40 * 16000:]

        def run_align_enc():
            e = al.encoder.encode_async(tail)
            jax.block_until_ready(e)

        print(f"align enc(10s) busy    {t(run_align_enc)*1e3:7.1f} ms")

        text = "今天天气真不错" * 12  # ~84 chars
        t0 = time.time()
        al.align(tail, text, language="Chinese", offset_sec=40.0)
        print(f"align(text) total      {(time.time()-t0)*1e3:7.1f} ms (cold window)")
        al.pre_encode(tail, key=(0, len(tail)))
        t0 = time.time()
        al.align(tail, text, language="Chinese", offset_sec=40.0,
                 precomputed_key=(0, len(tail)))
        print(f"align(text) total      {(time.time()-t0)*1e3:7.1f} ms (pre-encoded)")

    # one fetch round trip for scale
    x = jnp.zeros((98,), jnp.int32) + 1
    jax.block_until_ready(x)
    print(f"tiny fetch RTT         {t(lambda: np.asarray(x))*1e3:7.1f} ms")


main()
