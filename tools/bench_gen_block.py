"""Production Generator.decode_block: greedy vs sampled ms/tok on TPU int4."""
import sys, time
from pathlib import Path
REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

def main():
    import jax
    import jax.numpy as jnp
    from qwen3_asr_gguf_tpu import enable_compilation_cache
    enable_compilation_cache()
    from qwen3_asr_gguf_tpu.models import params as P
    from qwen3_asr_gguf_tpu.runtime.generate import Generator, GenState

    ckpt = REPO / ".bench_cache" / "qwen3-asr-1.7b" / "qwen3_asr_llm.q4_k.gguf"
    print("loading decoder (int4)...", flush=True)
    cfg, params, _ = P.load_decoder_gguf(str(ckpt), precision="int4")
    params = P.fuse_layer_weights(params)
    gen = Generator(params, cfg, n_ctx=2048, block=96, cache_dtype=jnp.bfloat16)

    for pos0 in (931, 1500):
        for temp in (0.0, 0.4):
            cache = gen.new_cache()
            st = GenState(cache=cache, pos=pos0,
                          last_token=jnp.asarray(11, jnp.int32),
                          key=jax.random.key(0), done=jnp.asarray(False))
            # warm (compile)
            toks, st2, fin = gen.decode_block(st, temperature=temp)
            times = []
            for _ in range(5):
                st = GenState(cache=st2.cache, pos=pos0,
                              last_token=jnp.asarray(11, jnp.int32),
                              key=jax.random.key(1), done=jnp.asarray(False))
                t0 = time.perf_counter()
                toks, st2, fin = gen.decode_block(st, temperature=temp)
                dt = time.perf_counter() - t0
                times.append(dt)
            n = max(len(toks), 1)
            best = min(times)
            print(f"pos={pos0} temp={temp}: block {best*1e3:.1f} ms, {len(toks)} tok "
                  f"-> {best/n*1e3:.2f} ms/tok", flush=True)

main()
