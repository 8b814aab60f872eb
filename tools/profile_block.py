"""Capture a jax.profiler trace of the production int4 decode block and
print per-op time aggregated by op category (TPU device plane).

Uses only already-compiled programs (compile cache) so it runs in ~2 min.
"""
import glob
import os
import sys
import time
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def parse_xspace(tracedir: str, min_us: float = 0.5):
    try:
        from tensorflow.core.profiler.protobuf import xplane_pb2
    except ModuleNotFoundError:  # TF layout moved (2.16+: tsl tree)
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(os.path.join(tracedir, "**", "*.xplane.pb"), recursive=True)
    assert files, f"no xplane under {tracedir}"
    xs = xplane_pb2.XSpace()
    with open(files[0], "rb") as f:
        xs.ParseFromString(f.read())
    agg = defaultdict(float)
    count = defaultdict(int)
    total = 0.0
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        ev_names = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            lname = line.name.lower()
            # device op lines only (skip steps/framework lines)
            if "xla op" in lname or "ops" == lname or "xla modules" in lname:
                pass
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, "?")
                dur = ev.duration_ps / 1e6  # us
                if "xla op" in lname:
                    agg[name] += dur
                    count[name] += 1
                    total += dur
    return agg, count, total


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

    pos0 = 931  # c0 shape from the bench -> win 1536 (cached program)
    cache = gen.new_cache()
    st = GenState(cache=cache, pos=pos0, last_token=jnp.asarray(11, jnp.int32),
                  key=jax.random.key(0), done=jnp.asarray(False))
    t0 = time.time()
    toks, st2, fin = gen.decode_block(st, temperature=0.4)
    print(f"warm call: {time.time()-t0:.1f}s, {len(toks)} toks", flush=True)

    tracedir = "/tmp/jaxtrace"
    os.system(f"rm -rf {tracedir}")
    st = GenState(cache=st2.cache, pos=pos0, last_token=jnp.asarray(11, jnp.int32),
                  key=jax.random.key(1), done=jnp.asarray(False))
    with jax.profiler.trace(tracedir):
        toks, st2, fin = gen.decode_block(st, temperature=0.4)
        jax.block_until_ready(st2.last_token)
    print(f"traced block: {len(toks)} toks", flush=True)

    agg, count, total = parse_xspace(tracedir)
    ntok = max(len(toks), 1)
    print(f"\ntotal device op time: {total/1e3:.2f} ms over {ntok} toks "
          f"= {total/1e3/ntok:.3f} ms/tok")
    print(f"{'op':60s} {'ms total':>9s} {'us/tok':>8s} {'n':>6s}")
    for name, us in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{name[:60]:60s} {us/1e3:9.2f} {us/ntok:8.1f} {count[name]:6d}")


if __name__ == "__main__":
    main()
