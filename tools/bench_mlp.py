"""Fused-MLP kernel vs XLA 3-matmul path, timed in a device-resident loop
(one dispatch per measurement — per-call host dispatch costs ~1.5 ms on
the tunneled runtime, so op-level timing must loop on device).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_ITER = 64


def main() -> None:
    from qwen3_asr_gguf_tpu import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from qwen3_asr_gguf_tpu.models import params as P
    from qwen3_asr_gguf_tpu.models import decoder as dec
    from qwen3_asr_gguf_tpu.ops.pallas_mlp import fused_mlp_matvec
    from qwen3_asr_gguf_tpu.ops.qtensor import Int8Weight, matmul

    ckpt = REPO / ".bench_cache" / "qwen3-asr-1.7b"
    cfg, dp, _ = P.load_decoder_gguf(str(ckpt / "qwen3_asr_llm.q4_k.gguf"), precision="int8")
    dp = P.fuse_layer_weights(dp)
    layer_list = jax.jit(lambda ls: dec.unstack_layers(ls, cfg.num_layers))(dp["layers"])
    layer0 = jax.tree.map(lambda a: a, layer_list[0])
    gu = layer0["gateup_proj"]  # Int8Weight [2M, D]
    down = layer0["down_proj"]  # Int8Weight [D, M]
    m = gu.q.shape[0] // 2
    wg_q, wu_q = gu.q[:m], gu.q[m:]
    sg, su = gu.scale[:m], gu.scale[m:]
    jax.block_until_ready(wg_q)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 2048)).astype(np.float32) * 0.05)

    def sync(v):
        np.asarray(jax.tree.leaves(v)[0].ravel()[:1])

    def bench(label, step_fn):
        @jax.jit
        def loop(x0):
            def body(h, _):
                y = step_fn(h)
                # normalize to keep the chain bounded
                h = y / (jnp.linalg.norm(y) + 1.0) * 3.0
                return h.astype(x0.dtype), None
            h, _ = jax.lax.scan(body, x0, None, length=N_ITER)
            return h

        sync(loop(x))
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            out = loop(x)
            sync(out)
            best = min(best, (time.time() - t0) / N_ITER)
        gb = (2 * m * 2048 + 2048 * m) / 1e9
        print(f"{label}: {best*1e6:.0f} us/iter ({gb/best:.0f} GB/s)", flush=True)

    def xla_step(h):
        return dec._mlp(layer0, h)

    def pallas_step(h):
        return fused_mlp_matvec(h, wg_q, sg, wu_q, su, down.q, down.scale)

    bench("XLA 3-matmul MLP", xla_step)
    bench("Pallas fused MLP", pallas_step)
    for tile in (256, 1024):
        bench(f"Pallas fused MLP (tile {tile})",
              lambda h, t=tile: fused_mlp_matvec(h, wg_q, sg, wu_q, su, down.q, down.scale, tile_m=t))


if __name__ == "__main__":
    main()
