"""Decode-step component experiments on the real TPU.

Times jitted single-step variants at 1.7B shapes to locate the 1.34 ms/tok
of non-weight overhead found by tools/bench_decode.py:
  - attention window 512 / 1536 / 2048
  - KV-cache write vs read-only
  - Pallas int8 matvec prototype vs XLA dot (realized GB/s per shape)

Usage: python tools/bench_step.py [--skip-step] [--skip-pallas]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def timeit(fn, *args, iters=30, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _ = float(np.asarray(jax_leaf(out)).ravel()[0])  # sync
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _ = float(np.asarray(jax_leaf(out)).ravel()[0])  # sync via tiny fetch
    return (time.time() - t0) / iters


def jax_leaf(tree):
    import jax

    leaves = jax.tree.leaves(tree)
    # fetch the smallest leaf to synchronize cheaply
    return min(leaves, key=lambda l: l.size)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-step", action="store_true")
    ap.add_argument("--skip-pallas", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qwen3_asr_gguf_tpu import enable_compilation_cache

    enable_compilation_cache()

    from qwen3_asr_gguf_tpu.models import params as P
    from qwen3_asr_gguf_tpu.models import decoder as dec

    ckpt = REPO / ".bench_cache" / "qwen3-asr-1.7b" / "qwen3_asr_llm.q4_k.gguf"
    print("loading decoder (int8)...", flush=True)
    cfg, dec_params, _ = P.load_decoder_gguf(str(ckpt), precision="int8")
    dec_params = P.fuse_layer_weights(dec_params)

    rng = np.random.default_rng(0)

    if not args.skip_step:
        cache = dec.init_cache(cfg, 2048)
        # fill cache with noise so reads are real
        cache = {
            k: [
                jnp.asarray(rng.standard_normal(c.shape).astype(np.float32) * 0.05, dtype=c.dtype)
                for c in v
            ]
            for k, v in cache.items()
        }
        embd = jnp.asarray(rng.standard_normal((2048,)).astype(np.float32) * 0.05)
        pos = jnp.int32(1300)

        for window in (512, 1536, 2048):
            @functools.partial(jax.jit, donate_argnums=(1,))
            def step(e, c, p, _w=window):
                h, c = dec.forward_step(dec_params, cfg, e, c, p, attn_window=_w)
                return h, c

            # donated cache: rebuild per timing loop via double-buffer trick
            def run(e, c, p):
                h, c = step(e, c, p)
                return h

            c = {k: v for k, v in cache.items()}
            for _ in range(2):
                h, c = step(embd, c, pos)
            float(np.asarray(h[:1])[0])
            t0 = time.time()
            iters = 30
            for _ in range(iters):
                h, c = step(embd, c, pos)
            float(np.asarray(h[:1])[0])
            dt = (time.time() - t0) / iters
            print(f"forward_step window={window}: {dt*1000:.2f} ms", flush=True)

        # read-only attention (no cache update): isolates copy/update cost
        @jax.jit
        def step_ro(e, c, p):
            cfg_l = cfg
            scale = cfg_l.head_dim ** -0.5
            cos, sin = dec.rope_cos_sin(p[None], cfg_l.head_dim, cfg_l.rope_theta)
            valid = jnp.arange(2048, dtype=jnp.int32)[None, :] <= p
            x = e[None, :]

            def layer_fn(h, xs):
                layer, k_cache, v_cache = xs
                attn_in = dec.rms_norm(h, layer["attn_norm"], cfg_l.rms_norm_eps)
                q, k, v = dec._layer_qkv(layer, cfg_l, attn_in, cos, sin)
                attn = dec._gqa_attention(q, k_cache, v_cache, valid, scale)
                from qwen3_asr_gguf_tpu.ops.qtensor import matmul

                attn = matmul(attn.reshape(1, -1), layer["o_proj"])
                h = h + attn
                mlp_in = dec.rms_norm(h, layer["mlp_norm"], cfg_l.rms_norm_eps)
                h = h + dec._mlp(layer, mlp_in)
                return h, None

            h, _ = jax.lax.scan(layer_fn, x, (dec_params["layers"], c["k"], c["v"]))
            return h[0]

        dt = timeit(step_ro, embd, cache, pos)
        print(f"forward_step read-only cache (win 2048): {dt*1000:.2f} ms", flush=True)

    if not args.skip_pallas:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def make_matvec(n, k, tn=256, m=32):
            def kern(x_ref, w_ref, s_ref, o_ref):
                acc = jax.lax.dot_general(
                    x_ref[:], w_ref[:],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                o_ref[:] = acc.astype(jnp.float32) * s_ref[0, :][None, :]

            return pl.pallas_call(
                kern,
                grid=(n // tn,),
                in_specs=[
                    pl.BlockSpec((m, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((tn, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((m, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            )

        shapes = [(4096, 2048), (2048, 2048), (12288, 2048), (2048, 6144), (151936, 2048)]
        for n, k in shapes:
            wq = jnp.asarray(rng.integers(-127, 127, (n, k)), dtype=jnp.int8)
            sc = jnp.asarray(rng.random((1, n)).astype(np.float32))
            xq = jnp.asarray(rng.integers(-127, 127, (32, k)), dtype=jnp.int8)
            mv = jax.jit(make_matvec(n, k))
            dt = timeit(mv, xq, wq, sc)
            gb = n * k / 1e9
            print(f"pallas matvec [{n},{k}]: {dt*1e6:.0f} us ({gb/dt:.0f} GB/s)", flush=True)

            # XLA comparator
            @jax.jit
            def xla_mv(x, w, s):
                y = jax.lax.dot_general(
                    x, w, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                return y.astype(jnp.float32) * s

            dt = timeit(xla_mv, xq, wq, sc)
            print(f"xla    matvec [{n},{k}]: {dt*1e6:.0f} us ({gb/dt:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
