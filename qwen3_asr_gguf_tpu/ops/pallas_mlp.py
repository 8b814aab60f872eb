"""Fused SwiGLU-MLP matvec Pallas kernel for int8 weights.

One kernel evaluates y = (silu(x @ Wg^T) * (x @ Wu^T)) @ Wd^T for a single
token, streaming all three weight matrices from HBM exactly once with
Pallas' automatic block double-buffering — the XLA path issues three
separate matmuls per layer whose op boundaries cost scheduling bubbles at
decode's 1-row shapes (the MLP is ~75% of a Qwen3 layer's weight bytes).

Quantization matches ops.qtensor.int8_matmul: activations are quantized
per row on the fly; here the intermediate activation re-quantizes per
(row, M-tile), which is strictly finer-grained than the XLA path's
per-row global scale.

Layout: Wg/Wu [M, D] int8 with per-row scales sg/su [M]; Wd [D, M] int8
with per-row scale sd [D] (all GGUF row order: out_features first).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 32  # int8 sublane tile: x is padded to 32 rows (row 0 is the token)


def _kernel(xq_ref, sx_ref, wg_ref, sg_ref, wu_ref, su_ref, wd_ref, sd_ref,
            out_ref, acc_ref):
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    sx = sx_ref[0, 0]
    g32 = jax.lax.dot_general(
        xq_ref[:], wg_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [SUB, TM]
    u32 = jax.lax.dot_general(
        xq_ref[:], wu_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    g = g32.astype(jnp.float32) * (sx * sg_ref[0, :][None, :])
    u = u32.astype(jnp.float32) * (sx * su_ref[0, :][None, :])
    act = (g * jax.lax.logistic(g)) * u  # silu(g) * u, f32 [SUB, TM]

    # per-(row, tile) activation quantization for the down projection
    amax = jnp.max(jnp.abs(act), axis=-1, keepdims=True)
    s_act = jnp.maximum(amax / 127.0, 1e-10)
    actq = jnp.clip(jnp.round(act / s_act), -127, 127).astype(jnp.int8)

    y32 = jax.lax.dot_general(
        actq, wd_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [SUB, D]
    acc_ref[:] += y32.astype(jnp.float32) * s_act  # sd applied once at the end

    @pl.when(i == n_tiles - 1)
    def _():
        out_ref[:] = acc_ref[:] * sd_ref[0, :][None, :]


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret"))
def fused_mlp_matvec(
    x: jax.Array,  # [1, D] (any float dtype)
    wg_q: jax.Array, sg: jax.Array,  # [M, D] int8, [M] f32
    wu_q: jax.Array, su: jax.Array,
    wd_q: jax.Array, sd: jax.Array,  # [D, M] int8, [D] f32
    tile_m: int = 512,
    interpret: bool = False,  # CPU tests
) -> jax.Array:
    m, d = wg_q.shape
    assert m % tile_m == 0, (m, tile_m)
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(amax / 127.0, 1e-10)  # [1, 1]
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    xq = jnp.pad(xq, ((0, SUB - x.shape[0]), (0, 0)))  # [SUB, D]

    out = pl.pallas_call(
        _kernel,
        grid=(m // tile_m,),
        in_specs=[
            pl.BlockSpec((SUB, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_m, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile_m), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SUB, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SUB, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((SUB, d), jnp.float32)],
        interpret=interpret,
    )(
        xq, sx, wg_q, sg.reshape(1, m), wu_q, su.reshape(1, m),
        wd_q, sd.reshape(1, d),
    )
    return out[: x.shape[0]].astype(x.dtype)
